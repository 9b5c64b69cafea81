"""Reader-pinned snapshots (checkpoint.snapshot_index): a query
session that spans maintenance commits must read ONE committed state.

The reference engine is single-process and has no concurrent-reader
story; this is the many-readers/one-writer plane a shared 100-TB index
needs.  Invariants: a snapshot equals the live index at pin time,
stays bit-identical across delta updates + deletes + compaction of the
live tree (hardlinks pin the replaced bytes), and pinning refuses to
race a live writer lease (fresh heartbeat) but never waits on a stale
one (dead holder)."""

from __future__ import annotations

import os

import pytest

VOCAB = [f"w{i:02d}" for i in range(12)]
QUERIES = [(0, ["w00", "w03"]), (1, ["w01", "w05", "w07"]), (2, ["w02"])]


def _corpus(ids):
    rows = []
    for d in ids:
        terms = []
        for i, t in enumerate(VOCAB):
            reps = (d * (i + 3) + i) % 4
            if (d + i) % 3 == 0:
                reps += 1
            terms += [t] * reps
        rows.append((d, " ".join(terms) or VOCAB[d % len(VOCAB)]))
    return rows


def _ranked(spark, idx_dir, k=10):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, man = b_mod.load_index(spark, idx_dir)
    res = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], mode="blockmax", k=k,
        term_stats_df=ts,
    )
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in res.orderBy("query_id", "rank").collect()
    ]


def test_snapshot_pins_state_across_maintenance(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        compact_index,
        delete_docs,
        release_snapshot,
        snapshot_index,
        update_index_delta,
    )

    live = str(tmp_path / "live")
    build_index_resumable(
        spark, spark.createDataFrame(_corpus(range(24)), "doc_id long, text string"),
        live, codec="ans", num_parts=4, chunk_postings=16,
    )
    before = _ranked(spark, live)

    snap = snapshot_index(live, timeout=10)
    assert _ranked(spark, snap) == before

    # churn the live tree through every maintenance commit type
    from partitioned_ef_ans_spark.index.checkpoint import compact_deltas

    update_index_delta(
        spark, live,
        spark.createDataFrame(_corpus(range(100, 104)), "doc_id long, text string"),
    )
    update_index_delta(
        spark, live,
        spark.createDataFrame(_corpus(range(110, 113)), "doc_id long, text string"),
    )
    compact_deltas(spark, live)  # minor fold is a commit type too
    delete_docs(spark, live, [0, 3, 7])
    compact_index(spark, live)

    after = _ranked(spark, live)
    assert after != before  # the churn was load-bearing
    assert _ranked(spark, snap) == before  # the snapshot did not move

    # a fresh snapshot sees the new state
    snap2 = snapshot_index(live, timeout=10)
    assert _ranked(spark, snap2) == after
    release_snapshot(snap)
    release_snapshot(snap2)
    assert not os.path.exists(snap) and not os.path.exists(snap2)


def test_snapshot_respects_writer_lease(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        release_snapshot,
        snapshot_index,
    )

    live = str(tmp_path / "live")
    build_index_resumable(
        spark, spark.createDataFrame(_corpus(range(10)), "doc_id long, text string"),
        live, codec="ans", num_parts=2, chunk_postings=16,
    )
    lock = f"{live}/.update_lock"
    with open(lock, "w") as fh:  # fresh heartbeat == live writer
        fh.write("12345 otherhost 0.0 deadbeef")
    with pytest.raises(TimeoutError):
        snapshot_index(live, timeout=1.5)

    # a STALE lease (dead holder) must not block readers
    os.utime(lock, (0, 0))
    snap = snapshot_index(live, timeout=10)
    assert os.path.exists(f"{snap}/manifest.json")
    assert not os.path.exists(f"{snap}/.update_lock")  # dotfiles skipped
    release_snapshot(snap)
    os.remove(lock)
