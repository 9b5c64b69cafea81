"""Document deletion: tombstone sidecar (checkpoint.delete_docs),
query-time masking across every retrieval path, and the physical fold
at compaction.

The reference engine has no delete operation — this is a
beyond-reference maintenance plane (Lucene-style liveness masking over
the LSM update layout).  Invariants pinned here:

* frozen corpus stats keep surviving docs' scores BIT-STABLE under
  masking, so a tombstoned run equals the unfiltered run with deleted
  docs dropped and ranks recomputed — across every ranked mode, the
  boolean twins, and the doc-partitioned dispatch path;
* block/list maxima computed over the pre-delete corpus stay
  admissible (upper bounds over a superset), so pruned modes remain
  rank-identical to the exhaustive oracle under masking;
* compact_index folds tombstones physically: the result is
  decode-identical (and stats/bpp-identical) to a fresh build on the
  surviving corpus, and the sidecar resets atomically with the commit.
"""

from __future__ import annotations

import json

import pytest

NUM_PARTS = 4
CHUNK = 16
VOCAB = [f"w{i:02d}" for i in range(14)]
N_DOCS = 30
DELETED = [0, 3, 7, 11, 19, 29]  # includes max id -> universe shrinks

QUERIES = [
    (0, ["w00", "w03"]),
    (1, ["w01", "w05", "w07"]),
    (2, ["w02"]),
    (3, ["w04", "w09", "w11", "w13"]),
]


def _corpus(ids):
    rows = []
    for d in ids:
        terms = []
        for i, t in enumerate(VOCAB):
            reps = (d * (i + 3) + i) % 5
            if (d + i) % 3 == 0:
                reps += 1
            terms += [t] * reps
        if not terms:
            terms = [VOCAB[d % len(VOCAB)]]
        rows.append((d, " ".join(terms)))
    return rows


def _build(spark, out_dir, ids):
    from partitioned_ef_ans_spark.index.checkpoint import build_index_resumable

    build_index_resumable(
        spark,
        spark.createDataFrame(_corpus(ids), "doc_id long, text string"),
        out_dir, codec="ans", num_parts=NUM_PARTS, chunk_postings=CHUNK,
    )


@pytest.fixture(scope="module")
def del_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("delidx") / "idx")
    _build(spark, d, range(N_DOCS))
    return d


def _ranked(spark, out_dir, mode, k=10, tombstones=None, budget=None):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], mode=mode, k=k,
        term_stats_df=ts, tombstones=tombstones,
        docpart_budget_bytes=budget,
    )
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in res.orderBy("query_id", "rank").collect()
    ]


def _boolean(spark, out_dir, conjunctive, tombstones=None, budget=None):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, _man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_boolean(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        conjunctive, term_stats_df=ts, tombstones=tombstones,
        docpart_budget_bytes=budget,
    )
    return {r["query_id"]: r["matches"] for r in res.collect()}


def _decode_flat_rows(spark, out_dir):
    from partitioned_ef_ans_spark.cli import _decode_flat
    from partitioned_ef_ans_spark.index import build as b_mod

    index_df, _s, _t, codec, _m = b_mod.load_index(spark, out_dir)
    return {
        (r["term"], r["doc_id"], r["tf"])
        for r in _decode_flat(spark, index_df, codec).collect()
    }


def _mask_rerank(rows, deleted, k=10):
    """Unfiltered k=ALL run -> expected tombstoned top-k: drop deleted
    docs, re-rank survivors on the (already-rounded) emitted scores
    with the kernels' (-score, doc_id) tie-break.  Valid because
    frozen stats make surviving scores independent of deletions."""
    by_q: dict[int, list] = {}
    for qid, _rank, doc, score in rows:
        by_q.setdefault(qid, []).append((doc, score))
    out = []
    for qid in sorted(by_q):
        keep = [(s, d) for d, s in by_q[qid] if d not in deleted]
        keep.sort(key=lambda x: (-x[0], x[1]))
        out += [(qid, i + 1, d, s) for i, (s, d) in enumerate(keep[:k])]
    return out


def test_tombstones_mask_all_ranked_modes(spark, del_index):
    full = _ranked(spark, del_index, "ranked_or", k=N_DOCS + 5)
    expect = _mask_rerank(full, set(DELETED))
    assert expect, "query set must produce survivors"
    # deleted docs DID rank before deletion (the mask is load-bearing)
    assert {r[2] for r in full[: 4 * 10]} & set(DELETED)
    for mode in (
        "ranked_or", "blockmax", "maxscore_blockmax", "taat",
        "wand", "wand_bmw", "maxscore",
    ):
        got = _ranked(spark, del_index, mode, tombstones=DELETED)
        assert got == expect, mode
    # conjunctive twin against its own masked oracle
    full_and = _ranked(spark, del_index, "ranked_and", k=N_DOCS + 5)
    expect_and = _mask_rerank(full_and, set(DELETED))
    assert _ranked(spark, del_index, "ranked_and", tombstones=DELETED) == expect_and
    # doc-partitioned dispatch (budget=0 routes every query) masks
    # identically on both scoring shapes
    assert _ranked(
        spark, del_index, "blockmax", tombstones=DELETED, budget=0
    ) == expect
    assert _ranked(
        spark, del_index, "ranked_and", tombstones=DELETED, budget=0
    ) == expect_and


def test_tombstones_mask_boolean(spark, del_index):
    flat = _decode_flat_rows(spark, del_index)
    live = {(t, d) for t, d, _tf in flat if d not in DELETED}
    exp_and, exp_or = {}, {}
    for qid, terms in QUERIES:
        per_term = [{d for (t, d) in live if t == term} for term in set(terms)]
        exp_and[qid] = len(set.intersection(*per_term))
        exp_or[qid] = len(set.union(*per_term))
    assert _boolean(spark, del_index, True, tombstones=DELETED) == exp_and
    assert _boolean(spark, del_index, False, tombstones=DELETED) == exp_or
    assert _boolean(
        spark, del_index, True, tombstones=DELETED, budget=0
    ) == exp_and
    assert _boolean(
        spark, del_index, False, tombstones=DELETED, budget=0
    ) == exp_or


def test_latency_kernels_mask_tombstones(spark, del_index):
    """The in-process latency path (queries --latency / bench.py
    --latency) masks exactly like the distributed kernels: explicit
    sets and the "auto" sidecar route both sample, and the blockmax
    counters move (the masked kernels really ran)."""
    from partitioned_ef_ans_spark.index.checkpoint import delete_docs
    from partitioned_ef_ans_spark.latency import kernel_latency_stats

    qs = [(q, t) for q, t in QUERIES if t]
    stats = kernel_latency_stats(
        del_index, qs, modes=("blockmax", "ranked_or", "ranked_and"),
        runs=2, k=5, tombstones=DELETED,
    )
    assert all(s["mean"] > 0 for s in stats.values())
    assert 0 < stats["blockmax"]["blocks_scored"] <= stats["blockmax"][
        "blocks_referenced"
    ]
    # sidecar auto-load: same masked kernels fire without passing ids
    delete_docs(spark, del_index, DELETED)
    auto = kernel_latency_stats(
        del_index, qs, modes=("blockmax",), runs=2, k=5
    )
    assert auto["blockmax"]["mean"] > 0


def test_delete_docs_api_and_compaction_fold(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import (
        compact_index,
        delete_docs,
        load_tombstones,
    )

    live = str(tmp_path / "live")
    fresh = str(tmp_path / "fresh")
    survivors = [d for d in range(N_DOCS) if d not in DELETED]
    _build(spark, live, range(N_DOCS))
    _build(spark, fresh, survivors)

    info = delete_docs(spark, live, DELETED + [9999])
    assert info["ignored_out_of_universe"] == 1
    assert info["tombstones_total"] == len(DELETED)
    # idempotent union
    info2 = delete_docs(spark, live, DELETED[:2])
    assert info2["tombstones_total"] == len(DELETED)
    assert list(load_tombstones(live)) == sorted(DELETED)

    man = compact_index(spark, live)
    assert man["num_docs"] == len(survivors)
    assert man["delta_segments"] == 0
    assert man["docs_purged"] == len(DELETED)
    assert load_tombstones(live) is None  # sidecar reset with the commit

    with open(f"{fresh}/manifest.json") as fh:
        fman = json.load(fh)
    assert man["universe"] == fman.get("universe", fman["num_docs"])
    assert man["avg_doc_len"] == fman["avg_doc_len"]
    assert man["bits_per_posting"] == fman["bits_per_posting"]
    assert _decode_flat_rows(spark, live) == _decode_flat_rows(spark, fresh)
    # post-compaction queries need no tombstones and equal a fresh
    # build on the surviving corpus, mode-independently
    assert _ranked(spark, live, "blockmax") == _ranked(spark, fresh, "blockmax")
    assert _ranked(spark, live, "ranked_or") == _ranked(spark, fresh, "ranked_or")


def test_deletes_compose_with_delta_updates(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import (
        compact_index,
        delete_docs,
        load_tombstones,
        update_index_delta,
    )

    live = str(tmp_path / "live")
    fresh = str(tmp_path / "fresh")
    _build(spark, live, range(N_DOCS))
    delete_docs(spark, live, DELETED)
    new_ids = list(range(100, 106))
    update_index_delta(
        spark, live,
        spark.createDataFrame(_corpus(new_ids), "doc_id long, text string"),
    )

    tombs = load_tombstones(live)
    assert list(tombs) == sorted(DELETED)
    full = _ranked(spark, live, "ranked_or", k=N_DOCS + len(new_ids) + 5)
    expect = _mask_rerank(full, set(DELETED))
    assert _ranked(spark, live, "ranked_or", tombstones=tombs) == expect
    assert _ranked(spark, live, "blockmax", tombstones=tombs) == expect

    # compaction folds BOTH the delta segment and the tombstones
    man = compact_index(spark, live)
    survivors = [d for d in range(N_DOCS) if d not in DELETED] + new_ids
    _build(spark, fresh, survivors)
    assert man["num_docs"] == len(survivors)
    assert load_tombstones(live) is None
    assert _decode_flat_rows(spark, live) == _decode_flat_rows(spark, fresh)
    assert _ranked(spark, live, "blockmax") == _ranked(spark, fresh, "blockmax")


def test_deletes_inside_delta_segments(spark, tmp_path):
    """Tombstones that hit docs living in DELTA segments: masking must
    reach segment-routed decode, and the compaction fold must drop the
    segment's postings too (not only base-part ones)."""
    from partitioned_ef_ans_spark.index.checkpoint import (
        compact_index,
        delete_docs,
        load_tombstones,
        update_index_delta,
    )

    live = str(tmp_path / "live")
    fresh = str(tmp_path / "fresh")
    _build(spark, live, range(N_DOCS))
    seg1 = list(range(100, 106))
    seg2 = list(range(200, 204))
    for batch in (seg1, seg2):
        update_index_delta(
            spark, live,
            spark.createDataFrame(_corpus(batch), "doc_id long, text string"),
        )
    # delete across ALL three segments: base, first delta, second delta
    dels = [3, 11, 101, 104, 201]
    delete_docs(spark, live, dels)

    tombs = load_tombstones(live)
    full = _ranked(spark, live, "ranked_or", k=N_DOCS + 15)
    expect = _mask_rerank(full, set(dels))
    assert {r[2] for r in full[:40]} & set(dels)  # mask load-bearing
    assert _ranked(spark, live, "blockmax", tombstones=tombs) == expect
    assert _ranked(spark, live, "ranked_or", tombstones=tombs) == expect

    # MINOR compaction folds the two delta segments but must NOT purge
    # tombstones (only the major fold does) — masked postings ride
    # along and masking still applies afterwards
    from partitioned_ef_ans_spark.index.checkpoint import compact_deltas

    man_m = compact_deltas(spark, live)
    assert man_m["folded_segments"] == 2
    tombs = load_tombstones(live)
    assert list(tombs) == sorted(dels)
    assert _ranked(spark, live, "blockmax", tombstones=tombs) == expect

    man = compact_index(spark, live)
    survivors = [
        d for d in list(range(N_DOCS)) + seg1 + seg2 if d not in dels
    ]
    _build(spark, fresh, survivors)
    assert man["num_docs"] == len(survivors)
    assert man["delta_segments"] == 0
    assert _decode_flat_rows(spark, live) == _decode_flat_rows(spark, fresh)
    assert _ranked(spark, live, "blockmax") == _ranked(spark, fresh, "blockmax")
