"""Shard-index merge (checkpoint.merge_indexes): the parallel
per-shard build → merge pattern for corpora too large for one global
build.  Invariants: merging shard indexes is EXACTLY a fresh build on
the concatenated corpus (decode-identical, same bits/posting and
manifest scalars, rank-identical queries), source tombstones fold in,
overlapping docID spaces are refused, and a crashed merge resumes."""

from __future__ import annotations

import json

import pytest

VOCAB = [f"w{i:02d}" for i in range(14)]
QUERIES = [(0, ["w00", "w03"]), (1, ["w01", "w05", "w07"]), (2, ["w02"]),
           (3, ["w04", "w09", "w11", "w13"])]


def _corpus(ids):
    rows = []
    for d in ids:
        terms = []
        for i, t in enumerate(VOCAB):
            reps = (d * (i + 3) + i) % 5
            if (d + i) % 3 == 0:
                reps += 1
            terms += [t] * reps
        rows.append((d, " ".join(terms) or VOCAB[d % len(VOCAB)]))
    return rows


def _build(spark, out_dir, ids, num_parts=4):
    from partitioned_ef_ans_spark.index.checkpoint import build_index_resumable

    return build_index_resumable(
        spark, spark.createDataFrame(_corpus(ids), "doc_id long, text string"),
        out_dir, codec="ans", num_parts=num_parts, chunk_postings=16,
    )


def _decode_flat_rows(spark, out_dir):
    from partitioned_ef_ans_spark.cli import _decode_flat
    from partitioned_ef_ans_spark.index import build as b_mod

    index_df, _s, _t, codec, _m = b_mod.load_index(spark, out_dir)
    return {
        (r["term"], r["doc_id"], r["tf"])
        for r in _decode_flat(spark, index_df, codec).collect()
    }


def _ranked(spark, out_dir, mode="blockmax", k=10):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], mode=mode, k=k,
        term_stats_df=ts,
    )
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in res.orderBy("query_id", "rank").collect()
    ]


def test_merge_equals_fresh_build(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import (
        delete_docs,
        merge_indexes,
    )

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    merged = str(tmp_path / "merged")
    fresh = str(tmp_path / "fresh")
    ids_a, ids_b = list(range(0, 20)), list(range(100, 116))
    deleted_a = [2, 7]
    _build(spark, a, ids_a, num_parts=2)
    _build(spark, b, ids_b, num_parts=8)  # shard layouts may differ
    delete_docs(spark, a, deleted_a)

    man = merge_indexes(spark, merged, [a, b], num_parts=4)
    survivors = [d for d in ids_a if d not in deleted_a] + ids_b
    _build(spark, fresh, survivors)
    with open(f"{fresh}/manifest.json") as fh:
        fman = json.load(fh)

    assert man["num_docs"] == len(survivors)
    assert man["universe"] == fman["universe"]
    assert man["avg_doc_len"] == fman["avg_doc_len"]
    assert man["bits_per_posting"] == fman["bits_per_posting"]
    assert man["merged_from"] == [a, b]
    assert _decode_flat_rows(spark, merged) == _decode_flat_rows(spark, fresh)
    assert _ranked(spark, merged) == _ranked(spark, fresh)
    assert _ranked(spark, merged, "ranked_or") == _ranked(spark, fresh, "ranked_or")


def test_merge_refuses_overlapping_ids(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import merge_indexes

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _build(spark, a, range(0, 10))
    _build(spark, b, range(5, 15))
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes(spark, str(tmp_path / "m"), [a, b])


def test_concat_merge_rank_identical_and_compactable(spark, tmp_path):
    """mode="concat": segment-append with zero re-encoding.  The
    merged index must decode to exactly the union corpus, rank
    identically to a fresh build on it (frozen per-part bounds stay
    admissible under the merged avg_len), keep source tombstones as a
    mask, accept further delta updates, and normalize to the fresh
    build under one compaction."""
    from partitioned_ef_ans_spark.index.checkpoint import (
        compact_index,
        delete_docs,
        load_tombstones,
        merge_indexes,
        update_index_delta,
    )

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    merged = str(tmp_path / "merged")
    fresh = str(tmp_path / "fresh")
    ids_a, ids_a2, ids_b = list(range(0, 20)), [20, 21, 22], list(range(100, 116))
    _build(spark, a, ids_a, num_parts=2)
    update_index_delta(  # source with its own delta segment
        spark, a,
        spark.createDataFrame(_corpus(ids_a2), "doc_id long, text string"),
    )
    _build(spark, b, ids_b, num_parts=8)
    delete_docs(spark, b, [101, 107])

    man = merge_indexes(spark, merged, [a, b], mode="concat")
    all_ids = ids_a + ids_a2 + ids_b
    _build(spark, fresh, all_ids)

    assert man["merge_mode"] == "concat"
    assert man["num_docs"] == len(all_ids)
    assert man["delta_segments"] >= 2  # a's delta + b's base at least
    assert list(load_tombstones(merged)) == [101, 107]
    assert _decode_flat_rows(spark, merged) == _decode_flat_rows(spark, fresh)
    # rank-identical on surviving docs: fresh oracle masked the same way
    tombs = load_tombstones(merged)
    from tests.test_deletes import _mask_rerank

    for mode in ("blockmax", "maxscore_blockmax", "ranked_or"):
        got = _ranked_tomb(spark, merged, mode, tombs)
        full = _ranked_tomb(spark, fresh, mode, None, k=60)
        assert got == _mask_rerank(full, set(tombs)), mode
    # the doc-partitioned dispatch decodes chunk batches directly —
    # its per-segment model routing must survive the seg-bit remap
    expect = _mask_rerank(_ranked_tomb(spark, fresh, "blockmax", None, k=60),
                          set(tombs))
    assert _ranked_tomb(
        spark, merged, "blockmax", tombs, budget=0
    ) == expect

    # idempotent rerun returns the committed manifest
    again = merge_indexes(spark, merged, [a, b], mode="concat")
    assert again["merge_sec"] == man["merge_sec"]

    # further delta updates append after the merged segments
    new_ids = [500, 501]
    man2 = update_index_delta(
        spark, merged,
        spark.createDataFrame(_corpus(new_ids), "doc_id long, text string"),
    )
    assert man2["delta_segments"] == man["delta_segments"] + 1

    # one compaction folds segments + tombstones to the normal form
    compact_index(spark, merged)
    fresh2 = str(tmp_path / "fresh2")
    survivors = [d for d in all_ids if d not in (101, 107)] + new_ids
    _build(spark, fresh2, survivors, num_parts=2)
    assert _decode_flat_rows(spark, merged) == _decode_flat_rows(spark, fresh2)


def _ranked_tomb(spark, out_dir, mode, tombs, k=10, budget=None):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], mode=mode, k=k,
        term_stats_df=ts, tombstones=tombs,
        docpart_budget_bytes=budget,
    )
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in res.orderBy("query_id", "rank").collect()
    ]


def test_concat_merge_ef_family(spark, tmp_path):
    """EF payloads are laid out against the build-time universe, so a
    concat merge pins per-segment universes (delta_universes) — every
    segment, INCLUDING src0's base (whose universe the union outgrows),
    must decode under its own layout.  The id gap between the shards
    makes a universe mix-up decode garbage, not near-misses."""
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        compact_index,
        merge_indexes,
    )

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    merged = str(tmp_path / "m")
    fresh = str(tmp_path / "f")
    ids_a, ids_b = list(range(0, 18)), list(range(200, 214))
    for d, ids in ((a, ids_a), (b, ids_b)):
        build_index_resumable(
            spark,
            spark.createDataFrame(_corpus(ids), "doc_id long, text string"),
            d, codec="pef", num_parts=4, chunk_postings=16,
        )
    man = merge_indexes(spark, merged, [a, b], mode="concat")
    build_index_resumable(
        spark,
        spark.createDataFrame(
            _corpus(ids_a + ids_b), "doc_id long, text string"
        ),
        fresh, codec="pef", num_parts=4, chunk_postings=16,
    )
    assert man["num_docs"] == len(ids_a) + len(ids_b)
    assert _decode_flat_rows(spark, merged) == _decode_flat_rows(spark, fresh)
    for mode in ("ranked_or", "taat", "wand"):
        assert _ranked(spark, merged, mode) == _ranked(spark, fresh, mode), mode

    # compaction re-encodes everything under the union universe and
    # drops the per-segment universes
    compact_index(spark, merged)
    assert _decode_flat_rows(spark, merged) == _decode_flat_rows(spark, fresh)
    import pickle

    with open(f"{merged}/models.pkl", "rb") as fh:
        side = pickle.load(fh)
    assert not side.get("delta_universes")


def test_concat_merge_refusals(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import merge_indexes

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _build(spark, a, [0, 2, 4, 6, 8])
    _build(spark, b, [1, 3, 5, 7, 9])  # disjoint SETS but interleaved
    with pytest.raises(ValueError, match="ordered disjoint"):
        merge_indexes(spark, str(tmp_path / "m"), [a, b], mode="concat")


def test_merge_refuses_crashed_source(spark, tmp_path):
    """A source whose interrupted update left staged postings without
    doc stats must be healed before merging (same guard as
    compact_index) — merging it would bake missing norms in."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from partitioned_ef_ans_spark.index.checkpoint import merge_indexes

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _build(spark, a, range(0, 10))
    _build(spark, b, range(50, 58))
    # simulate the crash: clone a staged row (schema-exact) but point
    # it at a doc with no stats row
    import os as _os

    part0 = f"{b}/staging_postings.parquet/part_id=0"
    f0 = sorted(
        f for f in _os.listdir(part0) if f.endswith(".parquet")
    )[0]
    t = pq.read_table(f"{part0}/{f0}")
    row = t.slice(0, 1).to_pydict()
    row["doc_ids"] = [[900]]
    row["freqs"] = [[1]]
    if "doc_lens" in row:
        row["doc_lens"] = [[7]]
    pq.write_table(
        pa.table(row, schema=t.schema), f"{part0}/zz_orphan.parquet"
    )
    with pytest.raises(RuntimeError, match="without doc stats"):
        merge_indexes(spark, str(tmp_path / "m"), [a, b])


def test_merge_resumes_after_crash(spark, tmp_path, monkeypatch):
    """Kill the merge mid-encode; the rerun resumes from checkpoints
    and lands bit-identical to an uninterrupted merge."""
    from partitioned_ef_ans_spark.index import checkpoint as ck

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    m1 = str(tmp_path / "m1")
    m2 = str(tmp_path / "m2")
    _build(spark, a, range(0, 12))
    _build(spark, b, range(50, 60))
    ck.merge_indexes(spark, m1, [a, b], num_parts=4)

    orig = ck.build_index_resumable

    def boom(spark_, corpus, out_dir, **kw):
        return orig(spark_, corpus, out_dir, fail_after_parts=2, **kw)

    monkeypatch.setattr(ck, "build_index_resumable", boom)
    with pytest.raises(ck.BuildInterrupted):
        ck.merge_indexes(spark, m2, [a, b], num_parts=4)
    monkeypatch.undo()
    ck.merge_indexes(spark, m2, [a, b], num_parts=4)
    assert _decode_flat_rows(spark, m1) == _decode_flat_rows(spark, m2)
    with open(f"{m1}/manifest.json") as fh1, open(f"{m2}/manifest.json") as fh2:
        a1, a2 = json.load(fh1), json.load(fh2)
    assert a1["bits_per_posting"] == a2["bits_per_posting"]
    assert a2["parts_skipped_resume"] >= 2

def test_minor_compaction_on_concat_merged_index(spark, tmp_path):
    """compact_deltas after a concat merge — the hardest fold input:
    the sources' appended segments carry per-segment ANS models and
    (EF families) per-segment UNIVERSES.  The fold collapses them
    into one segment re-encoded under the union universe while src0's
    base segment keeps its pinned layout; decode and ranking stay
    identical to a fresh union build, and the base part payloads are
    untouched inodes."""
    import os
    import pickle

    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        compact_deltas,
        merge_indexes,
        update_index_delta,
    )

    # --- ANS codec: per-segment models fold into one retrained model
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    merged = str(tmp_path / "m")
    fresh = str(tmp_path / "f")
    ids_a, ids_a2, ids_b = list(range(0, 20)), [20, 21], list(range(100, 116))
    _build(spark, a, ids_a, num_parts=2)
    update_index_delta(  # source with its own delta segment
        spark, a,
        spark.createDataFrame(_corpus(ids_a2), "doc_id long, text string"),
    )
    _build(spark, b, ids_b, num_parts=8)
    man0 = merge_indexes(spark, merged, [a, b], mode="concat")
    assert man0["delta_segments"] >= 2
    _build(spark, fresh, ids_a + ids_a2 + ids_b, num_parts=2)

    root = f"{merged}/index.parquet/part=0"
    before_inodes = {
        (f, os.stat(os.path.join(root, f)).st_ino)
        for f in os.listdir(root) if f.endswith(".parquet")
    }
    man = compact_deltas(spark, merged)
    assert man["delta_segments"] == 1
    assert man["folded_segments"] == man0["delta_segments"]
    after_inodes = {
        (f, os.stat(os.path.join(root, f)).st_ino)
        for f in os.listdir(root) if f.endswith(".parquet")
    }
    assert after_inodes == before_inodes
    assert _decode_flat_rows(spark, merged) == _decode_flat_rows(spark, fresh)
    for mode in ("blockmax", "ranked_or", "taat"):
        assert _ranked(spark, merged, mode) == _ranked(spark, fresh, mode), mode
    with open(f"{merged}/models.pkl", "rb") as fh:
        side = pickle.load(fh)
    assert set(side.get("delta_models", {})) == {1}

    # --- EF family (pef): per-segment universes collapse to ONE pinned
    # base universe; the folded segment lays out under the union
    # universe.  Three shards so the concat leaves TWO delta segments
    # (a two-shard concat has one — already folded form, where
    # compact_deltas must no-op).  The 200-id gaps make any universe
    # mix-up decode garbage, not near-misses.
    ap = str(tmp_path / "ap")
    bp = str(tmp_path / "bp")
    cp = str(tmp_path / "cp")
    mp = str(tmp_path / "mp")
    fp = str(tmp_path / "fp")
    ids_ap = list(range(0, 18))
    ids_bp = list(range(200, 214))
    ids_cp = list(range(400, 412))
    for d, ids in ((ap, ids_ap), (bp, ids_bp), (cp, ids_cp)):
        build_index_resumable(
            spark,
            spark.createDataFrame(_corpus(ids), "doc_id long, text string"),
            d, codec="pef", num_parts=4, chunk_postings=16,
        )
    merge_indexes(spark, mp, [ap, bp, cp], mode="concat")
    build_index_resumable(
        spark,
        spark.createDataFrame(
            _corpus(ids_ap + ids_bp + ids_cp), "doc_id long, text string"
        ),
        fp, codec="pef", num_parts=4, chunk_postings=16,
    )
    manp = compact_deltas(spark, mp)
    assert manp["delta_segments"] == 1
    assert manp["folded_segments"] == 2
    assert _decode_flat_rows(spark, mp) == _decode_flat_rows(spark, fp)
    for mode in ("ranked_or", "taat", "wand"):
        assert _ranked(spark, mp, mode) == _ranked(spark, fp, mode), mode
    with open(f"{mp}/models.pkl", "rb") as fh:
        sidep = pickle.load(fh)
    # EF family: folded segment is re-pinned at today's universe so a
    # later delta update that grows the manifest universe can't
    # disturb its layout (base keeps src0's pin)
    unisp = {
        int(k): int(v) for k, v in sidep.get("delta_universes", {}).items()
    }
    assert set(unisp) == {0, 1}
    assert unisp[1] == manp["universe"]

    # single-delta-segment index (e.g. a two-shard concat) is already
    # in folded form: compact_deltas declines rather than churning
    m2 = str(tmp_path / "m2")
    merge_indexes(spark, m2, [ap, bp], mode="concat")
    man2 = compact_deltas(spark, m2)
    assert man2["folded_segments"] == 0
    with open(f"{m2}/models.pkl", "rb") as fh:
        side2 = pickle.load(fh)
    assert {int(k) for k in side2.get("delta_universes", {})} == {0, 1}
