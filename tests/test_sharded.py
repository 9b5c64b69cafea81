"""Scatter-gather serving over shard indexes (index/sharded.py).

Invariant under test: querying N disjoint shard indexes through
run_ranked_sharded is RANK- and SCORE-identical to querying the
concat-merged index (and a fresh global build) — global num_docs /
avg_len / df make per-shard scores globally consistent, per-shard
bound inflation keeps pruning admissible, and the top-k gather
preserves the (score desc, doc_id asc) total order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

VOCAB = [f"w{i:02d}" for i in range(14)]
QUERIES = [(0, ["w00", "w03"]), (1, ["w01", "w05", "w07"]), (2, ["w02"]),
           (3, ["w04", "w09", "w11", "w13"]), (4, ["w06", "w00"])]


def _corpus(ids, reps_scale=1):
    """Deterministic skewed corpus; ``reps_scale`` stretches doc
    lengths so shards can have very different average lengths."""
    rows = []
    for d in ids:
        terms = []
        for i, t in enumerate(VOCAB):
            reps = ((d * (i + 3) + i) % 5) * reps_scale
            if (d + i) % 3 == 0:
                reps += reps_scale
            terms += [t] * reps
        rows.append((d, " ".join(terms) or VOCAB[d % len(VOCAB)]))
    return rows


def _build(spark, out_dir, rows, codec="ans", num_parts=4):
    from partitioned_ef_ans_spark.index.checkpoint import build_index_resumable

    return build_index_resumable(
        spark, spark.createDataFrame(rows, "doc_id long, text string"),
        out_dir, codec=codec, num_parts=num_parts, chunk_postings=16,
    )


def _qdf(spark):
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    return queries_to_df(spark, QUERIES)


def _ranked_one(spark, out_dir, mode, k=10):
    """run_ranked on a single index dir, masking its own tombstones —
    the reference result the sharded path must reproduce exactly."""
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.index.checkpoint import load_tombstones

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_ranked(
        spark, index_df, _qdf(spark), codec, man["num_docs"],
        man["avg_doc_len"], mode=mode, k=k, term_stats_df=ts,
        tombstones=load_tombstones(out_dir),
    )
    return _rows(res)


def _rows(res):
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 7))
        for r in res.orderBy("query_id", "rank").collect()
    ]


def _sharded(spark, dirs, mode, k=10, **kw):
    from partitioned_ef_ans_spark.index import sharded as sh_mod

    return _rows(
        sh_mod.run_ranked_sharded(spark, dirs, _qdf(spark), mode=mode, k=k, **kw)
    )


def test_sharded_rank_identical_to_concat_merge_and_fresh(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import merge_indexes

    a, b, merged, fresh = (
        str(tmp_path / x) for x in ("a", "b", "merged", "fresh")
    )
    rows_a, rows_b = _corpus(range(0, 20)), _corpus(range(100, 116))
    _build(spark, a, rows_a)
    _build(spark, b, rows_b)
    merge_indexes(spark, merged, [a, b], num_parts=4, chunk_postings=16,
                  mode="concat")
    _build(spark, fresh, rows_a + rows_b)

    for mode in ("blockmax", "maxscore_blockmax", "taat", "ranked_or",
                 "ranked_and"):
        want = _ranked_one(spark, merged, mode)
        assert want == _ranked_one(spark, fresh, mode), mode
        assert _sharded(spark, [a, b], mode) == want, mode
    # storage-direct per shard (global stats injected): same gather
    for mode in ("blockmax", "ranked_and"):
        got = _sharded(spark, [a, b], mode, fetch="direct")
        assert got == _ranked_one(spark, merged, mode), f"direct {mode}"


def test_sharded_skewed_averages_keep_pruning_admissible(spark, tmp_path):
    """Shards with 6x different average doc lengths: the global average
    sits between them, so one shard's bounds must inflate (global avg >
    shard avg) while the other's stay as-is.  Pruned modes must equal
    the exhaustive scorer — a missed inflation would silently drop
    true top-k docs from the long-doc shard."""
    a, b, fresh = (str(tmp_path / x) for x in ("a", "b", "fresh"))
    rows_a = _corpus(range(0, 18), reps_scale=1)   # short docs
    rows_b = _corpus(range(200, 214), reps_scale=6)  # long docs
    _build(spark, a, rows_a)
    _build(spark, b, rows_b)
    _build(spark, fresh, rows_a + rows_b)

    import json

    avg_a = json.load(open(f"{a}/manifest.json"))["avg_doc_len"]
    avg_b = json.load(open(f"{b}/manifest.json"))["avg_doc_len"]
    assert avg_b > 3 * avg_a, "fixture must actually skew the averages"

    exhaustive = _sharded(spark, [a, b], "ranked_or")
    assert exhaustive == _ranked_one(spark, fresh, "ranked_or")
    for mode in ("blockmax", "maxscore_blockmax", "wand", "maxscore"):
        assert _sharded(spark, [a, b], mode) == exhaustive, mode
    # direct serving under skewed averages: the default bound scale
    # (override avg > shard manifest avg) must keep pruning admissible
    for mode in ("blockmax", "maxscore_blockmax"):
        got = _sharded(spark, [a, b], mode, fetch="direct")
        assert got == exhaustive, f"direct {mode}"
    # forced giant routing under the override (budget=1 routes every
    # query through the docpart dispatch with override-scaled bounds)
    got = _sharded(spark, [a, b], "blockmax", fetch="direct",
                   docpart_budget_bytes=1)
    assert got == exhaustive, "direct giant-routed"
    # top-k must actually mix both shards or the test proves nothing
    got_ids = {doc for _q, _r, doc, _s in exhaustive}
    assert got_ids & set(range(0, 18)) and got_ids & set(range(200, 214))


def test_sharded_ef_family_and_three_shards(spark, tmp_path):
    from partitioned_ef_ans_spark.index.checkpoint import merge_indexes

    dirs = [str(tmp_path / x) for x in ("a", "b", "c")]
    ranges = [range(0, 12), range(50, 64), range(300, 310)]
    for d, ids in zip(dirs, ranges):
        _build(spark, d, _corpus(ids), codec="pef")
    merged = str(tmp_path / "merged")
    merge_indexes(spark, merged, dirs, num_parts=4, chunk_postings=16,
                  mode="concat")
    # blockmax falls back to the pruned-taat kernel on EF families —
    # the sharded path must route identically per shard
    for mode in ("blockmax", "ranked_or"):
        assert _sharded(spark, dirs, mode) == _ranked_one(spark, merged, mode)


def test_sharded_tombstones_and_boolean_counts(spark, tmp_path):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.index import sharded as sh_mod
    from partitioned_ef_ans_spark.index.checkpoint import (
        delete_docs,
        load_tombstones,
        merge_indexes,
    )

    a, b, merged = (str(tmp_path / x) for x in ("a", "b", "m"))
    _build(spark, a, _corpus(range(0, 20)))
    _build(spark, b, _corpus(range(100, 116)))
    delete_docs(spark, a, [1, 5, 11])
    delete_docs(spark, b, [103])
    merge_indexes(spark, merged, [a, b], num_parts=4, chunk_postings=16,
                  mode="concat")

    for mode in ("blockmax", "ranked_or"):
        got = _sharded(spark, [a, b], mode)
        assert got == _ranked_one(spark, merged, mode), mode
        assert not {1, 5, 11, 103} & {doc for _q, _r, doc, _s in got}
    got = _sharded(spark, [a, b], "blockmax", fetch="direct")
    assert got == _ranked_one(spark, merged, "blockmax")
    assert not {1, 5, 11, 103} & {doc for _q, _r, doc, _s in got}

    index_df, _s, ts, codec, _m = b_mod.load_index(spark, merged)
    qdf = _qdf(spark)
    for conj in (True, False):
        want = {
            (r["query_id"], r["matches"])
            for r in q_mod.run_boolean(
                spark, index_df, qdf, codec, conj, term_stats_df=ts,
                tombstones=load_tombstones(merged),
            ).collect()
        }
        got = {
            (r["query_id"], r["matches"])
            for r in sh_mod.run_boolean_sharded(
                spark, [a, b], qdf, conj
            ).collect()
        }
        assert got == want, f"conjunctive={conj}"


def test_sharded_refuses_mixed_codecs_and_reuses_loaded(spark, tmp_path):
    from partitioned_ef_ans_spark.index import sharded as sh_mod

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _build(spark, a, _corpus(range(0, 10)), codec="ans")
    _build(spark, b, _corpus(range(50, 60)), codec="pef")
    with pytest.raises(ValueError, match="different codecs"):
        sh_mod.load_shards(spark, [a, b])

    # pre-frozen load_shards dict is reusable across calls/batches
    c = str(tmp_path / "c")
    _build(spark, c, _corpus(range(50, 60)), codec="ans")
    sh = sh_mod.load_shards(spark, [a, c])
    first = _sharded(spark, sh, "blockmax")
    assert first == _sharded(spark, sh, "blockmax")
    assert sh["num_docs"] == 20
