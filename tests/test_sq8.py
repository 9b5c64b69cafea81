"""Signed-int8 scalar quantization ANN (operators/ann.py sq8_*).

The SQ8 plane is the 100 TB embedding-IO lever: the int8 twin of the
normalized vector is 1/4 the bytes, the candidate prefilter runs on
exact integer dots, and the float rescore touches only survivors.
Correctness contract: with a keep-everything rescore_mult the output
EQUALS the unquantized path bit-for-bit (the prefilter is then a
no-op), and the quantization itself is engine-deterministic (hashed in
the ann_ivf_family gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.operators import ann


def _embs(spark, sf_med):
    return spark.read.parquet(f"{sf_med}/embeddings.parquet")


def test_sq8_quantize_range_and_python_replay(spark, sf_med):
    """Every component in [-127, 127]; values replay exactly from a
    python float walk (floor(127*v/||v|| + 0.5) in double)."""
    import math

    embs = _embs(spark, sf_med).limit(20)
    got = {r["vec_id"]: r["qvec"] for r in ann.sq8_quantize(embs).collect()}
    for r in embs.collect():
        v = [float(x) for x in r["embedding"]]
        nn = math.sqrt(sum(x * x for x in v))
        want = [math.floor(x / nn * 127.0 + 0.5) for x in v]
        assert got[r["vec_id"]] == want
        assert all(-127 <= q <= 127 for q in want)


def test_sq8_keep_all_equals_ivf_exactly(spark, sf_med):
    """rescore_mult large enough to keep every candidate -> the int8
    first pass filters nothing and the result must equal ivf_topk
    row-for-row INCLUDING scores (same candidates, same rescore)."""
    embs = _embs(spark, sf_med)
    base = sorted(
        map(tuple, ann.ivf_topk(embs, k=5, n_centroids=8, nprobe=2).collect())
    )
    sq = sorted(
        map(
            tuple,
            ann.sq8_ivf_topk(
                embs, k=5, n_centroids=8, nprobe=2, rescore_mult=10_000
            ).collect(),
        )
    )
    assert sq == base and len(base) > 0


def test_sq8_recall_vs_ivf_at_small_mult(spark, sf_med):
    """The int8 dot on normalized vectors tracks cosine tightly: at
    rescore_mult=3 the bucketed top-5 should be recovered almost
    perfectly (measured 1.0 on this table; assert a safe floor)."""
    embs = _embs(spark, sf_med)
    base = {
        (r["vec_id"], r["neighbor"])
        for r in ann.ivf_topk(embs, k=5, n_centroids=8, nprobe=2).collect()
    }
    sq = {
        (r["vec_id"], r["neighbor"])
        for r in ann.sq8_ivf_topk(
            embs, k=5, n_centroids=8, nprobe=2, rescore_mult=3
        ).collect()
    }
    assert len(sq & base) / len(base) >= 0.95


def test_sq8_dense_external_queries_keep_all_equals_unquantized(spark, sf_med):
    """ivf_dense_topk(quant='sq8') with a keep-everything mult equals
    the unquantized dense probe exactly; a small mult keeps the
    contract shape (k rows per query, exact cosines on survivors)."""
    embs = _embs(spark, sf_med)
    qv = (
        embs.orderBy("vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    base = sorted(
        map(
            tuple,
            ann.ivf_dense_topk(
                qv, embs, k=5, n_centroids=8, nprobe=2
            ).collect(),
        )
    )
    sq = sorted(
        map(
            tuple,
            ann.ivf_dense_topk(
                qv, embs, k=5, n_centroids=8, nprobe=2,
                quant="sq8", rescore_mult=10_000,
            ).collect(),
        )
    )
    assert sq == base and len(base) == 50
    small = ann.ivf_dense_topk(
        qv, embs, k=5, n_centroids=8, nprobe=2, quant="sq8", rescore_mult=2
    )
    per_q = small.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q) and len(per_q) == 10


def test_sq8_unknown_quant_mode_raises(spark, sf_med):
    embs = _embs(spark, sf_med).limit(5)
    qv = embs.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="quant"):
        ann.ivf_dense_topk(qv, embs, k=2, n_centroids=2, quant="int4")


def test_dense_topk_np_parity_with_hof_path(spark, sf_med):
    """The Arrow/numpy kernel must reproduce the crossJoin+HOF brute
    path EXACTLY (ids, ranks, and round-6 scores): rounding happens
    half-up before every selection on both paths, tie-break by doc_id
    — any divergence here is a rounding-discipline bug, not noise."""
    from partitioned_ef_ans_spark.operators import hybrid as h_mod

    embs = _embs(spark, sf_med)
    qv = (
        embs.orderBy("vec_id")
        .limit(15)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    want = sorted(map(tuple, h_mod.dense_topk_for_queries(qv, embs, k=10).collect()))
    got = sorted(map(tuple, ann.dense_topk_np(qv, embs, k=10).collect()))
    assert len(want) == 150
    assert [t[:3] for t in got] == [t[:3] for t in want]
    assert all(abs(g[3] - w[3]) < 1e-9 for g, w in zip(got, want))


def test_dense_topk_np_parity_across_partitionings(spark, sf_med):
    """Per-batch partial top-k must be invariant to how the corpus is
    partitioned (the merge of per-batch top-ks is a total-order
    top-k)."""
    embs = _embs(spark, sf_med)
    qv = (
        embs.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    one = sorted(map(tuple, ann.dense_topk_np(qv, embs.coalesce(1), k=7).collect()))
    many = sorted(map(tuple, ann.dense_topk_np(qv, embs.repartition(13), k=7).collect()))
    assert one == many and len(one) == 35


def test_dense_topk_np_sq8_keep_all_and_contract(spark, sf_med):
    """sq8 with a keep-everything mult equals the unquantized kernel;
    a small mult still returns k exact-scored rows per query."""
    embs = _embs(spark, sf_med)
    qv = (
        embs.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    base = sorted(map(tuple, ann.dense_topk_np(qv, embs, k=5).collect()))
    keep_all = sorted(
        map(
            tuple,
            ann.dense_topk_np(qv, embs, k=5, quant="sq8", rescore_mult=10_000).collect(),
        )
    )
    assert keep_all == base
    small = ann.dense_topk_np(qv, embs, k=5, quant="sq8", rescore_mult=3)
    rows = small.collect()
    assert len(rows) == 40
    # survivors are exact-rescored: every emitted cos matches the true
    # rounded cosine for that (query, doc) pair
    base_map = {(t[0], t[2]): t[3] for t in base}
    hits = [r for r in rows if (r["query_id"], r["doc_id"]) in base_map]
    assert all(abs(base_map[(r["query_id"], r["doc_id"])] - r["cos"]) < 1e-9 for r in hits)
    assert len(hits) / len(rows) >= 0.9  # recall floor at mult=3


def test_dense_topk_np_empty_queries(spark, sf_med):
    embs = _embs(spark, sf_med)
    qv = embs.select(F.col("vec_id").alias("query_id"), "embedding").where(F.lit(False))
    out = ann.dense_topk_np(qv, embs, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "doc_id", "cos"]


def test_sq8_precomputed_quantized_invariance(spark, sf_med):
    """Passing a persisted sq8_quantize twin must not change results
    (self-join and external-query paths)."""
    embs = _embs(spark, sf_med)
    q8 = ann.sq8_quantize(embs)
    a = sorted(map(tuple, ann.sq8_ivf_topk(embs, k=5, n_centroids=8).collect()))
    b = sorted(
        map(tuple, ann.sq8_ivf_topk(embs, k=5, n_centroids=8, quantized=q8).collect())
    )
    assert a == b
    qv = (
        embs.orderBy("vec_id")
        .limit(6)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    c = sorted(
        map(
            tuple,
            ann.ivf_dense_topk(
                qv, embs, k=5, n_centroids=8, quant="sq8", rescore_mult=4
            ).collect(),
        )
    )
    d = sorted(
        map(
            tuple,
            ann.ivf_dense_topk(
                qv, embs, k=5, n_centroids=8, quant="sq8", rescore_mult=4,
                quantized=q8,
            ).collect(),
        )
    )
    assert c == d and len(c) == 30


def test_ivf_dense_np_engine_parity(spark, sf_med):
    """engine='np' must reproduce the HOF scoring path exactly (ids,
    ranks, round-6 scores) for both the plain and the sq8-prefiltered
    shapes."""
    embs = _embs(spark, sf_med)
    qv = (
        embs.orderBy("vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    for kw in ({}, {"quant": "sq8", "rescore_mult": 3}):
        hof = sorted(
            map(
                tuple,
                ann.ivf_dense_topk(
                    qv, embs, k=5, n_centroids=8, nprobe=2, **kw
                ).collect(),
            )
        )
        np_ = sorted(
            map(
                tuple,
                ann.ivf_dense_topk(
                    qv, embs, k=5, n_centroids=8, nprobe=2, engine="np", **kw
                ).collect(),
            )
        )
        assert [t[:3] for t in np_] == [t[:3] for t in hof]
        assert all(abs(a[3] - b[3]) < 1e-9 for a, b in zip(np_, hof))
    with pytest.raises(ValueError, match="engine"):
        ann.ivf_dense_topk(qv, embs, k=2, n_centroids=2, engine="blas")


def test_assign_buckets_np_engine_parity(spark, sf_med):
    """numpy assignment must equal the HOF assignment exactly
    (rounded-cosine argmax, cent_id tie-break)."""
    embs = _embs(spark, sf_med)
    cent = (
        embs.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))
    )
    hof = sorted(map(tuple, ann.assign_buckets(embs, cent).collect()))
    np_ = sorted(map(tuple, ann.assign_buckets(embs, cent, engine="np").collect()))
    assert np_ == hof and len(hof) == 500
    with pytest.raises(ValueError, match="engine"):
        ann.assign_buckets(embs, cent, engine="blas")
