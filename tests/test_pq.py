"""Product-quantization ANN (operators/ann.py pq_*).

PQ is the deep-compression twin of SQ8: the first-pass corpus
representation is m codes (one byte each at ks<=256) instead of dim
int8s — 32x smaller than the float column at dim=64/m=8 — and the
candidate scoring is an integer ADC table sum (order-free, so the
whole pipeline hashes against DuckDB).  Exactness contract mirrors
SQ8: keep-everything rescore_mult equals the unquantized IVF path
bit-for-bit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.operators import ann

M, KS = 8, 16


def _embs(spark, sf_med):
    return spark.read.parquet(f"{sf_med}/embeddings.parquet")


def test_pq_codebooks_shape_and_source(spark, sf_med):
    embs = _embs(spark, sf_med)
    cb = ann.pq_codebooks(embs, m=M, ks=KS)
    rows = cb.collect()
    assert len(rows) == M * KS
    assert {r["s"] for r in rows} == set(range(M))
    assert all(len(r["csub"]) == 64 // M for r in rows)
    # codebook ids are the KS smallest vec_ids
    want_ids = {
        r["vec_id"] for r in embs.orderBy("vec_id").limit(KS).collect()
    }
    assert {r["code_id"] for r in rows} == want_ids


def test_pq_encode_python_replay(spark, sf_med):
    """Codes replay from a float walk: normalized slices, squared-L2
    rounded to 6 before the argmin, code_id tie-break."""
    embs = _embs(spark, sf_med)
    cb_rows = ann.pq_codebooks(embs, m=M, ks=KS).collect()
    cb = {}
    for r in cb_rows:
        cb.setdefault(r["s"], []).append((r["code_id"], list(r["csub"])))
    sample = embs.orderBy("vec_id").limit(10)
    got = {
        (r["vec_id"], r["s"]): r["code"]
        for r in ann.pq_encode(sample, ann.pq_codebooks(embs, m=M, ks=KS), m=M)
        .collect()
    }
    d = 64 // M
    for row in sample.collect():
        v = [float(x) for x in row["embedding"]]
        nn = math.sqrt(sum(x * x for x in v))
        nv = [x / nn for x in v]
        for s in range(M):
            vsub = nv[s * d : (s + 1) * d]
            best = min(
                (
                    (round(sum((a - b) * (a - b) for a, b in zip(vsub, csub)), 6), cid)
                    for cid, csub in cb[s]
                ),
            )
            assert got[(row["vec_id"], s)] == best[1]


def test_pq_keep_all_equals_ivf_exactly(spark, sf_med):
    embs = _embs(spark, sf_med)
    base = sorted(
        map(tuple, ann.ivf_topk(embs, k=5, n_centroids=8, nprobe=2).collect())
    )
    pq = sorted(
        map(
            tuple,
            ann.pq_ivf_topk(
                embs, k=5, n_centroids=8, nprobe=2, m=M, ks=KS,
                rescore_mult=10_000,
            ).collect(),
        )
    )
    assert pq == base and len(base) > 0


def test_pq_precomputed_codebooks_and_codes_invariance(spark, sf_med):
    embs = _embs(spark, sf_med)
    cb = ann.pq_codebooks(embs, m=M, ks=KS)
    codes = ann.pq_encode(embs, cb, m=M)
    a = sorted(
        map(tuple, ann.pq_ivf_topk(embs, k=5, n_centroids=8, m=M, ks=KS).collect())
    )
    b = sorted(
        map(
            tuple,
            ann.pq_ivf_topk(
                embs, k=5, n_centroids=8, m=M, ks=KS,
                codebooks=cb, codes=codes,
            ).collect(),
        )
    )
    assert a == b


def test_pq_gate_matches_duckdb_oracle(spark, sf_med):
    duckdb = pytest.importorskip("duckdb")
    from partitioned_ef_ans_spark import gate_training as gt

    got = sorted(
        (r["vec_id"], r["rank"], r["neighbor"], r["cos"])
        for r in gt.q_ann_ivf_pq(spark, sf_med).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"parquet_scan('{sf_med}/embeddings.parquet')"
    )
    want = sorted(map(tuple, con.execute(gt.sql_ann_ivf_pq()).fetchall()))
    assert got == want and len(got) == 2500


def test_pq_bad_m_raises(spark, sf_med):
    embs = _embs(spark, sf_med)
    with pytest.raises(ValueError, match="divisible"):
        ann.pq_codebooks(embs, m=7)


def test_pq_dense_external_queries_keep_all_equals_unquantized(spark, sf_med):
    """ivf_dense_topk(quant='pq') with a keep-everything mult equals
    the unquantized dense probe exactly; precomputed codebooks/codes
    don't change results."""
    embs = _embs(spark, sf_med)
    qv = (
        embs.orderBy("vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    base = sorted(
        map(
            tuple,
            ann.ivf_dense_topk(qv, embs, k=5, n_centroids=8, nprobe=2).collect(),
        )
    )
    pq = sorted(
        map(
            tuple,
            ann.ivf_dense_topk(
                qv, embs, k=5, n_centroids=8, nprobe=2,
                quant="pq", rescore_mult=10_000,
            ).collect(),
        )
    )
    assert pq == base and len(base) == 50
    cb = ann.pq_codebooks(embs, m=M, ks=KS)
    codes = ann.pq_encode(embs, cb, m=M)
    small_a = sorted(
        map(
            tuple,
            ann.ivf_dense_topk(
                qv, embs, k=5, n_centroids=8, nprobe=2,
                quant="pq", rescore_mult=3,
            ).collect(),
        )
    )
    small_b = sorted(
        map(
            tuple,
            ann.ivf_dense_topk(
                qv, embs, k=5, n_centroids=8, nprobe=2,
                quant="pq", rescore_mult=3,
                pq_codebooks_df=cb, pq_codes_df=codes,
            ).collect(),
        )
    )
    assert small_a == small_b and len(small_a) == 50


def test_pq_trained_codebooks_deterministic_and_shaped(spark, sf_med):
    embs = _embs(spark, sf_med)
    a = sorted(
        (r["s"], r["code_id"], tuple(r["csub"]))
        for r in ann.pq_codebooks_trained(embs, m=M, ks=KS, iters=2).collect()
    )
    b = sorted(
        (r["s"], r["code_id"], tuple(r["csub"]))
        for r in ann.pq_codebooks_trained(embs, m=M, ks=KS, iters=2).collect()
    )
    assert a == b
    assert 0 < len(a) <= M * KS  # empty codewords may drop
    assert all(len(c) == 64 // M for _, _, c in a)
    # training moved the init (rounded pinned) codebooks
    pinned = sorted(
        (r["s"], r["code_id"], tuple(round(x, 6) for x in r["csub"]))
        for r in ann.pq_codebooks(embs, m=M, ks=KS).collect()
    )
    assert a != pinned


def test_pq_trained_keep_all_equals_ivf_exactly(spark, sf_med):
    """Codebook choice cannot change the keep-everything result: the
    rescore is exact, so trained-codebook PQ with a huge rescore_mult
    equals the unquantized IVF path bit-for-bit too."""
    embs = _embs(spark, sf_med)
    base = sorted(
        map(tuple, ann.ivf_topk(embs, k=5, n_centroids=8, nprobe=2).collect())
    )
    cb = ann.pq_codebooks_trained(embs, m=M, ks=KS, iters=2)
    pq = sorted(
        map(
            tuple,
            ann.pq_ivf_topk(
                embs, k=5, n_centroids=8, nprobe=2, m=M, ks=KS,
                rescore_mult=10_000, codebooks=cb,
            ).collect(),
        )
    )
    assert pq == base and len(base) > 0


def test_pq_trained_gate_matches_duckdb_oracle(spark, sf_med):
    duckdb = pytest.importorskip("duckdb")
    from partitioned_ef_ans_spark import gate_training as gt

    got = sorted(
        (r["vec_id"], r["rank"], r["neighbor"], r["cos"])
        for r in gt.q_ann_ivf_pq_trained(spark, sf_med).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"parquet_scan('{sf_med}/embeddings.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(gt.sql_ann_ivf_pq(trained_iters=2)).fetchall())
    )
    assert got == want and len(got) == 2500
