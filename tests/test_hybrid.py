"""Hybrid sparse+dense retrieval via RRF (operators/hybrid.py)."""

from __future__ import annotations

import pytest

from partitioned_ef_ans_spark.operators import hybrid as h_mod


def _df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, rank int, doc_id long")


def test_rrf_fuse_hand_computed(spark):
    # query 0: doc 7 is rank 1 sparse + rank 2 dense; doc 8 rank 2 + 1
    # (tie by construction -> doc_id breaks it); doc 9 sparse-only.
    sparse = _df(spark, [(0, 1, 7), (0, 2, 8), (0, 3, 9)])
    dense = _df(spark, [(0, 1, 8), (0, 2, 7)])
    out = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["rrf"])
        for r in h_mod.rrf_fuse([sparse, dense], k=10).collect()
    }
    both = round(1.0 / 61 + 1.0 / 62, 7)
    assert out[(0, 1)] == (7, both)   # tie with 8 -> smaller doc_id first
    assert out[(0, 2)] == (8, both)
    assert out[(0, 3)] == (9, round(1.0 / 63, 7))
    assert len(out) == 3


def test_rrf_fuse_asymmetric_and_multi_query(spark):
    # query 1 appears only in the dense list (all-OOV sparse case)
    sparse = _df(spark, [(0, 1, 5)])
    dense = _df(spark, [(1, 1, 3), (1, 2, 4)])
    got = {
        (r["query_id"], r["rank"], r["doc_id"])
        for r in h_mod.rrf_fuse([sparse, dense], k=1).collect()
    }
    assert got == {(0, 1, 5), (1, 1, 3)}
    with pytest.raises(ValueError):
        h_mod.rrf_fuse([])


def test_gate_hybrid_matches_duckdb_oracle(spark, sf_med):
    duckdb = pytest.importorskip("duckdb")
    from partitioned_ef_ans_spark import gate_training as gt

    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["rrf"])
        for r in gt.q_hybrid_rrf(spark, sf_med).collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"parquet_scan('{sf_med}/{t}.parquet')"
        )
    want = sorted(map(tuple, con.execute(gt.sql_hybrid_rrf()).fetchall()))
    assert got == want
    # the all-OOV gate query (id 4) must still retrieve via the dense
    # list (asymmetric fusion is load-bearing; both-list combination is
    # pinned by the hand-computed unit test — the synthetic embeddings
    # are independent of the text, so cross-list overlap at this SF is
    # not guaranteed)
    assert any(q == 4 for q, _r, _d, _s in got)
