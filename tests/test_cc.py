"""Connected components over near-dup pairs (operators/cc.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.operators import cc as cc_mod
from partitioned_ef_ans_spark.operators import dedup as d_mod


def _uf_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Brute-force union-find ground truth: node -> component min."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run_cc(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = cc_mod.connected_components(df).collect()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert len(got) == len(out), "duplicate doc_id rows in the mapping"
    return got


def test_cc_two_components_and_dup_edges(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (2, 1), (10, 20), (20, 10)]
    assert _run_cc(spark, pairs) == {1: 1, 2: 1, 3: 1, 10: 10, 20: 10}


def test_cc_long_chain_converges_logarithmically(spark):
    # a 60-node path is the worst case for naive label propagation
    # (O(diameter) rounds); the alternating star algorithm must still
    # land well under MAX_ROUNDS and map everything to the chain min
    pairs = [(i, i + 1) for i in range(5, 65)]
    got = _run_cc(spark, pairs)
    assert got == {i: 5 for i in range(5, 66)}


def test_cc_matches_union_find_on_random_graph(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(0, 400, 3))  # sparse ids on purpose
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(160)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run_cc(spark, pairs) == _uf_components(pairs)


def test_cc_empty_and_neardup_totality(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert cc_mod.connected_components(empty).count() == 0

    docs = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (7, "cc")], "doc_id long, text string"
    )
    out = cc_mod.neardup_clusters(docs, pairs=empty).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in out} == {1: 1, 2: 2, 7: 7}


def test_neardup_clusters_and_survivors_end_to_end(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    pairs_df = d_mod.minhash_lsh_pairs(docs)
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    truth = _uf_components(pairs)

    clusters = cc_mod.neardup_clusters(docs, pairs_df)
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}

    n_docs = docs.count()
    assert len(got) == n_docs, "assignment must be total over documents"
    for doc, comp in truth.items():
        assert got[doc] == comp
    # docs without any near-dup pair map to themselves
    paired = set(truth)
    assert all(c == d for d, c in got.items() if d not in paired)

    survivors = cc_mod.dedup_survivors(docs, clusters)
    kept = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    expected_kept = {d for d, c in got.items() if d == c}
    assert kept == expected_kept
    # exactly one survivor per cluster, payload columns intact
    assert survivors.columns == docs.columns
    assert len(kept) == len(set(got.values()))


def test_gate_neardup_clusters_matches_duckdb_oracle(spark, sf_med):
    """The driver-gate pairing at sf0.01: Spark star-CC vs the DuckDB
    recursive-CTE oracle, value-for-value."""
    duckdb = pytest.importorskip("duckdb")
    from partitioned_ef_ans_spark import gate_training as gt

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in gt.q_neardup_clusters(spark, sf_med).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{sf_med}/documents.parquet')"
    )
    want = dict(con.execute(gt.sql_neardup_clusters()).fetchall())
    assert got == want
    # the entry is only interesting if some real clustering happened
    assert any(d != c for d, c in got.items())
