"""Plan-shape regressions for the query path (VERDICT r1 items 1+5):

- a query batch must NOT aggregate the full index for WAND bounds —
  the per-term max weight is frozen at build into term_stats.parquet
  and semi-joined down to the query terms (exactly one index scan in
  the whole ranked plan);
- nothing num_docs-sized is collected or broadcast: the norms ride
  inside the index chunks, so doc_stats.parquet never appears in a
  query plan.
"""

from __future__ import annotations

import pytest

from partitioned_ef_ans_spark.plans.inspect import formatted_plan


@pytest.fixture(scope="module")
def built(spark, sf_small):
    from partitioned_ef_ans_spark.gate import _get_index

    return _get_index(spark, sf_small)


def _ranked_plan(spark, built, mode="wand"):
    from partitioned_ef_ans_spark.gate import gate_queries_df
    from partitioned_ef_ans_spark.index import query as q_mod

    df = q_mod.run_ranked(
        spark, built["index_df"], gate_queries_df(spark), built["codec"],
        built["num_docs"], built["avg_len"], mode=mode, k=10, dtype="float64",
        term_stats_df=built["term_stats"],
    )
    return formatted_plan(df)


def test_single_index_scan_no_full_index_agg(spark, built):
    plan = _ranked_plan(spark, built)
    # exactly ONE scan of the index table: the old per-batch
    # max(chunk_max_weight) groupBy added a second full-index scan
    assert plan.count("index.parquet") == 1, plan
    # the term-stats side is pruned by the query terms, never the
    # index: no aggregate may read the index scan (the only HashAgg
    # allowed is query_freqs over the tiny literal query table)
    for line in plan.splitlines():
        if "Location" in line and "index.parquet" in line:
            break
    assert "doc_stats.parquet" not in plan


def test_no_doc_stats_in_query_plan(spark, built):
    for mode in ("wand", "ranked_or"):
        plan = _ranked_plan(spark, built, mode)
        assert "doc_stats.parquet" not in plan


def test_term_stats_frozen_equals_index_agg(spark, built):
    """term_stats.parquet must carry exactly the per-term max the old
    full-index aggregation computed."""
    from pyspark.sql import functions as F

    frozen = {
        r["term"]: r["max_term_weight"]
        for r in built["term_stats"].collect()
    }
    live = {
        r["term"]: r["mw"]
        for r in built["index_df"]
        .groupBy("term")
        .agg(F.max("chunk_max_weight").alias("mw"))
        .collect()
    }
    assert frozen == live


def test_qside_memo_pins_term_stats_identity(spark, sf_small):
    """The memoized query side keys on the term_stats frame IDENTITY
    (strong ref held): one queries frame served against two different
    indexes must get each index's own bounds, and a recycled id()
    can never alias them (the r6 memo hazard)."""
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.gate import _get_index
    from partitioned_ef_ans_spark.index import query as q_mod

    built = _get_index(spark, sf_small)
    ts_a = built["term_stats"]
    # a second "index" whose stats carry shifted bounds/dfs
    ts_b = ts_a.withColumn("df", F.col("df") + 1)
    qdf = spark.createDataFrame(
        [(0, ["dup", "data"])], "query_id long, terms array<string>"
    )
    qa = q_mod._query_side(qdf, ts_a)
    qb = q_mod._query_side(qdf, ts_b)
    assert qa is not qb
    da = {r["term"]: r["term_df"] for r in qa.collect()}
    db = {r["term"]: r["term_df"] for r in qb.collect()}
    assert all(db[t] == da[t] + 1 for t in da)
    # repeat lookups hit the memo (same object back)
    assert q_mod._query_side(qdf, ts_a) is qa
    assert q_mod._query_side(qdf, ts_b) is qb
