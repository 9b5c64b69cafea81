"""Query spell correction ("did-you-mean") against the index
dictionary — fuzzy OOV repair the reference engine lacks (its
transform_queries, transform_queries.cpp:139-160, DROPS any query with
an unmapped token; search engines correct first and drop last).

Rule (fully integer-ordered, so Spark and DuckDB agree bit-for-bit):
an out-of-vocabulary query term is replaced by the dictionary term
with the smallest Levenshtein distance ``<= max_dist``; ties break by
HIGHER document frequency (the more common reading wins), then by
ascending term.  In-vocabulary terms pass through untouched.  A query
keeping any unresolvable term is dropped whole — the same skip
semantics as the S6 transformer, applied after correction.

Scale shape: the OOV tokens of a query batch are tiny and BROADCAST;
the dictionary (the index's frozen ``term_stats`` — vocabulary-sized,
already the serving sidecar) is scanned ONCE map-side under a length
pre-filter (``abs(len(t) - len(cand)) <= max_dist`` — a necessary
condition for the distance, pruning most of the vocabulary before any
Levenshtein evaluation).  Nothing shuffles but the per-(query, pos)
best-candidate window over the few surviving candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def correct_query_terms(
    queries_df: DataFrame,
    dict_df: DataFrame,
    max_dist: int = 2,
) -> DataFrame:
    """(query_id, terms array<string>) -> same shape, OOV terms
    corrected per the module rule; unresolvable queries dropped.

    ``dict_df`` needs (term, df) — the index's term_stats qualifies.
    """
    d = int(max_dist)
    dic = dict_df.select("term", "df")
    toks = queries_df.select(
        "query_id", F.posexplode("terms").alias("pos", "raw")
    ).select("query_id", "pos", F.lower("raw").alias("term"))
    hit = toks.join(dic.select("term"), "term", "left_semi").select(
        "query_id", "pos", "term"
    )
    oov = toks.join(dic.select("term"), "term", "left_anti")
    cand = (
        F.broadcast(oov)
        .crossJoin(dic.select(F.col("term").alias("cand"), "df"))
        .where(F.abs(F.length("term") - F.length("cand")) <= d)
        .withColumn("dist", F.levenshtein("term", "cand"))
        .where(F.col("dist") <= d)
    )
    w = Window.partitionBy("query_id", "pos").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("cand")
    )
    fixed = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("query_id", "pos", F.col("cand").alias("term"))
    )
    resolved = hit.unionByName(fixed)
    npos = toks.groupBy("query_id").agg(F.count(F.lit(1)).alias("_n"))
    nres = resolved.groupBy("query_id").agg(F.count(F.lit(1)).alias("_m"))
    keep = (
        npos.join(nres, "query_id")
        .where(F.col("_n") == F.col("_m"))
        .select("query_id")
    )
    return (
        resolved.join(F.broadcast(keep), "query_id")
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ).alias("terms")
        )
    )


def run_ranked_fuzzy(
    spark,
    index_df: DataFrame,
    queries_df: DataFrame,
    codec,
    num_docs: int,
    avg_len: float,
    *,
    term_stats_df: DataFrame,
    max_dist: int = 2,
    mode: str = "blockmax",
    k: int = 10,
    dtype: str = "float32",
    **kw,
) -> DataFrame:
    """Correct-then-retrieve: ``correct_query_terms`` over the frozen
    term_stats, then the certified ``run_ranked`` (every kernel /
    masking / dispatch guarantee inherited)."""
    from partitioned_ef_ans_spark.index import query as q_mod

    # materialized via localCheckpoint: run_ranked references its
    # queries frame more than once (dispatch probe + list join), and
    # unlike cache() the blocks are reclaimed when the frame goes out
    # of scope — repeated calls never accumulate pinned cache entries
    corrected = correct_query_terms(
        queries_df, term_stats_df, max_dist
    ).localCheckpoint(eager=True)
    return q_mod.run_ranked(
        spark, index_df, corrected, codec, num_docs, avg_len,
        mode=mode, k=k, dtype=dtype, term_stats_df=term_stats_df, **kw,
    )
