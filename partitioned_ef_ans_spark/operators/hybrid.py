"""Hybrid retrieval: reciprocal-rank fusion of ranked lists.

A training-data / RAG pipeline rarely retrieves with one signal: the
standard recipe is sparse BM25 top-k (the compressed-index plane) plus
dense embedding top-k (the ANN plane), fused per query.  Reciprocal
Rank Fusion (Cormack, Clarke & Büttcher, "Reciprocal Rank Fusion
outperforms Condorcet and individual Rank Learning Methods", SIGIR
2009 — public) is the fusion that needs NO score calibration between
the systems: each list contributes ``1/(k_rrf + rank)`` and the fused
ranking orders by the sum.

Scale shape: inputs are already per-query top-k tables (k rows per
query per list — tiny regardless of corpus size), so fusion is one
shuffle on (query_id, doc_id) over O(#queries × k × #lists) rows, then
a per-query window.  Determinism: contributions are exact double
divisions; with two lists the sum is a single commutative addition, so
Spark and any ANSI-SQL engine agree bit-for-bit (with three or more
lists, double-sum ORDER could matter — the round-7 discipline plus
distinct contribution magnitudes makes rank flips vanishingly unlikely,
and the gate pins the two-list case).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the SIGIR'09 paper's constant — dampens the head so a single
#: first-place vote cannot dominate consistent mid-rank agreement
DEFAULT_K_RRF = 60


def rrf_fuse(
    lists: list[DataFrame],
    k: int = 10,
    k_rrf: int = DEFAULT_K_RRF,
) -> DataFrame:
    """Fuse ranked lists — each ``(query_id, rank, doc_id, ...)`` with
    rank starting at 1 — into ``(query_id, rank, doc_id, rrf)`` top-k
    per query by summed reciprocal ranks.  A doc missing from a list
    simply contributes nothing for it (asymmetric coverage is the
    normal case: an all-OOV text query has an empty sparse list but a
    full dense one)."""
    if not lists:
        raise ValueError("rrf_fuse: no input lists")
    contribs = [
        l.select(
            "query_id",
            "doc_id",
            (
                F.lit(1.0)
                / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))
            ).alias("contrib"),
        )
        for l in lists
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib"), 7).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"),
            "doc_id", "rrf",
        )
    )


def dense_topk_for_queries(
    query_vecs: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Dense retrieval for explicit query vectors: ``query_vecs`` is
    ``(query_id, embedding)``, result is ``(query_id, rank, doc_id,
    cos)`` top-k by rounded cosine (vec_id tie-break) — the per-query
    twin of :func:`..operators.ann.cosine_topk`'s all-pairs shape (no
    self-exclusion: a query vector is not a corpus row here).  This is
    the brute-force baseline (full-corpus crossJoin — recall oracle /
    small-corpus tool only); the scale path is
    :func:`..operators.ann.ivf_dense_topk`, which assigns the corpus
    to IVF buckets once and probes ``nprobe`` buckets per query."""
    from partitioned_ef_ans_spark.operators.ann import _dot, _norm

    q = query_vecs.select(
        "query_id", F.col("embedding").alias("q_emb")
    )
    scored = q.crossJoin(embeddings).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (_norm(F.col("q_emb")) * _norm(F.col("embedding"))),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"),
            "doc_id", "cos",
        )
    )
