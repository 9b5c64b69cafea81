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


def hybrid_search_persisted(
    spark,
    index_dir: str,
    ann_store_dir: str,
    queries_df: DataFrame,
    query_vecs: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    k_leg: int | None = None,
    k_rrf: int = DEFAULT_K_RRF,
    mode: str = "auto",
    dtype: str = "float32",
    nprobe: int = 8,
    quant: str | None = None,
    rescore_mult: int = 3,
    engine: str = "np",
) -> DataFrame:
    """End-to-end RAG retrieval from PERSISTED artifacts: BM25 top-k
    served from the compressed text index at ``index_dir`` (any
    run_ranked mode, giant-query dispatch and all) fused by RRF with
    dense top-k served from the ANN store at ``ann_store_dir`` (IVF
    probe over the frozen centroids, optional sq8/pq first pass).

    ``queries_df`` is ``(query_id, terms array<string>)`` and
    ``query_vecs`` is ``(query_id, embedding)`` — the same query_id
    pairs a text query with its embedding; ``embeddings`` is the float
    table the store was built over.  ``k_leg`` (default ``k``) sets
    the per-substrate depth before fusion.

    Liveness is per substrate: the text leg masks the index's
    tombstone sidecar, the dense leg masks the store's.  A document
    deleted from only ONE substrate can still surface through the
    other's leg — retire a document by deleting it from both
    (checkpoint.delete_docs + ann_store.delete_vectors).
    Scale shape: each leg is its own substrate's serving plan (no new
    shuffles); fusion adds one shuffle over O(queries x k x 2) rows."""
    return HybridServer(spark, index_dir, ann_store_dir, pin=False).search(
        queries_df, query_vecs, embeddings, k=k, k_leg=k_leg, k_rrf=k_rrf,
        mode=mode, dtype=dtype, nprobe=nprobe, quant=quant,
        rescore_mult=rescore_mult, engine=engine,
    )


class HybridServer:
    """The serving-loop shape of :func:`hybrid_search_persisted`: load
    BOTH substrates ONCE (index frames, term stats, manifest, ANN
    store handles, tombstone sidecars) and serve many query batches
    from the pinned handles — the CLAUDE.md serving-wrapper rule
    (never pay a per-call load/scan in a loop) applied to the RAG
    entry point.  ``pin=True`` (default) caches the index scan and
    term stats in Spark's block store; call :meth:`close` to release
    them.

    The handles snapshot the substrates AT LOAD TIME: mutations
    (deletes, appends, compactions) land in a new server — the same
    contract as any loaded index session."""

    def __init__(
        self,
        spark,
        index_dir: str,
        ann_store_dir: str,
        pin: bool = True,
    ) -> None:
        from partitioned_ef_ans_spark.index import build as b_mod
        from partitioned_ef_ans_spark.index.ann_store import load_ann_index
        from partitioned_ef_ans_spark.index.checkpoint import load_tombstones

        self.spark = spark
        self.index_dir = index_dir
        self.ann_store_dir = ann_store_dir
        index_df, _stats, term_stats, codec, man = b_mod.load_index(
            spark, index_dir
        )
        self._pinned = []
        if pin:
            index_df = index_df.cache()
            term_stats = term_stats.cache()
            self._pinned = [index_df, term_stats]
        self.index_df = index_df
        self.term_stats = term_stats
        self.codec = codec
        self.manifest = man
        self.tombstones = load_tombstones(index_dir)
        self.ann = load_ann_index(spark, ann_store_dir)

    def search(
        self,
        queries_df: DataFrame,
        query_vecs: DataFrame,
        embeddings: DataFrame,
        k: int = 10,
        k_leg: int | None = None,
        k_rrf: int = DEFAULT_K_RRF,
        mode: str = "auto",
        dtype: str = "float32",
        nprobe: int = 8,
        quant: str | None = None,
        rescore_mult: int = 3,
        engine: str = "np",
    ) -> DataFrame:
        from partitioned_ef_ans_spark.index import query as q_mod

        k_leg = int(k if k_leg is None else k_leg)
        sparse = q_mod.run_ranked(
            self.spark, self.index_df, queries_df, self.codec,
            self.manifest["num_docs"], self.manifest["avg_doc_len"],
            mode=mode, k=k_leg, dtype=dtype,
            term_stats_df=self.term_stats, tombstones=self.tombstones,
        )
        dense = self.ann.query(
            query_vecs, embeddings, k=k_leg, nprobe=nprobe, quant=quant,
            rescore_mult=rescore_mult, engine=engine,
        )
        return rrf_fuse([sparse, dense], k=k, k_rrf=k_rrf)

    def close(self) -> None:
        for df in self._pinned:
            try:
                df.unpersist()
            except Exception:
                pass
        self._pinned = []
