"""Benchmark decontamination: flag training documents that overlap an
evaluation set's n-grams.

The standard LLM-pipeline hygiene pass (GPT-3 appendix C / PaLM /
Llama report all describe the same shape): an eval item "contaminates"
a training doc when a large fraction of the item's word n-grams appear
verbatim in the doc.  This is NOT in the reference (a retrieval
engine), but it is the canonical companion of the dedup plane: the
shingle machinery (tokenizer.shingles_array) is shared with
phrase/MinHash, and the output feeds the same keep/drop masking the
index planes consume (query.make_allowlist).

Scale shape (100 TB corpus, O(10^5-10^7) eval n-grams):

* the EVAL side is tiny by construction — it broadcasts; the corpus
  side is a map-side explode + broadcast-hash semi-join, so NO corpus
  shingle ever crosses a shuffle;
* only MATCHING (doc, eval, shingle) rows — the contaminated sliver —
  reach the distinct + aggregate, so the one real shuffle is
  proportional to contamination, not corpus size;
* everything is Catalyst (whole-stage codegen); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.tokenizer import shingles_array

#: overlap is measured on word n-grams of this width by default; 13 in
#: the published pipelines — small corpora/tests use 3 so short docs
#: still carry shingles
DEFAULT_NGRAM = 13


def eval_ngram_table(eval_df: DataFrame, n: int = DEFAULT_NGRAM,
                     id_col: str = "eval_id",
                     text_col: str = "text") -> DataFrame:
    """Distinct ``(eval_id, shingle)`` word n-grams of the eval items
    (the broadcast side).  Items shorter than ``n`` tokens contribute
    nothing (and can never be matched — callers should size ``n`` to
    their eval set)."""
    return (
        eval_df.select(
            F.col(id_col).alias("eval_id"),
            F.explode(shingles_array(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def contamination(
    docs_df: DataFrame,
    eval_df: DataFrame,
    n: int = DEFAULT_NGRAM,
    min_overlap: float = 0.0,
    doc_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Per ``(doc, eval item)`` n-gram overlap:

    ``(doc_id, eval_id, n_hit, eval_ngrams, overlap_frac)`` where
    ``n_hit`` counts the eval item's DISTINCT n-grams found verbatim
    in the doc and ``overlap_frac = n_hit / eval_ngrams`` (rounded to
    6 decimals — ranking/thresholding happens on the rounded value so
    Spark and any SQL oracle agree bit-for-bit).  Rows below
    ``min_overlap`` are dropped; pairs with zero overlap never appear.

    The eval table is broadcast; corpus shingles are filtered map-side
    by the broadcast-hash join BEFORE the distinct, so the shuffle
    carries only contaminated rows.
    """
    grams = eval_ngram_table(eval_df, n, id_col=eval_id_col,
                             text_col=eval_text_col)
    sizes = grams.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("long").alias("eval_ngrams")
    )
    doc_sh = docs_df.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(shingles_array(F.col(text_col), n)).alias("shingle"),
    )
    hits = (
        doc_sh.join(F.broadcast(grams), "shingle")
        # a shingle repeated inside the doc must count once
        .select("doc_id", "eval_id", "shingle").distinct()
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    out = (
        hits.join(F.broadcast(sizes), "eval_id")
        .select(
            "doc_id", "eval_id", "n_hit", "eval_ngrams",
            F.round(F.col("n_hit") / F.col("eval_ngrams"), 6)
            .alias("overlap_frac"),
        )
    )
    if min_overlap > 0.0:
        out = out.where(F.col("overlap_frac") >= float(min_overlap))
    return out


def contamination_via_index(
    spark,
    index_df: DataFrame,
    eval_df: DataFrame,
    codec,
    n: int = DEFAULT_NGRAM,
    min_overlap: float = 0.0,
    term_stats_df: DataFrame | None = None,
    tombstones=None,
    allowlist=None,
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
    index_ngram: int | None = None,
) -> DataFrame:
    """``contamination`` served from a width-``n`` shingle index
    (index/phrase.py builds) with ZERO corpus re-scan: each eval item
    becomes a disjunctive "query" whose terms are its distinct
    shingles, the doc-partitioned match substrate decodes only the
    posting lists those shingles reference, and the overlap is a
    relational aggregate — ``n_hit = count_distinct(shingle)`` per
    (doc, eval item), ``eval_ngrams`` the item's FULL distinct-shingle
    count (OOV shingles still count in the denominator), same rounded
    ``overlap_frac`` cut.  Row-identical to the corpus scan by
    construction: a doc is in a shingle's posting list iff the doc
    contains that shingle.

    Scale shape: the eval side is tiny (it rides broadcast inside the
    substrate's query join); index chunks flow to tasks and decode
    once per batch — no corpus text is read at all, and re-running
    decontamination against a refreshed eval set costs O(eval shingle
    posting bytes), not O(corpus).  Composes with ``tombstones`` /
    ``allowlist`` masking exactly like every serving path.

    ``index_ngram`` (pass ``manifest['ngram']``) guards against
    querying at a width the index wasn't shingled at — a silent
    vocabulary mismatch would report zero contamination.
    """
    from partitioned_ef_ans_spark.index import query as q_mod

    if index_ngram is not None and int(index_ngram) != int(n):
        raise ValueError(
            f"index is shingled at width {index_ngram}, "
            f"contamination requested at width {n}"
        )
    if allowlist is not None:
        tombstones = q_mod.make_allowlist(allowlist, tombstones)
    tomb_bc = q_mod._as_tomb_bc(spark, tombstones)
    grams = eval_ngram_table(eval_df, n, id_col=eval_id_col,
                             text_col=eval_text_col)
    queries = grams.groupBy("eval_id").agg(
        F.collect_set("shingle").alias("terms")
    ).select(F.col("eval_id").alias("query_id"), "terms")
    rows = q_mod.boolean_match_rows_docpartitioned(
        spark, index_df, queries, codec,
        term_stats_df=term_stats_df, tomb_bc=tomb_bc,
    )
    out = (
        rows.groupBy("query_id", "doc_id")
        .agg(
            F.count_distinct("term").cast("long").alias("n_hit"),
            F.first("n_terms").cast("long").alias("eval_ngrams"),
        )
        .select(
            "doc_id", F.col("query_id").alias("eval_id"),
            "n_hit", "eval_ngrams",
            F.round(F.col("n_hit") / F.col("eval_ngrams"), 6)
            .alias("overlap_frac"),
        )
    )
    if min_overlap > 0.0:
        out = out.where(F.col("overlap_frac") >= float(min_overlap))
    return out


def contaminated_doc_ids(docs_df: DataFrame, eval_df: DataFrame,
                         n: int = DEFAULT_NGRAM,
                         min_overlap: float = 0.8, **kw) -> DataFrame:
    """The drop set: distinct doc_ids whose overlap with ANY eval item
    reaches ``min_overlap`` — complement it into
    ``query.make_allowlist`` to serve/train on the clean remainder."""
    return (
        contamination(docs_df, eval_df, n=n, min_overlap=min_overlap, **kw)
        .select("doc_id").distinct()
    )
