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
