"""End-to-end training-mix construction — the composition the whole
training plane exists for: quality-filter → exact-dedup →
benchmark-decontaminate → deterministic stratified sample, one
DataFrame in, the selected training set out.

This is the pipeline a 100-TB pretraining run actually executes, and
every stage is the scale shape its standalone operator already proved:

* **quality** — pure Catalyst column expressions (functions/text.py),
  map-side only; the threshold compares the ROUNDED score (6 decimals)
  so Spark and DuckDB cut identically;
* **dedup** — one shuffle on sha256(text), canonical = min doc_id
  (operators/dedup.py semantics applied as a filter);
* **decontaminate** — eval n-grams broadcast against the survivors'
  shingle stream (operators/decontam.py), drop docs whose rounded
  overlap with ANY eval item reaches ``max_overlap``; the eval side is
  tiny by construction (a benchmark suite), so no corpus-sized state;
* **sample** — seeded md5-hash rate sampling per stratum
  (operators/sampling.py), map-side, reproducible across engines,
  partitionings and cluster sizes.

Stage order is the cheap-first / correct-anyway order: quality and
dedup are text-pure (identical text ⇒ identical verdicts), so
filtering before decontamination never changes which contaminated
texts exist — it only shrinks the shingle stream the decontaminator
scans.  Sampling last keeps quotas meaningful (rates apply to the
CLEAN pool, not the raw crawl).

Reference: the reference engine stops at the index/query planes; this
composition is part of the beyond-reference training-pipeline surface
(SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.functions import text as t_mod
from partitioned_ef_ans_spark.operators import decontam as dc_mod
from partitioned_ef_ans_spark.operators import sampling as s_mod

#: defaults mirror the standalone operators' gate constants
DEFAULT_QUALITY_MIN = 0.6
DEFAULT_MAX_OVERLAP = 0.5


def training_mix(
    docs_df: DataFrame,
    eval_df: DataFrame,
    rates: dict[str, float],
    quality_min: float = DEFAULT_QUALITY_MIN,
    n: int = dc_mod.DEFAULT_NGRAM,
    max_overlap: float = DEFAULT_MAX_OVERLAP,
    seed: str = "mix0",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    default_rate: float = 0.0,
    budgets: dict[str, int] | None = None,
    dedup: str = "exact",
) -> DataFrame:
    """The selected training set: all of ``docs_df``'s columns, one row
    per kept document.

    Keep a doc iff ALL of:

    1. ``round(quality, 6) >= quality_min`` (quality_score's logistic
       of length + stopword pressure — rounded-before-threshold);
    2. it is the canonical (min-``id_col``) copy of its exact text —
       and, with ``dedup="neardup"``, also the canonical member of its
       MinHash-LSH near-duplicate cluster (operators/cc.py connected
       components over minhash_lsh_pairs; web corpora are deduped
       fuzzily, not just exactly).  Exact dedup always runs first: it
       is cheaper and catches short docs that carry no shingles;
    3. no eval item's rounded ``n``-gram overlap with it reaches
       ``max_overlap``;
    4. the seeded hash draw admits it at its stratum's rate
       (strata absent from ``rates`` fall back to ``default_rate``) —
       or, when ``budgets`` is given, the stratum's running TOKEN
       total in hash order stays within its budget
       (sampling.stratified_token_budget; ``rates`` is ignored).

    Deterministic end-to-end: every stage derives from (text, id)
    alone — re-running on any partitioning, engine or cluster size
    reproduces the identical set.
    """
    # 1. quality — recompute the score as column expressions on the
    # full row (quality_score() projects ids only); same rounding
    toks = t_mod.tokens_array(F.col(text_col))
    nt = F.size(toks).cast("double")
    stop = F.size(F.filter(toks, lambda t: t.isin(t_mod.STOPWORDS))).cast(
        "double"
    )
    stop_ratio = F.when(nt > 0, stop / nt).otherwise(F.lit(0.0))
    quality = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(F.lit(0.01) * nt - F.lit(2.0) * stop_ratio))),
        6,
    )
    qual = docs_df.where(quality >= float(quality_min))

    # 2. exact dedup — keep the canonical copy (min id per sha256)
    if dedup not in ("exact", "neardup"):
        raise ValueError(f"dedup must be 'exact' or 'neardup': {dedup!r}")
    w = Window.partitionBy(F.sha2(F.col(text_col), 256))
    ded = (
        qual.withColumn("_canon", F.min(id_col).over(w))
        .where(F.col(id_col) == F.col("_canon"))
        .drop("_canon")
    )
    if dedup == "neardup":
        from partitioned_ef_ans_spark.operators import cc as cc_mod

        if id_col != "doc_id" and "doc_id" in ded.columns:
            # withColumnRenamed would otherwise yield TWO doc_id
            # columns and an ambiguous-reference analysis error deep
            # inside neardup_clusters — fail fast with the cause
            raise ValueError(
                f"dedup='neardup' with id_col={id_col!r} requires the "
                "frame not to carry a separate 'doc_id' column "
                "(rename or drop it first)"
            )
        base = (
            ded if id_col == "doc_id"
            else ded.withColumnRenamed(id_col, "doc_id")
        )
        base = cc_mod.dedup_survivors(
            base, cc_mod.neardup_clusters(base, text_col=text_col)
        )
        ded = (
            base if id_col == "doc_id"
            else base.withColumnRenamed("doc_id", id_col)
        )

    # 3. decontaminate — drop docs overlapping any eval item.
    # Contamination is text-pure and PER-DOC (each doc's overlap with
    # the eval suite depends on nothing but its own text), so the
    # dirty set derives from the RAW input, not the survivors: deriving
    # it from ``ded`` made the broadcast-anti subtree recompute the
    # whole quality+dedup-window pipeline — a SECOND full-row shuffle
    # of the corpus per action (measured in the BENCH_MIX plan; the
    # job-boundary constant behind its 0.60 scaling efficiency).
    # Extra dirty ids that quality/dedup already dropped are no-ops in
    # the anti-join, so the selected set is identical.
    dirty = dc_mod.contaminated_doc_ids(
        docs_df, eval_df, n=n, min_overlap=max_overlap,
        doc_col=id_col, text_col=text_col,
    ).withColumnRenamed("doc_id", id_col)
    clean = ded.join(F.broadcast(dirty), id_col, "left_anti")

    # 4. stratified sample on the clean pool
    if budgets is not None:
        return s_mod.stratified_token_budget(
            clean, budgets, stratum_col=stratum_col, id_col=id_col,
            text_col=text_col, seed=seed,
        )
    return s_mod.stratified_sample(
        clean, rates, stratum_col=stratum_col, id_col=id_col,
        seed=seed, default_rate=default_rate,
    )


def mix_report(
    mix_df: DataFrame,
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum accounting of a selected mix: docs and whitespace
    tokens — the numbers a mixture designer iterates against.  One
    partial-aggregated shuffle on the (few) strata."""
    return (
        mix_df.groupBy(stratum_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size(t_mod.tokens_array(F.col(text_col))))
            .cast("long")
            .alias("n_tokens"),
        )
        .orderBy(stratum_col)
    )
