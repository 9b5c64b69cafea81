"""Deterministic stratified sampling for training-mix construction.

A 100-TB corpus is never trained on verbatim: the pipeline draws a
weighted mixture (so much web, so much code, per-language quotas).
Sampling must be DETERMINISTIC — reproducible across runs, engines and
cluster sizes — so membership derives from a seeded hash of the row
id, never from RNG state or partition layout (Spark's ``df.sample`` is
neither stable across partitionings nor reproducible in any other
engine).

Two modes, both pure Catalyst:

* **rate**: keep a row iff ``md5_long(seed:id) < rate * 2^60`` — the
  md5-prefix trick shared with the dedup plane gives the identical
  keep set in DuckDB (`CAST('0x'||substr(md5(..),1,15) AS BIGINT)`),
  scale-free and map-side only (no shuffle at all);
* **cap**: exactly ``cap`` rows per stratum — the ``cap`` SMALLEST
  hashes (a deterministic uniform draw without replacement).  A naive
  window over each stratum sorts whole strata in single tasks (a "en"
  stratum of a web corpus is most of the corpus), so the top-k is
  two-stage: per-(stratum, salt) candidates first, then the exact
  global cut over ``n_salts * cap`` survivors — the same
  partial-then-final shape as every distributed top-k in this repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.functions.text import md5_long

#: md5_long keeps 15 hex digits = 60 bits; thresholds live in [0, 2^60)
HASH_SPACE = 1 << 60

#: fan-out of the first top-k stage in cap mode
N_SALTS = 64


def sample_hash(id_col: Column, seed: str) -> Column:
    """The 60-bit deterministic draw: uniform on [0, 2^60) given the
    seed, identical in Spark and DuckDB."""
    return md5_long(F.concat_ws(":", F.lit(seed), id_col.cast("string")))


def duckdb_sample_hash(id_expr: str, seed: str) -> str:
    return ("CAST(('0x' || substr(md5('" + seed + ":' || "
            f"CAST({id_expr} AS VARCHAR)), 1, 15)) AS BIGINT)")


def stratified_sample(
    docs_df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Rate mode: per-stratum Bernoulli keep at the stratum's rate.
    Strata absent from ``rates`` fall back to ``default_rate``.
    Entirely map-side (filter only) — the 100-TB shape: no shuffle, no
    driver state, and adding executors never changes the sample."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} out of [0,1]: {r}")
    thresholds = F.create_map(*[
        x for s, r in sorted(rates.items())
        for x in (F.lit(s), F.lit(int(r * HASH_SPACE)))
    ])
    thr = F.coalesce(
        thresholds[F.col(stratum_col)],
        F.lit(int(default_rate * HASH_SPACE)),
    )
    return docs_df.where(sample_hash(F.col(id_col), seed) < thr)


def stratified_cap(
    docs_df: DataFrame,
    caps: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix0",
) -> DataFrame:
    """Cap mode: exactly ``min(cap, |stratum|)`` rows per stratum — the
    rows with the ``cap`` smallest hashes (ties impossible: the hash is
    keyed on the unique id, and equal 60-bit values still break by id).
    Strata not in ``caps`` are dropped.

    Two-stage exact top-k: stage 1 ranks within (stratum, salt) so no
    task ever sorts more than a 1/64 slice of a stratum; stage 2 ranks
    the ≤ 64*cap survivors.  Output is identical to the naive
    single-window form at any parallelism.
    """
    cap_map = F.create_map(*[
        x for s, c in sorted(caps.items())
        for x in (F.lit(s), F.lit(int(c)))
    ])
    h = sample_hash(F.col(id_col), seed)
    base = (
        docs_df.where(F.col(stratum_col).isin(list(caps)))
        .withColumn("_h", h)
        .withColumn("_cap", cap_map[F.col(stratum_col)])
        .withColumn("_salt", F.pmod(F.col("_h"), F.lit(N_SALTS)))
    )
    w1 = (Window.partitionBy(stratum_col, "_salt")
          .orderBy(F.col("_h"), F.col(id_col)))
    w2 = Window.partitionBy(stratum_col).orderBy(F.col("_h"), F.col(id_col))
    return (
        base.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= F.col("_cap"))
        .withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= F.col("_cap"))
        .drop("_h", "_cap", "_salt", "_r1", "_r2")
    )


#: hash-range buckets of the token-budget prefix sum; the hash is
#: uniform, so buckets are balanced slices of each stratum
N_BUCKETS = 64


def stratified_token_budget(
    docs_df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "mix0",
    token_col: str | None = None,
) -> DataFrame:
    """Token-budget mode: per stratum, walk the docs in seeded-hash
    order and keep each doc while the RUNNING TOKEN TOTAL (including
    the doc itself) stays ≤ the stratum's budget — the quota a real
    training mix is specified in (tokens, not documents).  Strata not
    in ``budgets`` are dropped.  The rule is the pure per-row
    predicate ``prefix_sum(tokens) <= budget`` (the prefix sum counts
    EVERY walked doc, so the walk effectively stops at the first
    overshooting doc — the hash order makes which docs land inside the
    budget a uniform draw) — identical in any SQL engine as a window
    cumsum.

    Scale shape — a distributed prefix sum, never a stratum-sized
    sort: hash-RANGE buckets (``floor(h / (2^60/64))``) make bucket
    order equal global hash order, so (1) per-(stratum, bucket) window
    cumsums run on ~1/64 slices, (2) the per-bucket token totals are a
    tiny aggregate (strata × 64 rows) whose running sum gives each
    bucket's global offset, broadcast back, and (3) buckets whose
    offset already exceeds the budget are pruned BEFORE the window —
    with budget ≪ corpus only the boundary buckets do any sorting at
    all.  Deterministic from (id, tokens) alone at any parallelism.

    Tokens default to the shared whitespace tokenizer's count over
    ``text_col``; pass ``token_col`` to budget on precomputed counts.
    """
    from partitioned_ef_ans_spark.functions.text import tokens_array

    tok = (
        F.col(token_col).cast("long")
        if token_col is not None
        else F.size(tokens_array(F.col(text_col))).cast("long")
    )
    budget_map = F.create_map(*[
        x for s, b in sorted(budgets.items())
        for x in (F.lit(s), F.lit(int(b)))
    ])
    base = (
        docs_df.where(F.col(stratum_col).isin(list(budgets)))
        .withColumn("_h", sample_hash(F.col(id_col), seed))
        .withColumn("_tok", tok)
        # exact integer bucketing (both constants are powers of two);
        # double division could round a boundary hash into the wrong
        # bucket
        .withColumn(
            "_b",
            F.shiftright(
                F.col("_h"), (HASH_SPACE // N_BUCKETS).bit_length() - 1
            ).cast("int"),
        )
    )
    totals = base.groupBy(stratum_col, "_b").agg(
        F.sum("_tok").alias("_bt")
    )
    w_off = (
        Window.partitionBy(stratum_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        stratum_col, "_b",
        F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).alias("_off"),
    )
    w_cum = (
        Window.partitionBy(stratum_col, "_b")
        .orderBy(F.col("_h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offs), [stratum_col, "_b"])
        .withColumn("_budget", budget_map[F.col(stratum_col)])
        # bucket-level prune: offset past the budget ⇒ nothing in this
        # bucket can be kept — skip its sort entirely
        .where(F.col("_off") < F.col("_budget"))
        .withColumn("_c", F.sum("_tok").over(w_cum) + F.col("_off"))
        .where(F.col("_c") <= F.col("_budget"))
        .drop("_h", "_tok", "_b", "_off", "_budget", "_c")
    )
