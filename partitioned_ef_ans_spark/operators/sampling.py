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
