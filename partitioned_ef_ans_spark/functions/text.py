"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (JVM-side, no Python in the data path),
each with an exactly-equivalent DuckDB SQL fragment for the oracle
gate.  Deterministic cross-engine hashing uses the md5-prefix trick:
Spark ``conv(substr(md5(x),1,15),16,10)::long`` ==
DuckDB ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.tokenizer import tokens_array

#: language marker dictionaries (deterministic n-gram-style heuristic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "das"],
    "fr": ["le", "la", "et"],
}

STOPWORDS = ["the", "a"]

#: BPE-ish piece regex: letter runs, digit runs, single other glyphs
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def md5_long(col: Column, hexdigits: int = 15) -> Column:
    """Deterministic 60-bit hash identical across Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, hexdigits), 16, 10).cast("long")


def duckdb_md5_long(expr: str, hexdigits: int = 15) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {hexdigits})) AS BIGINT)"


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_bpe_pieces, n_chars)."""
    toks = tokens_array(F.col(text_col))
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_bpe_pieces"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def quality_score(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio, mean_token_len, quality).

    quality = 1/(1+exp(-(0.01*n_tokens - 2*stopword_ratio))) — a simple
    deterministic logistic combining length and stopword pressure.
    """
    toks = tokens_array(F.col(text_col))
    n = F.size(toks).cast("double")
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    tot_len = F.aggregate(
        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
    )
    stop_ratio = F.when(n > 0, stop / n).otherwise(F.lit(0.0))
    mean_len = F.when(n > 0, tot_len / n).otherwise(F.lit(0.0))
    quality = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(0.01) * n - F.lit(2.0) * stop_ratio))
    )
    return documents.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): argmax of marker-token hits, 'und' when no
    marker present; deterministic tie-break by language code."""
    toks = tokens_array(F.col(text_col))
    hits = [
        F.size(F.filter(toks, lambda t: t.isin(markers))).alias(f"h_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = documents.select("doc_id", *hits)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"h_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:  # first lang (alphabetical) reaching the max wins
        pred = pred.when(F.col(f"h_{l}") == best, F.lit(l))
    return scored.select("doc_id", pred.alias("pred_lang"))


def repetition_signals(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1
    repetition filters), pure Catalyst:

      dup_token_frac  = 1 - distinct_tokens / tokens
      top_token_frac  = occurrences of the most frequent token / tokens
      dup_bigram_frac = 1 - distinct_bigrams / bigrams

    High values flag boilerplate/spam documents in training-data
    curation; all three are exactly SQL-expressible (DuckDB oracle).
    """
    toks = tokens_array(F.col(text_col))
    base = documents.select("doc_id", toks.alias("w"))
    n = F.size("w").cast("double")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("w") - 2, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, 2)),
    )
    per_doc = base.select(
        "doc_id",
        n.alias("n"),
        F.size(F.array_distinct("w")).cast("double").alias("nd"),
        F.when(F.size("w") >= 2, F.size(bigrams).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("nb"),
        F.when(F.size("w") >= 2, F.size(F.array_distinct(bigrams)).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("nbd"),
    )
    tf = (
        documents.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("double").alias("top"))
    )
    out = per_doc.join(tf, "doc_id", "left").fillna({"top": 0.0})
    frac = lambda a, b: F.when(b > 0, a / b).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.round(frac(F.col("n") - F.col("nd"), F.col("n")), 6).alias(
            "dup_token_frac"
        ),
        F.round(frac(F.col("top"), F.col("n")), 6).alias("top_token_frac"),
        F.round(frac(F.col("nb") - F.col("nbd"), F.col("nb")), 6).alias(
            "dup_bigram_frac"
        ),
    )


def fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): order-aware document fingerprint = XOR-fold of
    52-bit position-salted token hashes.  XOR is overflow-free by
    construction (a sum would silently wrap int64 past ~4k tokens in
    Spark while DuckDB sums in HUGEINT — engines would diverge);
    position salting keeps the aggregate order-aware."""
    toks = tokens_array(F.col(text_col))
    exploded = documents.select("doc_id", F.posexplode(toks).alias("pos", "term"))
    h = md5_long(F.concat_ws(":", F.col("term"), F.col("pos")), hexdigits=13)
    return (
        exploded.groupBy("doc_id")
        .agg(F.bit_xor(h).alias("fp"))
        .select("doc_id", F.col("fp").cast("long").alias("fp"))
    )
