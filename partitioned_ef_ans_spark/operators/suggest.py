"""Prefix autocomplete ("suggest") from the index dictionary —
completes the query-assist plane (did-you-mean for typos, suggest for
partial input, more-like-this for documents, PRF for recall).

Rule: for each prefix, the top-``n`` dictionary terms that start with
it, ordered by document frequency DESC then term ASC — integers and
lexicographic order only, deterministic everywhere.

Scale shape: prefixes are a tiny broadcast; the dictionary (frozen
term_stats, vocabulary-sized) is scanned once map-side with a
``startswith`` predicate — on a dictionary stored sorted by term the
predicate is range-prunable, which is how a real deployment would
serve it (the parquet min/max term statistics already give row-group
pruning for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def suggest_terms(
    prefixes_df: DataFrame,
    dict_df: DataFrame,
    n: int = 8,
) -> DataFrame:
    """(prefix) x (term, df) -> (prefix, rank, term, df), rank 1..n
    per prefix by (df desc, term asc).  Prefixes are lowercased."""
    pre = prefixes_df.select(F.lower("prefix").alias("prefix")).distinct()
    cand = F.broadcast(pre).join(
        dict_df.select("term", "df"),
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(n))
        .select("prefix", F.col("rank").cast("int").alias("rank"),
                "term", "df")
    )
