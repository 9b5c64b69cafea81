"""Query transformer: text queries -> term-id queries (reference S6).

transform_queries.cpp:49-198 semantics: parse space-separated query
lines, lowercase, Porter-stem each token, look up BOTH the stemmed
term in the stemmed dictionary and the original term in the unstemmed
dictionary; a query with ANY unmapped token is dropped entirely.

Spark shape: the stemmer runs in an Arrow-batched pandas UDF; the
dictionary lookups are broadcast-hash joins; the OOV drop is an
anti-join-derived filter (max(is_null) per query == the reference's
`skip` flag).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stem_udf_df(tokens: DataFrame, col: str = "term") -> DataFrame:
    """Adds a ``stemmed`` column via Arrow-batched Porter stemming."""
    from partitioned_ef_ans_spark.session import ship_package

    ship_package(tokens.sparkSession)

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in tokens.schema.fields
    ) + ", stemmed string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from partitioned_ef_ans_spark.functions.stemmer import porter_stem

        for pdf in batches:
            pdf = pdf.copy()
            pdf["stemmed"] = pdf[col].map(lambda t: porter_stem(t or ""))
            yield pdf

    return tokens.mapInPandas(run, schema=schema)


def transform_queries(
    queries_df: DataFrame,
    stemmed_dict: DataFrame,
    unstemmed_dict: DataFrame,
) -> DataFrame:
    """(query_id, terms array<string>) -> (query_id, term_ids
    array<long>, uterm_ids array<long>) keeping only fully-mapped
    queries (transform_queries.cpp:139-160 skip semantics).

    Dictionaries: (term, term_id).  Term order inside each query is
    preserved (posexplode + sort on position at re-assembly).
    """
    toks = queries_df.select(
        "query_id", F.posexplode("terms").alias("pos", "raw")
    ).withColumn("term", F.lower("raw"))
    stemmed = stem_udf_df(toks, col="term")
    joined = (
        stemmed.join(
            F.broadcast(
                stemmed_dict.select(
                    F.col("term").alias("stemmed"), F.col("term_id").alias("sid")
                )
            ),
            "stemmed",
            "left",
        )
        .join(
            F.broadcast(
                unstemmed_dict.select(
                    F.col("term").alias("term"), F.col("term_id").alias("uid")
                )
            ),
            "term",
            "left",
        )
    )
    flagged = joined.groupBy("query_id").agg(
        F.max(F.col("sid").isNull() | F.col("uid").isNull()).alias("skip"),
        F.sort_array(F.collect_list(F.struct("pos", "sid", "uid"))).alias("m"),
    )
    return (
        flagged.where(~F.col("skip"))
        .select(
            "query_id",
            F.transform("m", lambda s: s["sid"]).alias("term_ids"),
            F.transform("m", lambda s: s["uid"]).alias("uterm_ids"),
        )
    )
