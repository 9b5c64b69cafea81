"""Document statistics: lengths + BM25-normalized lengths (WAND data part 1).

Reference: ``wand_data`` stores ``norm_lens[d] = doc_len / avg_len``
(wand_data.hpp:22-33, fed by the ``.sizes`` file, README.md:98-101).
Here ``doc_len`` = token occurrences per doc, ``avg_len`` over ALL docs
of the collection (including zero-length docs, which the reference's
sizes file also contains).

Spark shape: one partial+final aggregation for lengths; avg is a scalar
(driver broadcast via crossJoin of a 1-row aggregate, which Catalyst
plans as a broadcast nested loop of one row — no shuffle of the big
side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_doc_stats(docs: DataFrame, tokens: DataFrame) -> DataFrame:
    """``(doc_id) x (doc_id, term)`` -> ``(doc_id, doc_len, norm_len)``.

    ``docs`` must carry every doc_id (docs with zero tokens get
    doc_len=0, matching the reference's .sizes semantics where empty
    docs still occupy a slot).
    """
    if "tf" in tokens.columns:
        # already-aggregated (doc, term, tf) input: doc_len = sum(tf)
        lens = tokens.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    else:
        lens = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    all_docs = docs.select("doc_id").join(lens, "doc_id", "left").fillna(
        {"doc_len": 0}
    )
    avg = all_docs.agg(F.avg("doc_len").alias("avg_len"))
    return (
        all_docs.crossJoin(F.broadcast(avg))
        .withColumn(
            # double here; the float32 cast (wand_data.hpp:22-33 stores
            # float) happens inside the compressed-path kernels so the
            # relational oracle stays bit-comparable with DuckDB.
            "norm_len",
            F.col("doc_len").cast("double") / F.col("avg_len"),
        )
        .select("doc_id", F.col("doc_len").cast("long").alias("doc_len"), "norm_len")
    )


def num_docs(doc_stats: DataFrame) -> int:
    return doc_stats.count()
