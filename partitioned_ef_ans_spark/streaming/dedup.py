"""Stateful streaming exact dedup — `applyInPandasWithState`.

The batch plane's `operators/dedup.py::exact_dedup` (window-min
canonical per sha256) re-expressed as a continuous operator: documents
arrive as micro-batches, per-sha256 group state remembers the
canonical (first-seen, min-within-first-batch) doc_id, and every
document is emitted exactly once with its dedup verdict.  This is the
Spark-native front door for dedup-at-ingest on a 100 TB stream: the
state store shards by sha256 (the same key the batch shuffle uses), so
state lookups never leave the executor that owns the hash range.

Semantics vs batch: the canonical is first-seen (min doc_id within the
earliest micro-batch containing the hash), while batch exact_dedup
takes the global min.  The duplicate SET is identical whenever the
earliest-arriving copy also carries the smallest doc_id (the natural
ingest order); the batch-equivalence test pins exactly that, plus
cross-restart state recovery from the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.streaming.ingest import CORPUS_STREAM_SCHEMA

OUTPUT_SCHEMA = (
    "doc_id long, sha256 string, canonical_doc_id long, is_duplicate boolean"
)
STATE_SCHEMA = "canonical_doc_id long"


def _dedup_fn(key, pdf_iter, state):
    import pandas as pd

    canon = state.get[0] if state.exists else None
    docs = []
    for pdf in pdf_iter:
        docs.extend(int(d) for d in pdf["doc_id"])
    docs.sort()
    if not docs:
        yield pd.DataFrame(
            columns=["doc_id", "sha256", "canonical_doc_id", "is_duplicate"]
        )
        return
    if canon is None:
        canon = docs[0]
        state.update((canon,))
    yield pd.DataFrame(
        {
            "doc_id": docs,
            "sha256": key[0],
            "canonical_doc_id": canon,
            "is_duplicate": [d != canon for d in docs],
        }
    )


def start_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """File-source stream of (doc_id, content) -> per-document dedup
    verdicts appended to ``out_dir``.  State (one long per distinct
    sha256) lives in the stream checkpoint and survives restarts;
    re-running after new files land continues with the same canonical
    assignments (exactly-once on the file source)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from partitioned_ef_ans_spark.session import ship_package

    ship_package(spark)
    src = spark.readStream.schema(CORPUS_STREAM_SCHEMA).parquet(input_dir)
    hashed = src.select(
        "doc_id", F.sha2(F.col("content"), 256).alias("sha256")
    )
    out = hashed.groupBy("sha256").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()


def streaming_dedup_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
