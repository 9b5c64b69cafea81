"""Incremental corpus ingest via Structured Streaming.

The reference is strictly batch (two passes over a frozen collection,
SURVEY.md §1.3); its "resumable build" maps to checkpoints.  This
module adds the Spark-native incremental front door a 100 TB corpus
needs: new corpus files land in a directory, a file-source stream
tokenizes each micro-batch and appends per-batch tf DELTAS to a
staging table; ``compact_deltas`` folds deltas into the canonical tf
table (sum by doc/term), after which the normal two-pass index build
(or a per-part re-encode of affected parts via index/checkpoint.py)
runs on the compacted table.

Exactly-once: the file source tracks processed files in the stream
checkpoint; delta files are keyed by batch id, and compaction is a
pure aggregation — replays are idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.tokenizer import term_frequencies, tokenize

CORPUS_STREAM_SCHEMA = "doc_id long, content string"


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """File-source stream -> per-batch tf deltas under ``staging_dir``.

    trigger_once=True drains everything currently in input_dir and
    stops (the batch-friendly mode used by tests and catch-up runs);
    False leaves a continuous micro-batch stream running.
    """
    src = (
        spark.readStream.schema(CORPUS_STREAM_SCHEMA)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        tf = term_frequencies(
            tokenize(batch_df, doc_col="doc_id", text_col="content")
        ).withColumn("batch_id", F.lit(batch_id))
        tf.write.mode("append").parquet(staging_dir)

    writer = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()


def compact_deltas(spark: SparkSession, staging_dir: str) -> DataFrame:
    """Fold all tf deltas into the canonical (doc_id, term, tf) table.

    Documents may be re-ingested (corrections): the LATEST batch wins
    per doc (deterministic last-writer semantics keyed by batch_id).
    """
    deltas = spark.read.parquet(staging_dir)
    latest = deltas.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
    return (
        deltas.join(latest, ["doc_id", "batch_id"])
        .select("doc_id", "term", "tf")
    )
