"""Watermarked windowed event aggregation — Structured Streaming.

The batch `operators/events.py::windowed_event_counts` run as a
continuous query: tumbling windows over event time, a watermark
bounding how late data may arrive, append-mode emission once the
watermark closes a window.  Late events inside the watermark are
counted; events older than the watermark are dropped by the engine —
exactly the state-bound / correctness trade a 100 TB event stream
needs (state size stays O(open windows), not O(history)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def start_windowed_events(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "90 minutes",
):
    """File-source event stream -> closed-window aggregates appended
    to ``out_dir``.  Each invocation drains currently-available files
    (availableNow) and persists watermark + window state in the
    checkpoint; windows emit in the run AFTER the watermark passes
    their end (append-mode semantics)."""
    src = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(input_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window").getField("start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_events_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
