"""Event-stream analytics: tumbling-window aggregation over the
``events`` table (event_id, ts, user_id, event_type, value, props).

Batch form here; `streaming/events.py` runs the SAME aggregation as a
watermarked Structured Streaming query (late data beyond the watermark
dropped) and the equivalence test pins that both planes agree on
in-watermark data.

Scale shape: one shuffle on (window, event_type) with map-side partial
aggregation — the canonical Catalyst plan; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW = "1 hour"


def windowed_event_counts(events: DataFrame, window: str = WINDOW) -> DataFrame:
    """(window_start, event_type, n_events, sum_value): tumbling
    ``window`` counts + value sums per event type.  sum_value is
    rounded to 6 decimals (deterministic across engines — the raw
    double sum is order-sensitive in the last ulps)."""
    return (
        events.groupBy(
            F.window("ts", window).getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def user_session_counts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, n_sessions, n_events): sessionization by inactivity
    gap — a session break is a >``gap_minutes`` silence per user.
    Pure window functions (lag + cumulative sum), no UDFs."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; epoch via ltz is exact under the
    # engine's pinned UTC session timezone (session.py)
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.select(
        "user_id", "event_id", "ts",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return (
        marked.groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
