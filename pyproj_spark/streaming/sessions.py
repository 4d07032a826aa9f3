"""Streaming session windows — the stateful sessionization path.

Batch `user_sessions` (queries.py) runs `session_window` over static
data; this is the same operator under Structured Streaming: the state
store keeps one open session per (user, window), merges events that
land within the inactivity gap, and the WATERMARK is what lets state
be dropped and closed sessions be emitted in append mode — without it
a session could stay open forever and state grows unboundedly. That
watermark/state contract is the 100-TB design point: state size is
bounded by (active users x open sessions inside the watermark
horizon), not by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "10 minutes",
                       ts_col: str = "ts",
                       user_col: str = "user_id") -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) per
    closed session. Works on a streaming OR static DataFrame — the
    same plan both ways, which is what the parity test asserts."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.groupBy(F.col(user_col),
                        F.session_window(ts_col, gap).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(user_col,
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))
