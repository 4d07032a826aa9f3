"""Stream-stream interval join: view->purchase attribution.

The classic two-stream stateful join — each side buffers rows in the
state store until the other side's watermark passes the join-time
bound, then emits matches and evicts state. The SAME function builds
the batch plan when handed static DataFrames (DataFrame-first design:
one logical plan, two execution modes), which is what the
`attribution` oracle query gates.

At corpus scale the join key (user_id) is high-cardinality and the
time bound caps state size per key: state ~ O(events within the
attribution window), independent of stream length — the property that
makes this run forever on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attributed_purchases(views: DataFrame, purchases: DataFrame,
                         max_gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Purchases attributed to the views they followed within
    ``max_gap``: inner join on user_id with the purchase timestamp
    range-bounded against the view timestamp. Works identically on
    static and streaming inputs; watermarks are applied only when the
    input is streaming (static DataFrames reject withWatermark)."""
    # watermarks require TIMESTAMP (not NTZ); the cast is a no-op for
    # already-zoned inputs and cancels out of the gap arithmetic
    v = views.select(F.col("user_id"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").cast("timestamp").alias("v_ts"))
    p = purchases.select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("buy_id"),
                         F.col("ts").cast("timestamp").alias("p_ts"),
                         F.col("value"))
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    cond = ((v.user_id == p.p_user)
            & (p.p_ts >= v.v_ts)
            & (p.p_ts <= v.v_ts + F.expr(f"INTERVAL {max_gap}")))
    return (v.join(p, cond, "inner")
            .select("user_id", "view_id", "buy_id",
                    (F.unix_timestamp("p_ts")
                     - F.unix_timestamp("v_ts")).alias("gap_s"),
                    F.round("value", 2).alias("value")))
