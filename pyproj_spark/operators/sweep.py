"""Scanline interval-union sweep — polygon/rect dissolve.

Boolean union ("dissolve") of overlapping shapes, computed exactly on
the pixel grid: every shape contributes a closed integer interval
[x_lo, x_hi] to each scanline row it crosses, and the union per row is
the classic gaps-and-islands sweep — order intervals by x_lo, carry a
running max of x_hi over the PRECEDING intervals, open a new island
whenever the next interval starts past it. Union length = sum of
island extents; no pairwise geometry is ever formed, so N heavily
overlapping shapes cost O(N log N) (the per-row sort) instead of the
O(N^2) a pairwise-difference dissolve would.

Scale shape: one explode (bounded by shape height in rows), one
shuffle partitioned by the scanline row, and the per-row window is the
parallelism unit — at corpus scale the grid resolution (row count)
grows with the data, exactly like tile zoom does for the raster
family. Integer coordinates end-to-end: both engines sweep identical
values, so island boundaries cannot flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def union_by_row(rects: DataFrame) -> DataFrame:
    """Per-scanline-row union of (id, x_lo, x_hi, y_lo, y_hi) rects
    (inclusive integer bounds): returns one row per covered y with
    the contributing-interval count, island (connected run) count,
    and exact union pixel length."""
    rows = rects.select(
        "id", "x_lo", "x_hi",
        F.explode(F.sequence("y_lo", "y_hi")).alias("y"))
    w = (Window.partitionBy("y").orderBy("x_lo", "id")
         .rowsBetween(Window.unboundedPreceding, -1))
    marked = rows.withColumn(
        "new_island",
        F.when(F.col("x_lo") > F.max("x_hi").over(w), 1)
         .when(F.max("x_hi").over(w).isNull(), 1).otherwise(0))
    wi = (Window.partitionBy("y").orderBy("x_lo", "id")
          .rowsBetween(Window.unboundedPreceding, 0))
    islands = marked.withColumn("island",
                                F.sum("new_island").over(wi))
    per_island = (islands.groupBy("y", "island")
                  .agg(F.min("x_lo").alias("ilo"),
                       F.max("x_hi").alias("ihi"),
                       F.count(F.lit(1)).alias("n")))
    return (per_island.groupBy("y")
            .agg(F.sum("n").alias("n_intervals"),
                 F.count(F.lit(1)).alias("n_islands"),
                 F.sum(F.col("ihi") - F.col("ilo") + 1)
                  .alias("union_len")))
