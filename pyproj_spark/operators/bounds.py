"""transform_bounds as a pure DataFrame op (SURVEY.md §2.1 T6).

Reference semantics (``pyproj/transformer.py:1115-1195``,
``pyproj/_transformer.pyx:1046-1129``): transform a bbox by densifying
each edge with N interior points, transform all edge points, take the
outermost envelope. Here: one ``explode(sequence(...))`` builds the
4*(densify+1) edge points natively, the batch kernel transforms them,
and a ``groupBy(id).agg(min/max)`` rebuilds the envelope — Catalyst
handles partial aggregation, so this scales to any number of boxes.

Antimeridian: when the target is geographic and the transformed edge
points wrap (max-min > 180), the envelope is recomputed in the wrapped
frame so right < left signals the crossing, like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyproj_spark.crs.crs import CRS
from pyproj_spark.functions.transform import transform_xy


def transform_bounds_df(boxes: DataFrame, crs_from, crs_to,
                        densify_pts: int = 21,
                        id_cols: tuple = ("box_id",)) -> DataFrame:
    """boxes(id..., left, bottom, right, top) -> same ids + transformed
    envelope (left, bottom, right, top)."""
    n = densify_pts + 1
    ids = [F.col(c) for c in id_cols]
    pts = boxes.select(
        *ids, "left", "bottom", "right", "top",
        F.explode(F.sequence(F.lit(0), F.lit(4 * n - 1))).alias("i"))
    edge = (F.col("i") / n).cast("int")
    f = (F.col("i") % n) / float(n)
    w = F.col("right") - F.col("left")
    h = F.col("top") - F.col("bottom")
    x = (F.when(edge == 0, F.col("left") + w * f)
         .when(edge == 1, F.col("right"))
         .when(edge == 2, F.col("right") - w * f)
         .otherwise(F.col("left")))
    y = (F.when(edge == 0, F.col("bottom"))
         .when(edge == 1, F.col("bottom") + h * f)
         .when(edge == 2, F.col("top"))
         .otherwise(F.col("top") - h * f))
    xy = transform_xy(crs_from, crs_to, x, y)
    pts = pts.withColumn("xy", xy).select(
        *ids, F.col("xy.x").alias("tx"), F.col("xy.y").alias("ty"))
    dst = CRS.from_user_input(crs_to)
    agg = pts.groupBy(*id_cols).agg(
        F.min("tx").alias("left"), F.min("ty").alias("bottom"),
        F.max("tx").alias("right"), F.max("ty").alias("top"),
        # antimeridian detection for geographic targets
        F.min(F.when(F.col("tx") >= 0, F.col("tx"))).alias("_minpos"),
        F.max(F.when(F.col("tx") < 0, F.col("tx"))).alias("_maxneg"),
    )
    if dst.is_geographic:
        crossed = (F.col("right") - F.col("left")) > 180.0
        agg = agg.select(
            *id_cols,
            F.when(crossed, F.col("_minpos")).otherwise(F.col("left"))
            .alias("left"),
            "bottom",
            F.when(crossed, F.col("_maxneg")).otherwise(F.col("right"))
            .alias("right"),
            "top")
    else:
        agg = agg.drop("_minpos", "_maxneg")
    return agg
