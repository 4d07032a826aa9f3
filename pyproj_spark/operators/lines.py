"""Polyline operators: geodesic line lengths as window + aggregate
(SURVEY.md §2.2 G6/G7 Spark mapping).

The reference's ``Geod.line_length`` walks consecutive points in C
(``pyproj/_geod.pyx:476-539``); distributed, the same dataflow is
``lead() over (partitionBy(line) orderBy(seq))`` -> per-segment Karney
inverse (pandas UDF) -> ``groupBy(line).agg(sum)``. Catalyst handles
partial aggregation; the only shuffle is the window's, reused by the
final agg because the partition keys match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyproj_spark.functions.transform import geod_inverse, haversine_m


def segment_lengths(points: DataFrame, line_col: str = "line_id",
                    seq_col: str = "seq", lon_col: str = "lon",
                    lat_col: str = "lat", ellps: str = "WGS84",
                    exact: bool = True) -> DataFrame:
    """Per-segment distances (G7): one row per consecutive point pair."""
    w = Window.partitionBy(line_col).orderBy(seq_col)
    df = (points
          .withColumn("_lon2", F.lead(lon_col).over(w))
          .withColumn("_lat2", F.lead(lat_col).over(w))
          .filter(F.col("_lon2").isNotNull()))
    if exact:
        g = geod_inverse(ellps, F.col(lon_col), F.col(lat_col),
                         F.col("_lon2"), F.col("_lat2"))
        df = df.withColumn("seg_m", g["dist"])
    else:
        df = df.withColumn("seg_m", haversine_m(
            F.col(lon_col), F.col(lat_col), F.col("_lon2"), F.col("_lat2")))
    return df.select(line_col, seq_col, "seg_m")


def line_lengths(points: DataFrame, **kw) -> DataFrame:
    """Total geodesic length per line (G6)."""
    line_col = kw.get("line_col", "line_id")
    return (segment_lengths(points, **kw)
            .groupBy(line_col)
            .agg(F.sum("seg_m").alias("length_m")))
