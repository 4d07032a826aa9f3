"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — deterministic geo points derived from the
sf0.001 documents table are CRS-transformed to EPSG:3857 through the
vectorized pandas-UDF kernel, geocell-encoded + slippy-tiled natively,
and aggregated per tile (the "transformed-and-tiled pages/sec" unit of
BASELINE.json).

queries()/oracle_sql(): the full operator surface from SURVEY.md §2 —
see pyproj_spark/queries.py (geo + relational) and
pyproj_spark/queries_text.py (dedup/similarity/text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# import-safe regardless of the harness cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transform + cell-encode + tile the sf0.001 points."""
    from pyspark.sql import functions as F

    from pyproj_spark.functions import cells
    from pyproj_spark.functions.tiles import tile_xy
    from pyproj_spark.functions.transform import transform_xy
    from pyproj_spark.queries import _doc_points

    pts = _doc_points(spark, "/root/testdata/sf0.001")
    xy = transform_xy("EPSG:4326", "EPSG:3857", F.col("lon"), F.col("lat"))
    pts = pts.withColumn("xy", xy)
    tx, ty = tile_xy(F.col("xy.x"), F.col("xy.y"), 8)
    return (pts
            .withColumn("cell", cells.cell_of(F.col("lon"), F.col("lat"),
                                              cells.DEFAULT_RES))
            .withColumn("tx", tx).withColumn("ty", ty)
            .groupBy("tx", "ty")
            .agg(F.count("*").alias("n_points"),
                 F.countDistinct("cell").alias("n_cells"))
            .orderBy("tx", "ty"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyproj_spark.queries import QUERIES
    from pyproj_spark.queries_text import QUERIES_TEXT
    out = {name: fn for name, (fn, _sql) in QUERIES.items()}
    out.update({name: fn for name, (fn, _sql) in QUERIES_TEXT.items()})
    return out


def oracle_sql() -> dict[str, str]:
    from pyproj_spark.queries import QUERIES
    from pyproj_spark.queries_text import QUERIES_TEXT
    out = {name: sql for name, (fn, sql) in QUERIES.items()
           if sql is not None}
    out.update({name: sql for name, (fn, sql) in QUERIES_TEXT.items()
                if sql is not None})
    return out
