"""Demo job for spark-submit deployment (north rule: jobs run via
``spark-submit --py-files dist/pyproj_spark.zip``).

Runs the flagship transform+tile pipeline on a synthesized pages table
and prints one JSON summary line.

    python tools/make_pyfiles_zip.py
    spark-submit --master local[8] --py-files dist/pyproj_spark.zip \
        tools/submit_job.py 100000
"""

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(n_pages: int):
    spark = (SparkSession.builder.appName("pyproj-spark-submit-demo")
             .getOrCreate())
    from pyproj_spark.functions import cells
    from pyproj_spark.functions.tiles import tile_xy
    from pyproj_spark.functions.transform import transform_xy
    from pyproj_spark.operators.extract import extract_anchors
    from pyproj_spark.sources.pages import pages_df

    pages = pages_df(spark, n_pages)
    a = extract_anchors(pages)
    xy = transform_xy("EPSG:4326", "EPSG:3857", F.col("lon"), F.col("lat"))
    a = a.withColumn("xy", xy)
    tx, ty = tile_xy(F.col("xy.x"), F.col("xy.y"), 8)
    out = (a.withColumn("cell", cells.cell_of(F.col("lon"), F.col("lat"),
                                              cells.DEFAULT_RES))
           .withColumn("tx", tx).withColumn("ty", ty)
           .groupBy("tx", "ty").agg(F.count("*").alias("n")))
    rows = out.count()
    total = out.agg(F.sum("n")).collect()[0][0]
    print(json.dumps({"tiles": rows, "anchors": int(total),
                      "pages": n_pages}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
