"""Streaming tile aggregation: pages stream -> windowed per-tile counts.

readStream -> anchor extraction (same native exprs as batch — the
logical plan is shared, which is the whole point of DataFrame-first
design) -> geocell/tile assignment -> watermarked tumbling-window
aggregation. Late pages beyond the watermark are dropped, matching the
usual web-crawl ingestion contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyproj_spark.functions import cells
from pyproj_spark.functions.tiles import tile_xy_from_lonlat
from pyproj_spark.operators.extract import ANCHOR_RE


def streaming_tile_counts(pages_stream: DataFrame, zoom: int = 8,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes",
                          res: int = cells.DEFAULT_RES) -> DataFrame:
    """pages stream (url, warc_ts, text, ...) -> per-(window, tile)
    anchor counts. Works on any streaming source with the pages schema
    (kafka value parsed upstream, file source, rate-micro-batch in
    tests)."""
    a = (pages_stream
         .withWatermark("warc_ts", watermark)
         .select(
             "warc_ts",
             F.explode(F.regexp_extract_all("text", F.lit(ANCHOR_RE), 0))
             .alias("anchor_text"))
         .select(
             "warc_ts",
             F.regexp_extract("anchor_text", ANCHOR_RE, 1)
             .cast("double").alias("lon"),
             F.regexp_extract("anchor_text", ANCHOR_RE, 2)
             .cast("double").alias("lat"),
             F.regexp_extract("anchor_text", ANCHOR_RE, 3).alias("crs"))
         .filter(F.col("crs") == "")  # geographic anchors only in-stream
         )
    tx, ty = tile_xy_from_lonlat(F.col("lon"), F.col("lat"), zoom)
    return (a.withColumn("tx", tx).withColumn("ty", ty)
            .withColumn("cell", cells.cell_of(F.col("lon"), F.col("lat"),
                                              res))
            .groupBy(F.window("warc_ts", window).alias("w"), "tx", "ty")
            .agg(F.count("*").alias("n_anchors"),
                 F.approx_count_distinct("cell").alias("n_cells"))
            .select(F.col("w.start").alias("w_start"), "tx", "ty",
                    "n_anchors", "n_cells"))


def run_stream_to_memory(spark, pages_stream: DataFrame, name: str,
                         **kw) -> "StreamingQuery":
    """Test/demo harness: complete-mode memory sink."""
    out = streaming_tile_counts(pages_stream, **kw)
    return (out.writeStream.format("memory").queryName(name)
            .outputMode("complete").start())
