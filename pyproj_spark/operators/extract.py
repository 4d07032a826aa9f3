"""Geo-anchor extraction from page text — pure Catalyst regex.

The first derived table of the graft (SURVEY.md §1.5 / §2.6):
``anchors(url, anchor_idx, anchor_text, lon, lat, src_crs)``.

Extraction is a single ``regexp_extract_all`` + ``posexplode`` — fully
native, no Python. The per-url byte-identity contract (BASELINE.json
input_hint) is tested against the reference extractor
:func:`extract_anchors_py` below.

Anchors in a projected source CRS are normalized to EPSG:4326 lon/lat by
one pandas-UDF transform per distinct src_crs (grouped so each batch
runs ONE kernel — never per-row planning, cf. the 160ms-vs-6µs replan
cost in the reference docs/advanced_examples.rst:13-44).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyproj_spark.functions.transform import transform_xy

ANCHOR_RE = r"@geo\((-?\d+\.\d+),(-?\d+\.\d+)(?:,(EPSG:\d+))?\)"
_ANCHOR_RE_PY = re.compile(ANCHOR_RE)


def extract_anchors(pages: DataFrame, normalize_crs: bool = True
                    ) -> DataFrame:
    """pages -> anchors. Columns: url, anchor_idx, anchor_text, x, y,
    src_crs, lon, lat (lon/lat always EPSG:4326 when normalize_crs)."""
    a = (
        pages
        .select(
            "url",
            F.posexplode(
                F.regexp_extract_all("text", F.lit(ANCHOR_RE), 0)
            ).alias("anchor_idx", "anchor_text"),
        )
        .select(
            "url", "anchor_idx", "anchor_text",
            F.regexp_extract("anchor_text", ANCHOR_RE, 1)
            .cast("double").alias("x"),
            F.regexp_extract("anchor_text", ANCHOR_RE, 2)
            .cast("double").alias("y"),
            F.coalesce(
                F.nullif(F.regexp_extract("anchor_text", ANCHOR_RE, 3),
                         F.lit("")),
                F.lit("EPSG:4326"),
            ).alias("src_crs"),
        )
    )
    if not normalize_crs:
        return a
    # per-CRS normalization: geographic anchors pass through natively
    # (noop elision); projected ones go through one kernel per CRS.
    # The set of source CRSs in web text is tiny and known; plan each once.
    geo = a.filter(F.col("src_crs") == "EPSG:4326").withColumn(
        "lon", F.col("x")).withColumn("lat", F.col("y"))
    out = [geo]
    other = [r[0] for r in a.select("src_crs").filter(
        F.col("src_crs") != "EPSG:4326").distinct().collect()]
    for crs in sorted(other):
        part = a.filter(F.col("src_crs") == crs)
        xf = transform_xy(crs, "EPSG:4326", F.col("x"), F.col("y"))
        part = (part.withColumn("_ll", xf)
                .withColumn("lon", F.col("_ll.x"))
                .withColumn("lat", F.col("_ll.y"))
                .drop("_ll"))
        out.append(part)
    res = out[0]
    for p in out[1:]:
        res = res.unionByName(p)
    return res


def extract_anchors_py(text: str) -> list[tuple[str, float, float, str]]:
    """Reference extractor (the byte-identity oracle): returns
    [(anchor_text, x, y, src_crs), ...] in order of appearance."""
    out = []
    for m in _ANCHOR_RE_PY.finditer(text):
        out.append((m.group(0), float(m.group(1)), float(m.group(2)),
                    m.group(3) or "EPSG:4326"))
    return out
