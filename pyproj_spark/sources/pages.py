"""The `pages` fact table — Common-Crawl-shaped synthetic web pages.

Schema (BASELINE.json input_hint):
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Two generators that must stay BYTE-IDENTICAL per url:

* :func:`pages_df` — native Spark expressions over ``spark.range(n)``
  (scales to 10^12 rows: no driver-side data, no UDFs, embarrassingly
  parallel);
* :func:`pages_pandas` — the pure-python reference used by tests to
  assert the extraction invariant ("byte-identical extracted text per
  url vs the reference extractor").

Geo anchors are embedded in ``text`` as ``@geo(lon,lat)`` or
``@geo(x,y,EPSG:code)`` tokens; ~80% cluster around 20 "hot cities"
(web-data skew, FIXTURES.md §1), ~10% of anchors are in a projected
source CRS to force replanning. All randomness is integer LCG
arithmetic on the row id, kept below 2^63 at any row count.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z
LANGS = ["en", "de", "fr", "es", "zh"]

# 20 hot city centroids (lon, lat) — public coordinates, rounded
CITIES = [
    (-74.006, 40.713), (-0.128, 51.507), (2.352, 48.857), (13.405, 52.520),
    (139.692, 35.690), (116.407, 39.904), (121.474, 31.230), (72.878, 19.076),
    (37.618, 55.751), (-99.133, 19.433), (-46.633, -23.551), (151.209, -33.868),
    (-122.419, 37.775), (-87.630, 41.878), (28.979, 41.008), (31.236, 30.044),
    (103.820, 1.352), (-58.382, -34.603), (18.424, -33.925), (77.209, 28.614),
]

_M1 = 1103515245
_C1 = 12345
_MOD = 2147483648  # 2^31
_PRIME = 1000003


def _mix_expr(idc, salt: int):
    """Deterministic 31-bit mix of (id, salt) — overflow-safe Catalyst."""
    rid = F.pmod(idc + F.lit(salt * 7919), F.lit(_PRIME))
    return F.pmod(rid * F.lit(_M1) + F.lit(_C1 + salt * 97531), F.lit(_MOD))


def _mix_py(i: int, salt: int) -> int:
    rid = (i + salt * 7919) % _PRIME
    return (rid * _M1 + _C1 + salt * 97531) % _MOD


def _anchor_expr(idc, j: int):
    """One '@geo(...)' token (or '' when this row has < j+1 anchors)."""
    r = _mix_expr(idc, j)
    hot = F.pmod(r, F.lit(10)) < 8
    city = F.pmod(r, F.lit(20))
    lon_c = F.element_at(F.array(*[F.lit(c[0]) for c in CITIES]),
                         (city + 1).cast("int"))
    lat_c = F.element_at(F.array(*[F.lit(c[1]) for c in CITIES]),
                         (city + 1).cast("int"))
    du = (F.pmod(_mix_expr(idc, j + 11), F.lit(2001)) - 1000) / 1000.0
    dv = (F.pmod(_mix_expr(idc, j + 23), F.lit(2001)) - 1000) / 1000.0
    lon_hot = lon_c + du * 0.3
    lat_hot = lat_c + dv * 0.3
    lon_u = (F.pmod(_mix_expr(idc, j + 37), F.lit(360000)) / 1000.0) - 180.0
    lat_u = (F.pmod(_mix_expr(idc, j + 41), F.lit(170000)) / 1000.0) - 85.0
    lon = F.when(hot, lon_hot).otherwise(lon_u)
    lat = F.when(hot, lat_hot).otherwise(lat_u)
    # antimeridian / near-pole edge cases, deterministic (FIXTURES.md §1)
    edge = F.pmod(idc + F.lit(j), F.lit(997)) == 0
    lon = F.when(edge, F.lit(180.0)).otherwise(lon)
    lat = F.when(edge, F.lit(89.9)).otherwise(lat)
    # ~10% of anchors in a projected source CRS (forces replan);
    # edge-case anchors are always geographic (matches pages_pandas)
    proj = (F.pmod(_mix_expr(idc, j + 53), F.lit(10)) == 9) & ~edge
    x2100 = 200000.0 + F.pmod(_mix_expr(idc, j + 61), F.lit(600001)) / 1.0
    y2100 = 4000000.0 + F.pmod(_mix_expr(idc, j + 67), F.lit(600001)) / 1.0
    tok = F.when(
        proj, F.format_string("@geo(%.2f,%.2f,EPSG:2100)", x2100, y2100)
    ).otherwise(F.format_string("@geo(%.4f,%.4f)", lon, lat))
    n_anchors = F.pmod(idc, F.lit(6))
    return F.when(F.lit(j) < n_anchors, tok).otherwise(F.lit(""))


def pages_df(spark: SparkSession, n_rows: int, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    """Native-expression pages generator (no UDF, no driver data)."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    idc = F.col("id") + F.lit(seed)
    u = F.pmod(_mix_expr(idc, 1), F.lit(10007)) / 10007.0
    site = F.floor(u * u * 100).cast("long")
    url = F.format_string("https://site%d.example/page/%d", site, F.col("id"))
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                        (F.pmod(idc * 31, F.lit(5)) + 1).cast("int"))
    filler1 = F.format_string("the quick w%d fox jumps over lazy w%d dog",
                              F.pmod(_mix_expr(idc, 71), F.lit(50)),
                              F.pmod(_mix_expr(idc, 73), F.lit(50)))
    filler2 = F.format_string("chapter w%d verse w%d",
                              F.pmod(_mix_expr(idc, 79), F.lit(50)),
                              F.pmod(_mix_expr(idc, 83), F.lit(50)))
    anchors = [_anchor_expr(idc, j) for j in range(5)]
    text = F.concat_ws(" ", filler1, *anchors, filler2)
    # collapse the double spaces left by empty anchor slots, exactly like
    # the pandas reference (concat_ws skips NULLs but not empty strings)
    text = F.regexp_replace(text, " +", " ")
    html = F.encode(F.concat(F.lit("<html><body>"), text,
                             F.lit("</body></html>")), "UTF-8")
    ts = F.timestamp_seconds(F.lit(EPOCH_2024) + F.col("id") * 13)
    return df.select(url.alias("url"), ts.alias("warc_ts"),
                     html.alias("html"), text.alias("text"),
                     lang.alias("lang"))


def pages_pandas(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Pure-python reference generator — byte-identical to pages_df."""
    rows = []
    for i in range(n_rows):
        idv = i + seed
        u = _mix_py(idv, 1) % 10007 / 10007.0
        site = int(u * u * 100)
        url = f"https://site{site}.example/page/{i}"
        lang = LANGS[(idv * 31) % 5]
        f1 = (f"the quick w{_mix_py(idv, 71) % 50} fox jumps over lazy "
              f"w{_mix_py(idv, 73) % 50} dog")
        f2 = f"chapter w{_mix_py(idv, 79) % 50} verse w{_mix_py(idv, 83) % 50}"
        toks = []
        n_anchors = idv % 6
        for j in range(5):
            if j >= n_anchors:
                toks.append("")
                continue
            r = _mix_py(idv, j)
            if (idv + j) % 997 == 0:
                lon, lat = 180.0, 89.9
                proj = False
            else:
                proj = _mix_py(idv, j + 53) % 10 == 9
                hot = r % 10 < 8
                if hot:
                    lon_c, lat_c = CITIES[r % 20]
                    lon = lon_c + ((_mix_py(idv, j + 11) % 2001) - 1000) / 1000.0 * 0.3
                    lat = lat_c + ((_mix_py(idv, j + 23) % 2001) - 1000) / 1000.0 * 0.3
                else:
                    lon = (_mix_py(idv, j + 37) % 360000) / 1000.0 - 180.0
                    lat = (_mix_py(idv, j + 41) % 170000) / 1000.0 - 85.0
            if proj:
                x = 200000.0 + _mix_py(idv, j + 61) % 600001
                y = 4000000.0 + _mix_py(idv, j + 67) % 600001
                toks.append(f"@geo({x:.2f},{y:.2f},EPSG:2100)")
            else:
                toks.append(f"@geo({lon:.4f},{lat:.4f})")
        import re
        text = re.sub(" +", " ", " ".join([f1, *toks, f2]))
        html = f"<html><body>{text}</body></html>".encode()
        ts = pd.Timestamp(EPOCH_2024 + i * 13, unit="s", tz="UTC")
        rows.append((url, ts, html, text, lang))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                       "lang"])
