"""URL functions (functions/web.py) — edge cases beyond the
url_domains oracle query: default http port, bare-host URLs,
two-label hosts, empty paths, duplicate query keys."""

import pytest

from pyspark.sql import functions as F

from pyproj_spark.functions import web


CASES = [
    # (url, canonical, registered_domain, depth)
    ("HTTP://Example.COM:80/x?b=2&a=1#f",
     "http://example.com/x?a=1&b=2", "example.com", 1),
    ("https://example.com:443/", "https://example.com/",
     "example.com", 0),
    ("https://a.b.co.uk:8080", "https://a.b.co.uk:8080/",
     "b.co.uk", 0),
    ("https://www.news.example.org/a/b/c",
     "https://www.news.example.org/a/b/c", "example.org", 3),
    ("http://localhost/x", "http://localhost/x", "localhost", 1),
    ("https://site.net.au/p?z=1&z=0",
     "https://site.net.au/p?z=0&z=1", "site.net.au", 1),
]


def test_url_functions(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    p = web.url_parts(F.col("url"))
    out = df.select(
        "url",
        web.canonical_url(F.col("url")).alias("canonical"),
        web.registered_domain(p["host"]).alias("rdom"),
        web.path_depth(p["path"]).alias("depth"),
    ).collect()
    got = {r["url"]: r for r in out}
    for url, canonical, rdom, depth in CASES:
        r = got[url]
        assert r["canonical"] == canonical, url
        assert r["rdom"] == rdom, url
        assert r["depth"] == depth, url


def test_url_parts_struct(spark):
    df = spark.createDataFrame(
        [("https://h.example:9090/p/q?x=1#frag",)], "url string")
    r = df.select(web.url_parts(F.col("url")).alias("p")).collect()[0]["p"]
    assert r["scheme"] == "https"
    assert r["host"] == "h.example"
    assert r["port"] == "9090"
    assert r["path"] == "/p/q"
    assert r["query"] == "x=1"
    assert r["fragment"] == "frag"


def test_no_udf_in_plan(spark):
    # the whole module must stay native Catalyst (codegen-friendly)
    df = spark.range(4).select(
        F.concat(F.lit("https://s"), F.col("id").cast("string"),
                 F.lit(".example/x")).alias("url"))
    plan = df.select(web.canonical_url(F.col("url"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_geohash_known_vectors(spark):
    """Canonical public geohash vectors (Niemeyer spec examples) +
    plan hygiene: the whole encode/decode stays native Catalyst."""
    from pyproj_spark.functions.geohash import (
        geohash_decode, geohash_encode,
    )
    df = spark.createDataFrame(
        [(-5.603, 42.605), (10.40744, 57.64911), (0.0, 0.0),
         (-180.0, -90.0)], "lon double, lat double")
    out = df.select(
        "lon", "lat",
        geohash_encode(F.col("lon"), F.col("lat"), 5).alias("g5"),
        geohash_encode(F.col("lon"), F.col("lat"), 11).alias("g11"))
    got = {(r["lon"], r["lat"]): r for r in out.collect()}
    assert got[(-5.603, 42.605)]["g5"] == "ezs42"
    assert got[(10.40744, 57.64911)]["g11"] == "u4pruydqqvj"
    assert got[(0.0, 0.0)]["g5"] == "s0000"
    assert got[(-180.0, -90.0)]["g5"] == "00000"
    # decode returns the cell center: within half a cell of the input
    rt = df.select(
        "lon", "lat",
        geohash_decode(geohash_encode(F.col("lon"), F.col("lat"), 8),
                       8).alias("c")).collect()
    for r in rt:
        assert abs(r["c"]["lon"] - r["lon"]) <= 360.0 / 2 ** 20
        assert abs(r["c"]["lat"] - r["lat"]) <= 180.0 / 2 ** 20
    plan = df.select(
        geohash_encode(F.col("lon"), F.col("lat"), 6)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
