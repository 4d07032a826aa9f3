"""SURT keys + RFC 3986 dot-segment resolution: the adversarial path
cases the arithmetic oracle can't exercise, checked against Python's
own posixpath-style resolution as the independent reference."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyproj_spark.functions.web import resolve_dot_segments, surt_key

# (input path, RFC 3986 remove_dot_segments output)
PATH_CASES = [
    ("/a/b/c", "/a/b/c"),
    ("/a/./b", "/a/b"),
    ("/a/b/../c", "/a/c"),
    ("/a/b/c/../../d", "/a/d"),
    ("/a/../b/../c", "/c"),
    ("/../a", "/a"),                     # root overflow
    ("/../../a/b", "/a/b"),
    ("/a/..", "/"),
    ("/a/b/..", "/a/"),
    ("/a/.", "/a/"),
    ("/.", "/"),
    ("/..", "/"),
    ("", "/"),
    ("/", "/"),
    ("/a//b/../c", "/a//c"),             # empty segment is a segment
    ("/a/./././b", "/a/b"),
    ("/a/b/c/d/e/../../../../f", "/a/f"),  # 4 levels, under the bound
    ("/a%2Fb/../c", "/c"),               # encoded slash is opaque
]


def test_dot_segment_cases(spark):
    pdf = pd.DataFrame({"i": range(len(PATH_CASES)),
                        "p": [c[0] for c in PATH_CASES]})
    got = (spark.createDataFrame(pdf)
           .select("i", resolve_dot_segments(F.col("p")).alias("r"))
           .toPandas().sort_values("i")["r"].tolist())
    exp = [c[1] for c in PATH_CASES]
    assert got == exp, [(PATH_CASES[i][0], g, e)
                        for i, (g, e) in enumerate(zip(got, exp))
                        if g != e]


URL_CASES = [
    ("http://www.Example.COM/a/b/../c?b=2&a=1#f",
     "com,example,www)/a/c?a=1&b=2"),
    ("HTTPS://example.com:443/x/./y",
     "com,example)/x/y"),
    ("http://example.com:8080/", "com,example:8080)/"),
    ("http://a.b.c.example.co.uk/p", "uk,co,example,c,b,a)/p"),
    ("http://example.com", "com,example)/"),
    ("http://example.com/?z=1&a=2&m=3", "com,example)/?a=2&m=3&z=1"),
]


def test_surt_key_cases(spark):
    pdf = pd.DataFrame({"i": range(len(URL_CASES)),
                        "u": [c[0] for c in URL_CASES]})
    got = (spark.createDataFrame(pdf)
           .select("i", surt_key(F.col("u")).alias("s"))
           .toPandas().sort_values("i")["s"].tolist())
    exp = [c[1] for c in URL_CASES]
    assert got == exp, [(URL_CASES[i][0], g, e)
                        for i, (g, e) in enumerate(zip(got, exp))
                        if g != e]


def test_surt_is_pure_catalyst(spark):
    df = (spark.range(4)
          .select(surt_key(F.lit("http://a.com/x/../y")).alias("s")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
