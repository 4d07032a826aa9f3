"""hreflang alternate-link extraction: attribute spacing, self-closing
tags, regional codes, pages with no alternates, and tags that must NOT
match (stylesheet links, alternate without hreflang)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pyproj_spark.functions.web import hreflang_links

CASES = [
    ('<link rel="alternate" hreflang="en" href="http://e/en">',
     [("en", "http://e/en")]),
    # self-closing + regional code + extra whitespace
    ('<link rel="alternate"  hreflang="de-AT"  href="http://e/at" />',
     [("de-AT", "http://e/at")]),
    # several on one page, order preserved
    ('<link rel="alternate" hreflang="en" href="http://e/en">'
     '<link rel="alternate" hreflang="x-default" href="http://e/">',
     [("en", "http://e/en"), ("x-default", "http://e/")]),
    # must NOT match: stylesheet link, alternate without hreflang
    ('<link rel="stylesheet" href="s.css">'
     '<link rel="alternate" type="application/rss+xml" href="f.xml">',
     []),
    ("<html>no links</html>", []),
]


def test_hreflang_extraction(spark):
    pdf = pd.DataFrame({"i": range(len(CASES)),
                        "html": [c[0] for c in CASES]})
    rows = (spark.createDataFrame(pdf)
            .select("i", hreflang_links(F.col("html")).alias("l"))
            .toPandas().sort_values("i"))
    for i, (_, exp) in enumerate(CASES):
        got = [(e["hreflang"], e["href"])
               for e in rows[rows["i"] == i].iloc[0]["l"]]
        assert got == exp, (i, got, exp)


def test_hreflang_native(spark):
    df = spark.range(2).select(
        hreflang_links(F.lit("<html/>")).alias("l"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
