"""The plan linter (plans/lint.py) must flag the anti-patterns the
engine itself avoids, and stay silent on the engine's own gated
queries — lint findings double as a regression lock for the whole
flagship path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyproj_spark.plans.lint import Finding, assert_clean, lint_plan

SF = "/root/testdata/sf0.01"


def test_flags_cartesian_product(spark):
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    a = spark.range(100).toDF("a")
    b = spark.range(100).toDF("b")
    finds = lint_plan(a.crossJoin(b).filter("a + b > 10"))
    assert any(f.rule == "cartesian-product" for f in finds)


def test_flags_global_window(spark):
    from pyspark.sql import Window
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    finds = lint_plan(df)
    assert any(f.rule == "global-sort-window" and f.severity == "error"
               for f in finds)


def test_flags_row_python_udf(spark):
    from pyspark.sql.types import LongType
    bad = F.udf(lambda x: x + 1, LongType())
    df = spark.range(100).select(bad("id").alias("y"))
    finds = lint_plan(df)
    assert any(f.rule == "row-python-udf" for f in finds)
    with pytest.raises(AssertionError):
        assert_clean(df)


def test_silent_on_keyed_window(spark):
    from pyspark.sql import Window
    df = spark.range(100).withColumn("k", F.col("id") % 7).withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("k").orderBy("id")))
    assert not [f for f in lint_plan(df)
                if f.rule == "global-sort-window"]


def test_flagship_queries_are_clean(spark):
    # the engine's own headline paths must lint clean (the viewshed
    # broadcast-observer cross join is severity info, not error)
    from pyproj_spark.queries import (q_geocell, q_hillshade, q_pip,
                                      q_viewshed, q_webmerc_transform)
    for q in (q_webmerc_transform, q_geocell, q_pip, q_hillshade,
              q_viewshed):
        assert_clean(q(spark, SF))


def test_finding_shape():
    f = Finding("x", "error", "d")
    assert (f.rule, f.severity, f.detail) == ("x", "error", "d")
