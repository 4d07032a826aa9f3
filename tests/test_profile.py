"""Table profiling (operators/profile.py)."""

import math

from pyproj_spark.operators.profile import profile_table


def test_profile_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, None, 4.0), (3, "b", None), (4, "a", 8.0)],
        "id long, s string, v double")
    rows = {r.column: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    r = rows["s"]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (4, 1, 2)
    assert (r.min_s, r.max_s) == ("a", "b")
    assert r.mean_num is None and r.mean_len == 1.0
    r = rows["v"]
    assert (r.n_nulls, r.n_distinct) == (1, 3)
    assert r.mean_num == round((2 + 4 + 8) / 3, 4)
    assert r.mean_len is None
    r = rows["id"]
    assert (r.n_nulls, r.n_distinct, r.min_s, r.max_s) \
        == (0, 4, "1", "4")


def test_profile_single_scan(spark):
    df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s",
                                     "id * 1.5 AS v")
    plan = profile_table(df)._jdf.queryExecution() \
        .executedPlan().toString()
    # multi-count-distinct lowers to ONE Expand, not per-column scans
    assert plan.count("Expand") >= 1
