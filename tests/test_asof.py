"""As-of join semantics (operators/asof.py) vs hand-computed goldens
and pandas.merge_asof as an independent reference implementation."""

import datetime as dt

import pandas as pd
import pytest

from pyproj_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (1, _ts(5), "c"),
         (2, _ts(10), "d"), (3, _ts(10), "e")],
        "k long, ts timestamp_ntz, who string")
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (2, _ts(12), 200.0)],
        "k long, ts timestamp_ntz, v double")
    return left, right


def test_backward_inclusive(frames):
    left, right = frames
    out = {r.who: r.r_v for r in asof_join(left, right, on="k").collect()}
    # equal-ts right row matches (inclusive), later rows see the newest
    assert out == {"a": 100.0, "b": 150.0, "c": None,
                   "d": None, "e": None}


def test_forward(frames):
    left, right = frames
    out = {r.who: r.r_v
           for r in asof_join(left, right, on="k",
                              direction="forward").collect()}
    assert out == {"a": 100.0, "b": None, "c": 100.0,
                   "d": 200.0, "e": None}


def test_tolerance(frames):
    left, right = frames
    out = {r.who: r.r_v
           for r in asof_join(left, right, on="k",
                              tolerance_us=5_000_000).collect()}
    # "b" at t=20 is 5s after the t=15 view: inside an inclusive 5s cap
    assert out == {"a": 100.0, "b": 150.0, "c": None,
                   "d": None, "e": None}
    out2 = {r.who: r.r_v
            for r in asof_join(left, right, on="k",
                               tolerance_us=4_999_999).collect()}
    assert out2["b"] is None


def test_matches_pandas_merge_asof(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    lt = pd.DataFrame({
        "k": rng.randint(0, 5, 200),
        "ts": pd.to_datetime(rng.randint(0, 10**6, 200), unit="s"),
        "lid": np.arange(200)})
    rt = pd.DataFrame({
        "k": rng.randint(0, 5, 150),
        "ts": pd.to_datetime(rng.randint(0, 10**6, 150), unit="s"),
        "rid": np.arange(150) + 1000})
    # merge_asof precondition == ours: unique (k, ts) on the right
    rt = rt.drop_duplicates(["k", "ts"], keep="last")
    got = (asof_join(
        spark.createDataFrame(lt, "k long, ts timestamp_ntz, lid long"),
        spark.createDataFrame(rt, "k long, ts timestamp_ntz, rid long"),
        on="k").toPandas()
        .sort_values("lid").reset_index(drop=True))
    want = pd.merge_asof(lt.sort_values("ts"), rt.sort_values("ts"),
                         on="ts", by="k", direction="backward") \
        .sort_values("lid").reset_index(drop=True)
    assert (got["r_rid"].astype("Int64").fillna(-1)
            == want["rid"].astype("Int64").fillna(-1)).all()


def test_single_shuffle_plan(frames):
    left, right = frames
    plan = asof_join(left, right, on="k") \
        ._jdf.queryExecution().executedPlan().toString()
    # union + window: exactly one exchange pair (left/right hash-
    # partitioned into the same window), never a join
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
