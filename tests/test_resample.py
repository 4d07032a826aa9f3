"""Trajectory resampling invariants (operators/lines.py::resample_tracks)."""

from pyspark.sql import functions as F  # noqa: F401


def _run(spark, rows, step=10_000_000):
    from pyproj_spark.operators.lines import resample_tracks
    df = spark.createDataFrame(
        rows, "user_id long, seq long, t_us long, lon double, lat double")
    return sorted(
        resample_tracks(df, step_us=step, tiebreak_col="seq").collect(),
        key=lambda r: (r.user_id, r.g_us))


def test_linear_interpolation_exact(spark):
    # one segment 0 -> 40s, lon 0 -> 4: grid every 10s lands at exact
    # quarter points; grid instant at t1 itself is NOT emitted (open
    # left end), the one at t2 IS (closed right end)
    rows = [(1, 0, 0, 0.0, 10.0), (1, 1, 40_000_000, 4.0, 10.0)]
    out = _run(spark, rows)
    assert [(r.g_us, r.lon_g, r.lat_g) for r in out] == [
        (10_000_000, 1.0, 10.0), (20_000_000, 2.0, 10.0),
        (30_000_000, 3.0, 10.0), (40_000_000, 4.0, 10.0)]


def test_no_duplicate_grid_instants_across_segments(spark):
    # three chained pings whose middle ping sits exactly ON a grid
    # instant: the instant belongs to the earlier segment's (t1, t2]
    # and must appear exactly once
    rows = [(2, 0, 5_000_000, 0.0, 0.0),
            (2, 1, 20_000_000, 3.0, 0.0),
            (2, 2, 35_000_000, 6.0, 0.0)]
    out = _run(spark, rows)
    gs = [r.g_us for r in out]
    assert gs == sorted(set(gs)) == [10_000_000, 20_000_000, 30_000_000]


def test_duplicate_timestamps_skip_zero_gap(spark):
    # tied timestamps: zero-length segment emits nothing; surrounding
    # segments chain deterministically through the seq tiebreak
    rows = [(3, 0, 0, 0.0, 0.0), (3, 1, 15_000_000, 1.0, 0.0),
            (3, 2, 15_000_000, 9.0, 0.0), (3, 3, 30_000_000, 10.0, 0.0)]
    out = _run(spark, rows)
    by_g = {r.g_us: r.lon_g for r in out}
    # 10s sits in (0, 15]s interpolating 0 -> 1; 20s and 30s sit in
    # (15, 30]s interpolating 9 -> 10 (seq=2 is the later tie)
    assert by_g[10_000_000] == 1.0 * (10 / 15)
    assert by_g[20_000_000] == 9.0 + 1.0 * (5 / 15)
    assert by_g[30_000_000] == 10.0
