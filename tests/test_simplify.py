"""Douglas-Peucker simplification invariants."""

import numpy as np


def _run(spark, rows, eps):
    from pyproj_spark.operators.lines import simplify_lines
    df = spark.createDataFrame(rows, "user_id long, seq long, "
                               "x double, y double")
    return simplify_lines(df, eps=eps).collect()


def test_dp_straight_line_keeps_endpoints_only(spark):
    rows = [(1, i, i * 10.0, i * 5.0) for i in range(20)]
    out = sorted(r.seq for r in _run(spark, rows, eps=1.0))
    assert out == [0, 19]


def test_dp_deviation_bound_and_endpoints(spark):
    rng = np.random.RandomState(7)
    ys = np.cumsum(rng.randn(40)) * 20.0
    rows = [(1, i, i * 100.0, float(ys[i])) for i in range(40)]
    eps = 25.0
    kept = sorted(r.seq for r in _run(spark, rows, eps=eps))
    assert kept[0] == 0 and kept[-1] == 39
    # every dropped vertex lies within eps of its simplified chord
    pts = {i: (i * 100.0, float(ys[i])) for i in range(40)}
    for a, b in zip(kept, kept[1:]):
        ax, ay = pts[a]
        bx, by = pts[b]
        for j in range(a + 1, b):
            px, py = pts[j]
            d = (abs((bx - ax) * (ay - py) - (ax - px) * (by - ay))
                 / np.hypot(bx - ax, by - ay))
            assert d <= eps + 1e-9, (a, j, b, d)


def test_dp_idempotent(spark):
    rng = np.random.RandomState(3)
    ys = np.cumsum(rng.randn(30)) * 30.0
    rows = [(5, i, i * 50.0, float(ys[i])) for i in range(30)]
    kept = sorted(r.seq for r in _run(spark, rows, eps=20.0))
    rows2 = [(5, s, s * 50.0, float(ys[s])) for s in kept]
    kept2 = sorted(r.seq for r in _run(spark, rows2, eps=20.0))
    assert kept2 == kept


def test_dp_spike_is_kept(spark):
    rows = [(2, i, i * 10.0, 0.0 if i != 7 else 500.0)
            for i in range(15)]
    kept = sorted(r.seq for r in _run(spark, rows, eps=5.0))
    assert 7 in kept


def test_vw_filter_endpoints_and_threshold(spark):
    """One-pass Visvalingam screen: both endpoints survive, every
    surviving interior vertex clears the area threshold, and every
    dropped vertex is below it (recomputed brute-force)."""
    from pyproj_spark.queries import q_vw_filter
    sf = "/root/testdata/sf0.001"
    kept = {}
    for r in q_vw_filter(spark, sf).collect():
        kept.setdefault(r.user_id, {})[r.seq] = (r.x, r.y, r.eff2)
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from pyproj_spark.queries import _t
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = (ev.withColumn("seq", F.row_number().over(w))
           .filter(F.col("seq") <= 33)
           .select("user_id", "seq",
                   (F.col("seq") * 1000).alias("x"),
                   (F.col("event_id") * 7919 % 100000).alias("y"))
           .collect())
    tracks = {}
    for r in pts:
        tracks.setdefault(r.user_id, {})[r.seq] = (int(r.x), int(r.y))
    for u, t in tracks.items():
        seqs = sorted(t)
        assert seqs[0] in kept[u] and seqs[-1] in kept[u], u
        for i in range(1, len(seqs) - 1):
            x0, y0 = t[seqs[i - 1]]
            x, y = t[seqs[i]]
            x2, y2 = t[seqs[i + 1]]
            a2 = abs((x - x0) * (y2 - y0) - (x2 - x0) * (y - y0))
            assert (seqs[i] in kept[u]) == (a2 >= 2000000), (u, seqs[i])
            if seqs[i] in kept[u]:
                assert kept[u][seqs[i]][2] == a2
