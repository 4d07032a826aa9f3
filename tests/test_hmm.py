"""Viterbi map-matching (operators/hmm.py): exhaustive-optimality,
path coherence, and degeneration-to-snap properties."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyproj_spark.operators.hmm import (LAMBDA, emission_costs,
                                        viterbi_match)

SEGS = [(0, 0.0, 0.0, 10.0, 0.0),
        (1, 0.0, 1.0, 10.0, 1.0),
        (2, 5.0, -5.0, 5.0, 5.0)]
SEG_SCHEMA = "seg_id int, ax double, ay double, bx double, by double"


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "traj_id long, step long, lon double, lat double")


def _cost(em, path, lam):
    c = sum(em[(k, s)] for k, s in enumerate(path))
    c += lam * sum(1 for a, b in zip(path, path[1:]) if a != b)
    return c


class TestViterbi:
    def test_exhaustively_optimal(self, spark):
        rng = np.random.default_rng(3)
        rows = [(int(t), int(k), float(x), float(y))
                for t in range(6) for (k, x, y) in
                [(k, rng.uniform(0, 10), rng.uniform(-2, 2))
                 for k in range(5)]]
        pts = _pts(spark, rows)
        segs = spark.createDataFrame(SEGS, SEG_SCHEMA)
        got = {(r.traj_id, r.step): r.seg_id
               for r in viterbi_match(pts, segs).collect()}
        em = {(r.traj_id, r.step, r.seg_id): r.em
              for r in emission_costs(pts, segs).collect()}
        for t in range(6):
            e = {(k, s): em[(t, k, s)] for k in range(5)
                 for s in (0, 1, 2)}
            best = min(
                itertools.product((0, 1, 2), repeat=5),
                key=lambda p: (_cost(e, p, LAMBDA), p))
            path = tuple(got[(t, k)] for k in range(5))
            assert _cost(e, path, LAMBDA) == _cost(e, best, LAMBDA)
            assert path == best  # tie-break contract too

    def test_huge_lambda_picks_single_best_segment(self, spark):
        rng = np.random.default_rng(5)
        rows = [(0, k, float(rng.uniform(0, 10)),
                 float(rng.uniform(-2, 2))) for k in range(8)]
        pts = _pts(spark, rows)
        segs = spark.createDataFrame(SEGS, SEG_SCHEMA)
        got = [r.seg_id for r in
               viterbi_match(pts, segs, lam=10**15)
               .orderBy("step").collect()]
        em = {(r.step, r.seg_id): r.em
              for r in emission_costs(pts, segs).collect()}
        totals = {s: sum(em[(k, s)] for k in range(8))
                  for s in (0, 1, 2)}
        stay = min(totals, key=lambda s: (totals[s], s))
        assert got == [stay] * 8

    def test_zero_lambda_degenerates_to_snap(self, spark):
        rng = np.random.default_rng(9)
        rows = [(0, k, float(rng.uniform(0, 10)),
                 float(rng.uniform(-2, 2))) for k in range(8)]
        pts = _pts(spark, rows)
        segs = spark.createDataFrame(SEGS, SEG_SCHEMA)
        got = [r.seg_id for r in viterbi_match(pts, segs, lam=0)
               .orderBy("step").collect()]
        em = {(r.step, r.seg_id): r.em
              for r in emission_costs(pts, segs).collect()}
        snap = [min((0, 1, 2), key=lambda s: (em[(k, s)], s))
                for k in range(8)]
        assert got == snap

    def test_smooths_single_noisy_point(self, spark):
        # 7 points hugging segment 0, one outlier nearer segment 1:
        # Viterbi keeps the route, per-point snap does not
        rows = [(0, k, 1.0 + k, 0.05) for k in range(8)]
        # closer to segment 1 (y=1) but not by enough to pay two
        # switch penalties (saves 0.2 deg^2 < 2*LAMBDA units)
        rows[4] = (0, 4, 5.0, 0.6)
        pts = _pts(spark, rows)
        segs = spark.createDataFrame(SEGS[:2], SEG_SCHEMA)
        got = [r.seg_id for r in viterbi_match(pts, segs)
               .orderBy("step").collect()]
        assert got == [0] * 8
        em = {(r.step, r.seg_id): r.em
              for r in emission_costs(pts, segs).collect()}
        assert em[(4, 1)] < em[(4, 0)]  # snap would have flipped


class TestColocate:
    """operators/colocation.py — 3x3-cell bucketed contact join."""

    def test_matches_brute_force(self, spark):
        import itertools
        import numpy as np
        from pyproj_spark.operators.colocation import colocate
        rng = np.random.default_rng(13)
        rows = []
        for i in range(600):
            rows.append((int(i % 25),
                         1704067200 + int(rng.integers(0, 6 * 3600)),
                         float(rng.uniform(0, 5)),
                         float(rng.uniform(0, 5))))
        df = spark.createDataFrame(
            rows, "user_id long, es long, lon double, lat double"
        ).select("user_id", F.timestamp_seconds("es").alias("ts"),
                 "lon", "lat")
        r = 0.7
        got = {(x.u1, x.u2): (x.n_contacts, x.first_wnd)
               for x in colocate(df, radius_deg=r).collect()}
        brute = {}
        for a, b in itertools.combinations(rows, 2):
            (ua, ta, xa, ya), (ub, tb, xb, yb) = a, b
            if ua == ub or ta // 3600 != tb // 3600:
                continue
            if (xa - xb) ** 2 + (ya - yb) ** 2 >= r * r:
                continue
            k = (min(ua, ub), max(ua, ub))
            n, w = brute.get(k, (0, 1 << 62))
            brute[k] = (n + 1, min(w, ta // 3600))
        assert got == brute
        assert len(got) > 10  # fixture is non-trivial

    def test_pairs_cross_cell_boundaries(self, spark):
        # two users straddling a cell edge are still found (the 3x3
        # expansion's whole purpose)
        from pyproj_spark.operators.colocation import colocate
        df = spark.createDataFrame(
            [(1, 1704067200, 0.99, 0.5), (2, 1704067300, 1.01, 0.5),
             (3, 1704067200, 3.0, 3.0)],
            "user_id long, es long, lon double, lat double"
        ).select("user_id", F.timestamp_seconds("es").alias("ts"),
                 "lon", "lat")
        got = colocate(df, radius_deg=1.0).collect()
        assert [(r.u1, r.u2) for r in got] == [(1, 2)]
