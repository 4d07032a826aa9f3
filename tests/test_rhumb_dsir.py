"""Property tests for rhumb-line navigation (functions/rhumb.py) and
DSIR importance resampling (operators/dsir.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyproj_spark.functions.rhumb import (R_MEAN, rhumb_destination,
                                          rhumb_inverse)


def _inv(spark, pts):
    df = spark.createDataFrame(pts, "lon1 double, lat1 double, "
                                    "lon2 double, lat2 double")
    r = df.select(rhumb_inverse(F.col("lon1"), F.col("lat1"),
                                F.col("lon2"), F.col("lat2")).alias("r"))
    return [(x.r.bearing_deg, x.r.dist_m) for x in r.collect()]


class TestRhumbInverse:
    def test_due_east_is_parallel_arc(self, spark):
        # along a parallel the rhumb IS the parallel: bearing 90,
        # length R*cos(phi)*dlam exactly
        [(brg, d)] = _inv(spark, [(10.0, 40.0, 30.0, 40.0)])
        assert brg == pytest.approx(90.0, abs=1e-9)
        assert d == pytest.approx(
            R_MEAN * math.cos(math.radians(40.0)) * math.radians(20.0),
            rel=1e-12)

    def test_due_north_is_meridian_arc(self, spark):
        [(brg, d)] = _inv(spark, [(10.0, 10.0, 10.0, 50.0)])
        assert brg == pytest.approx(0.0, abs=1e-9)
        assert d == pytest.approx(R_MEAN * math.radians(40.0), rel=1e-12)

    def test_antimeridian_wrap_goes_short_way(self, spark):
        # 170E -> 170W is 20 degrees east across the antimeridian,
        # not 340 degrees west
        [(brg, d)] = _inv(spark, [(170.0, 0.0, -170.0, 0.0)])
        assert brg == pytest.approx(90.0, abs=1e-9)
        assert d == pytest.approx(R_MEAN * math.radians(20.0), rel=1e-12)

    def test_formulary_example_lax_jfk(self, spark):
        # Williams Aviation Formulary worked example: LAX->JFK rhumb
        # course ~79.3 deg, distance ~2164.6 nm (sphere)
        lax = (-118.407222, 33.95)
        jfk = (-73.778889, 40.633333)
        [(brg, d)] = _inv(spark, [(lax[0], lax[1], jfk[0], jfk[1])])
        assert brg == pytest.approx(79.32, abs=0.05)
        assert d / 1852.0 == pytest.approx(2164.6, abs=2.0)

    def test_rhumb_never_shorter_than_great_circle(self, spark):
        rng = np.random.default_rng(7)
        pts = [(float(a), float(b), float(c), float(d))
               for a, b, c, d in zip(rng.uniform(-179, 179, 50),
                                     rng.uniform(-80, 80, 50),
                                     rng.uniform(-179, 179, 50),
                                     rng.uniform(-80, 80, 50))]
        out = _inv(spark, pts)
        for (lon1, lat1, lon2, lat2), (_, d) in zip(pts, out):
            la1, la2 = math.radians(lat1), math.radians(lat2)
            dl = math.radians(lon2 - lon1)
            gc = R_MEAN * math.acos(max(-1.0, min(1.0,
                math.sin(la1) * math.sin(la2)
                + math.cos(la1) * math.cos(la2) * math.cos(dl))))
            assert d >= gc - 1e-6


class TestRhumbDirect:
    def test_roundtrip_inverse_of_destination(self, spark):
        rng = np.random.default_rng(11)
        rows = [(float(lo), float(la), float(b), float(dd))
                for lo, la, b, dd in zip(rng.uniform(-179, 179, 100),
                                         rng.uniform(-70, 70, 100),
                                         rng.uniform(0.5, 359.5, 100),
                                         rng.uniform(1e3, 3e6, 100))]
        df = spark.createDataFrame(
            rows, "lon double, lat double, brg double, d double")
        dest = rhumb_destination(F.col("lon"), F.col("lat"),
                                 F.col("brg"), F.col("d"))
        back = df.select(
            "brg", "d",
            rhumb_inverse(F.col("lon"), F.col("lat"),
                          dest["lon"], dest["lat"]).alias("r"))
        for x in back.collect():
            assert x.r.bearing_deg == pytest.approx(x.brg, abs=1e-6)
            assert x.r.dist_m == pytest.approx(x.d, rel=1e-9)

    def test_constant_bearing_along_track(self, spark):
        # the defining property: the course from any waypoint to the
        # endpoint is the SAME constant bearing
        lon1, lat1, brg, d = 5.0, 20.0, 63.0, 4.0e6
        df = spark.range(1, 10).select(
            (F.col("id") * (d / 10.0)).alias("s"))
        wp = rhumb_destination(F.lit(lon1), F.lit(lat1),
                               F.lit(brg), F.col("s"))
        end = rhumb_destination(F.lit(lon1), F.lit(lat1),
                                F.lit(brg), F.lit(d))
        r = df.select(rhumb_inverse(wp["lon"], wp["lat"],
                                    end["lon"], end["lat"]).alias("r"))
        for x in r.collect():
            assert x.r.bearing_deg == pytest.approx(brg, abs=1e-7)


class TestDSIR:
    def _docs(self, spark):
        rows = []
        for i in range(400):
            if i % 4 == 0:  # target-looking docs
                txt = "alpha beta gamma " * 5
                lang = "en"
            elif i % 4 == 1:
                txt = "delta epsilon zeta " * 5
                lang = "de"
            else:
                txt = ("alpha beta gamma " if i % 8 < 4
                       else "rho sigma tau ") * 5
                lang = "fr"
            rows.append((i, txt, lang))
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string")

    def test_weights_enriched_toward_target(self, spark):
        from pyproj_spark.operators.dsir import (bucket_log_ratios,
                                                 dsir_weights)
        docs = self._docs(spark)
        ratios = bucket_log_ratios(docs, F.col("lang") == "en")
        w = {r.doc_id: r.w_micros
             for r in dsir_weights(docs, ratios).collect()}
        # docs sharing the target's vocabulary outweigh disjoint ones
        assert w[2] > w[1]   # 'alpha beta gamma' fr vs 'delta...' de
        assert w[0] > w[1]

    def test_partition_invariance(self, spark):
        from pyproj_spark.operators.dsir import (bucket_log_ratios,
                                                 dsir_weights,
                                                 gumbel_topk)
        docs = self._docs(spark)

        def run(d):
            ratios = bucket_log_ratios(d, F.col("lang") == "en")
            sel = gumbel_topk(dsir_weights(d, ratios), 50)
            return sorted((r.doc_id, r.w_micros) for r in sel.collect())

        assert run(docs.repartition(1)) == run(docs.repartition(17))

    def test_sample_is_importance_biased(self, spark):
        from pyproj_spark.operators.dsir import (bucket_log_ratios,
                                                 dsir_weights,
                                                 gumbel_topk)
        docs = self._docs(spark)
        ratios = bucket_log_ratios(docs, F.col("lang") == "en")
        w = dsir_weights(docs, ratios)
        sel = gumbel_topk(w, 100).collect()
        frac_target_like = np.mean(
            [1.0 if r.w_micros > 0 else 0.0 for r in sel])
        all_frac = np.mean(
            [1.0 if r.w_micros > 0 else 0.0 for r in w.collect()])
        assert frac_target_like > all_frac


class TestGreatCircleIntersection:
    """gc_intersect gate's geometry, validated against an independent
    numpy formulation (densified arc sign-change count)."""

    def _spark_pairs(self, spark):
        import pandas as pd
        from pyproj_spark.queries import QUERIES
        df = QUERIES["gc_intersect"][0](
            spark, "/root/testdata/sf0.001").toPandas()
        return df

    def test_intersections_lie_on_both_arcs(self, spark):
        import math
        from pyproj_spark.queries import GC_ROUTES, _doc_points
        df = self._spark_pairs(spark)
        pts = {r.doc_id: (r.lon, r.lat) for r in _doc_points(
            spark, "/root/testdata/sf0.001").collect()}

        def uv(lon, lat):
            lo, la = math.radians(lon), math.radians(lat)
            return np.array([math.cos(la) * math.cos(lo),
                             math.cos(la) * math.sin(lo),
                             math.sin(la)])

        for _, row in df.iterrows():
            p1 = uv(*pts[row.doc_id])
            lon2 = (row.doc_id * 12553 % 360000) / 1000.0 - 180.0
            lat2 = (row.doc_id * 24001 % 170000) / 1000.0 - 85.0
            p2 = uv(lon2, lat2)
            a, b, c, d = GC_ROUTES[row.route_id]
            q1, q2 = uv(a, b), uv(c, d)
            x = uv(row.ix_lon, row.ix_lat)
            # on both planes
            assert abs(np.dot(np.cross(p1, p2), x)) < 1e-9
            assert abs(np.dot(np.cross(q1, q2), x)) < 1e-9
            # within both angular spans: x between the endpoints
            for e1, e2 in ((p1, p2), (q1, q2)):
                full = math.acos(np.clip(np.dot(e1, e2), -1, 1))
                part = (math.acos(np.clip(np.dot(e1, x), -1, 1))
                        + math.acos(np.clip(np.dot(x, e2), -1, 1)))
                assert part == pytest.approx(full, abs=1e-9)

    def test_count_matches_densified_signchange(self, spark):
        import math
        from pyproj_spark.queries import GC_ROUTES, _doc_points
        df = self._spark_pairs(spark)
        got = set(zip(df.doc_id, df.route_id))
        pts = _doc_points(spark, "/root/testdata/sf0.001").collect()

        def uv(lon, lat):
            lo, la = math.radians(lon), math.radians(lat)
            return np.array([math.cos(la) * math.cos(lo),
                             math.cos(la) * math.sin(lo),
                             math.sin(la)])

        def slerp(a, b, n=2000):
            w = math.acos(np.clip(np.dot(a, b), -1, 1))
            t = np.linspace(0, 1, n)[:, None]
            return (np.sin((1 - t) * w) * a + np.sin(t * w) * b) \
                / math.sin(w)

        def slerp_t(a, b, t):
            w = math.acos(np.clip(np.dot(a, b), -1, 1))
            v = (math.sin((1 - t) * w) * a + math.sin(t * w) * b) \
                / math.sin(w)
            return v / np.linalg.norm(v)

        expect = set()
        routes = {rid: (uv(s[0], s[1]), uv(s[2], s[3]))
                  for rid, s in GC_ROUTES.items()}
        for r in pts:
            lon2 = (r.doc_id * 12553 % 360000) / 1000.0 - 180.0
            lat2 = (r.doc_id * 24001 % 170000) / 1000.0 - 85.0
            p1, p2 = uv(r.lon, r.lat), uv(lon2, lat2)
            if np.dot(p1, p2) > 1.0 - 1e-15:  # degenerate leg
                continue
            arc = slerp(p1, p2)
            for rid, (q1, q2) in routes.items():
                n2 = np.cross(q1, q2)
                sgn = np.sign(arc @ n2)
                # crossing of the ROUTE plane within our arc...
                if not (sgn[0] * sgn[-1] < 0):
                    continue
                # ...bisected to the exact plane crossing, which must
                # then lie WITHIN the route's span (tight tolerance —
                # the discretization error is gone after bisection)
                i = int(np.argmax(sgn != sgn[0]))
                lo, hi = (i - 1) / (len(arc) - 1), i / (len(arc) - 1)
                for _ in range(60):
                    mid = (lo + hi) / 2
                    if np.sign(np.dot(slerp_t(p1, p2, mid), n2)) \
                            == sgn[0]:
                        lo = mid
                    else:
                        hi = mid
                x = slerp_t(p1, p2, (lo + hi) / 2)
                full = math.acos(np.clip(np.dot(q1, q2), -1, 1))
                part = (math.acos(np.clip(np.dot(q1, x), -1, 1))
                        + math.acos(np.clip(np.dot(x, q2), -1, 1)))
                if part - full < 1e-9:
                    expect.add((r.doc_id, rid))
        assert got == expect
