"""Spherical centroid: the antimeridian case naive averaging fails."""

import math


def test_antimeridian_centroid(spark):
    from pyproj_spark.operators.hotspot import spherical_centroids
    rows = [(1, 179.0, 10.0), (1, -179.0, 10.0),
            (2, 10.0, 45.0), (2, 20.0, 45.0)]
    df = spark.createDataFrame(rows, "g long, lon double, lat double")
    out = {r.g: r for r in spherical_centroids(df, "g").collect()}
    # straddling pair averages to the antimeridian, NOT lon 0; the
    # great-circle midpoint of a same-latitude pair pulls POLEWARD
    # (never equatorward) — that's spherical, not a bug
    assert abs(abs(out[1].lon_c) - 180.0) < 1e-6
    assert 10.0 <= out[1].lat_c < 10.2
    # same-side pair: ordinary midpoint in lon; lat pulled poleward of
    # neither point is impossible for equal lats
    assert abs(out[2].lon_c - 15.0) < 0.1
    assert 45.0 <= out[2].lat_c < 45.2
    # dispersion: tight pair closer to 1 than the straddling pair is
    # to its own spread; both in (0, 1]
    for r in out.values():
        assert 0.0 < r.r_bar <= 1.0


def test_single_point_is_fixed_point(spark):
    from pyproj_spark.operators.hotspot import spherical_centroids
    df = spark.createDataFrame([(1, -42.5, 33.25)],
                               "g long, lon double, lat double")
    r = spherical_centroids(df, "g").collect()[0]
    assert abs(r.lon_c - (-42.5)) < 1e-6
    assert abs(r.lat_c - 33.25) < 1e-6
    assert math.isclose(r.r_bar, 1.0, rel_tol=1e-6)
