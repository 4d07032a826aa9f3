"""Pickle + thread-safety parity with the reference's test strategy
(reference test/test_pickle.py, test/test_transformer.py threading
cases): every driver-side object that rides a Spark closure or
broadcast must pickle, and transformers must be usable from multiple
threads (per-worker kernel cache + per-transformer last_ops)."""

import pickle
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from numpy.testing import assert_almost_equal

from pyproj_spark.crs.crs import CRS
from pyproj_spark.kernels.geod import Geod
from pyproj_spark.plans.spec import Transformer, TransformSpec


def _rt(obj):
    return pickle.loads(pickle.dumps(obj))


def test_crs_pickle_round_trips():
    for code in (4326, 3857, 32633, 4267, 2154):
        c = CRS.from_epsg(code)
        c2 = _rt(c)
        assert c2 == c
        assert c2.to_wkt() == c.to_wkt()
    p = CRS.from_user_input("+proj=utm +zone=17 +datum=NAD27 "
                            "+towgs84=-8,160,176")
    assert _rt(p).is_bound and _rt(p) == p


def test_transform_spec_and_transformer_pickle():
    spec = TransformSpec("EPSG:4326", "EPSG:3857", always_xy=True)
    spec2 = _rt(spec)
    assert spec2.key == spec.key
    t = Transformer.from_crs("EPSG:4326", "EPSG:32633", always_xy=True)
    t2 = _rt(t)
    a = t.transform(15.0, 52.0)
    b = t2.transform(15.0, 52.0)
    assert_almost_equal(a, b, decimal=9)


def test_operation_transformers_pickle():
    for inp in ("EPSG:1311",
                "urn:ogc:def:coordinateOperation,"
                "coordinateOperation:EPSG::1311,"
                "coordinateOperation:EPSG::1188"):
        t = Transformer.from_pipeline(inp)
        t2 = _rt(t)
        assert_almost_equal(t.transform(10.0, 52.0),
                            t2.transform(10.0, 52.0), decimal=12)


def test_geod_pickle():
    g = Geod(ellps="clrk66")
    g2 = _rt(g)
    assert g2.a == g.a and g2.f == g.f
    assert_almost_equal(g.inv(0, 0, 10, 10), g2.inv(0, 0, 10, 10),
                        decimal=9)


def test_transformer_threading():
    """Concurrent transforms through the memoized kernel cache must be
    correct and keep per-transformer last-op state isolated."""
    t = Transformer.from_crs("EPSG:4326", "EPSG:3857", always_xy=True)
    lons = np.linspace(-170, 170, 500)
    lats = np.linspace(-80, 80, 500)
    expected = t.transform(lons, lats)

    def work(_):
        mine = Transformer.from_crs("EPSG:4326", "EPSG:3857",
                                    always_xy=True)
        return mine.transform(lons, lats)

    with ThreadPoolExecutor(max_workers=8) as ex:
        for got in ex.map(work, range(16)):
            assert_almost_equal(got, expected, decimal=12)
