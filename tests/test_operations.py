"""from_pipeline operation-code inputs (reference
test/test_transformer.py:415-446,1406-1446) against the curated
operation catalog."""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from pyproj_spark.exceptions import CRSError
from pyproj_spark.plans.spec import Transformer


@pytest.mark.parametrize("input_string", [
    "EPSG:1671",
    "urn:ogc:def:coordinateOperation:EPSG::1671",
])
def test_from_pipeline_input_types(input_string):
    t = Transformer.from_pipeline(input_string)
    assert t.description == "RGF93 v1 to WGS 84 (1)"
    # null helmert: coordinates unchanged
    assert_almost_equal(t.transform(48.0, 2.0), (48.0, 2.0), decimal=12)


def test_from_pipeline_unknown_code_raises_crserror():
    with pytest.raises(CRSError):
        Transformer.from_pipeline("EPSG:999999")
    with pytest.raises(CRSError):
        Transformer.from_pipeline("IGNF:LAMB93")
    with pytest.raises(CRSError):
        Transformer.from_pipeline("EPSG:notacode")


def test_always_xy_from_pipeline():
    # reference test_transformer.py:415-437 — EPSG:1311 ED50->WGS84(18)
    t_xy = Transformer.from_pipeline("EPSG:1311", always_xy=True)
    t_def = Transformer.from_pipeline("EPSG:1311", always_xy=False)
    lon, lat = -3.7, 40.4
    rx = t_xy.transform(lon, lat)
    rd = t_def.transform(lat, lon)
    assert_almost_equal(rx[0], rd[1], decimal=6)
    assert_almost_equal(rx[1], rd[0], decimal=6)
    # a real datum shift: output differs from input by ~100m
    d = abs(rx[0] - lon) + abs(rx[1] - lat)
    assert 1e-4 < d < 0.01


def test_geocentric_translation_matches_from_crs():
    # EPSG:1133 (ED50->WGS84 (1), -87/-98/-121) is the towgs84 the
    # CRS catalog carries for ED50: the explicit operation and the
    # planned CRS->CRS transform must agree
    t_op = Transformer.from_pipeline("EPSG:1133", always_xy=True)
    t_crs = Transformer.from_crs(4230, 4326, always_xy=True)
    lons = np.array([-3.7, 2.35, 12.5])
    lats = np.array([40.4, 48.85, 41.9])
    xo, yo = t_op.transform(lons, lats)
    xc, yc = t_crs.transform(lons, lats)
    assert_almost_equal(xo, xc, decimal=9)
    assert_almost_equal(yo, yc, decimal=9)


def test_gda2020_coordinate_frame():
    # GDA94 -> GDA2020 (EPSG:8048, coordinate-frame rotation): the
    # published displacement is ~1.8 m toward NNE (plate motion
    # 1994->2020); round-trip must close to sub-mm
    t = Transformer.from_pipeline("EPSG:8048", always_xy=True)
    lon, lat = 133.8855, -23.6701  # Alice Springs
    lon2, lat2 = t.transform(lon, lat)
    from pyproj_spark.kernels.geod import Geod
    g = Geod(ellps="GRS80")
    az, _, dist = g.inv(lon, lat, lon2, lat2)
    assert 1.5 < dist < 2.0
    assert 10.0 < az < 45.0
    back = t.transform(lon2, lat2, direction="INVERSE")
    assert_almost_equal(back, (lon, lat), decimal=9)


def test_utm_conversion_codes():
    t = Transformer.from_pipeline("EPSG:16031", always_xy=True)  # 31N
    assert t.description == "UTM zone 31N"
    e, n = t.transform(3.0, 0.0)
    assert_almost_equal((e, n), (500000.0, 0.0), decimal=6)
    ts = Transformer.from_pipeline("EPSG:17031", always_xy=True)  # 31S
    es, ns = ts.transform(3.0, 0.0)
    assert_almost_equal((es, ns), (500000.0, 10000000.0), decimal=6)
    back = ts.transform(es, ns, direction="INVERSE")
    assert_almost_equal(back, (3.0, 0.0), decimal=9)


@pytest.mark.parametrize("method_name", ["to_wkt", "to_json"])
def test_from_pipeline_wkt_json_roundtrip(method_name):
    # reference test_transformer.py:1427-1446: feeding an operation's
    # own WKT/PROJJSON back into from_pipeline reproduces it
    t = Transformer.from_pipeline(
        "urn:ogc:def:coordinateOperation:EPSG::1671")
    t2 = Transformer.from_pipeline(getattr(t, method_name)())
    assert t2.description == "RGF93 v1 to WGS 84 (1)"


def test_operation_wkt_generic_parse():
    # strip the trailing EPSG ID so the parser takes the generic
    # METHOD+PARAMETER path instead of the catalog lookup
    t = Transformer.from_pipeline("EPSG:1311", always_xy=True)
    wkt = t.to_wkt()
    stripped = wkt[: wkt.rindex(",ID[")] + "]"
    t2 = Transformer.from_pipeline(stripped, always_xy=True)
    a = t.transform(-3.7, 40.4)
    b = t2.transform(-3.7, 40.4)
    assert_almost_equal(a, b, decimal=12)


def test_from_pipeline_by_operation_name():
    t = Transformer.from_pipeline("ED50 to WGS 84 (18)", always_xy=True)
    t2 = Transformer.from_pipeline("EPSG:1311", always_xy=True)
    assert_almost_equal(t.transform(-3.7, 40.4), t2.transform(-3.7, 40.4),
                        decimal=12)
    u = Transformer.from_pipeline("UTM zone 31N", always_xy=True)
    assert_almost_equal(u.transform(3.0, 0.0), (500000.0, 0.0), decimal=6)
    with pytest.raises(CRSError):
        Transformer.from_pipeline("No Such Operation (1)")


def test_from_pipeline_concatenated_urn():
    """OGC concatenated-operation URN (reference
    transformer.py:780-782): listed operations chain with per-step
    orientation resolution, .operations exposes the step list
    (_crs.pyx:177-199)."""
    urn = ("urn:ogc:def:coordinateOperation,"
           "coordinateOperation:EPSG::1311,"
           "coordinateOperation:EPSG::1188")
    t = Transformer.from_pipeline(urn)
    assert [o.name for o in t.operations] == [
        "ED50 to WGS 84 (18)", "NAD83 to WGS 84 (1)"]
    assert t.name == "ED50 to WGS 84 (18) + Inverse of NAD83 to WGS 84 (1)"
    assert t.source_crs.epsg_code == 4230
    assert t.target_crs.epsg_code == 4269
    assert t.accuracy == 3.0
    # equals the manual composition step by step
    a = Transformer.from_pipeline("EPSG:1311")
    b = Transformer.from_pipeline("EPSG:1188")
    x, y = t.transform(10.0, 52.0)
    mx, my = a.transform(10.0, 52.0)
    mx, my = b.transform(mx, my, direction="INVERSE")
    assert_almost_equal((x, y), (mx, my), decimal=12)
    # inverse direction round-trips (geog2D domain: h dropped between
    # steps, same convention as PROJ -> ~1e-8 deg residual)
    xi, yi = t.transform(x, y, direction="INVERSE")
    assert_almost_equal((xi, yi), (10.0, 52.0), decimal=7)
    # unlinkable chain raises the typed error
    with pytest.raises(CRSError):
        Transformer.from_pipeline(
            "urn:ogc:def:coordinateOperation,"
            "coordinateOperation:EPSG::8048,"
            "coordinateOperation:EPSG::1133")
    # conversions cannot participate
    with pytest.raises(CRSError):
        Transformer.from_pipeline(
            "urn:ogc:def:coordinateOperation,"
            "coordinateOperation:EPSG::16031,"
            "coordinateOperation:EPSG::1188")


def test_operation_name_heuristics():
    """from_pipeline name resolution heuristics (reference
    transformer.py:780-782 'heuristics are applied'): punctuation-
    insensitive and unique-substring matches resolve; ambiguous
    substrings raise CRSError naming candidates."""
    a = Transformer.from_pipeline("gda94 to gda2020 1")  # squashed
    b = Transformer.from_pipeline("EPSG:8048")
    assert_almost_equal(a.transform(133.0, -25.0),
                        b.transform(133.0, -25.0), decimal=12)
    c = Transformer.from_pipeline("RGF93")  # unique substring
    assert c.name == "RGF93 v1 to WGS 84 (1)"
    with pytest.raises(CRSError, match="ambiguous"):
        Transformer.from_pipeline("ED50 to WGS 84")  # (1) vs (18)
    with pytest.raises(CRSError):
        Transformer.from_pipeline("No Such Thing At All")
