"""Geodesic kernel tests against pyproj's published golden values.

Constants are the inline expected values from the reference suite
(/root/reference/test/test_geod.py) asserted at the same decimals.
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from pyproj_spark.kernels.geod import Geod, reverse_azimuth
from pyproj_spark.kernels.geodesic import Geodesic

BOSTON = (-71.0 - 7.0 / 60.0, 42.0 + 15.0 / 60.0)
PORTLAND = (-123.0 - 41.0 / 60.0, 45.0 + 31.0 / 60.0)


@pytest.mark.parametrize(
    "ellps,az12,az21,dist",
    [
        ("clrk66", -66.5305947876623, 75.65363415556968, 4164192.708),
        ("WGS84", -66.5305947876623, 75.65363415556968, 4164074.239),
    ],
)
def test_geodesic_inv(ellps, az12, az21, dist):
    # reference test/test_geod.py:41-75 (decimal=3)
    g = Geod(ellps=ellps)
    a12, a21, d = g.inv(*BOSTON, *PORTLAND)
    assert_almost_equal((a12, a21, d), (az12, az21, dist), decimal=3)


SEGMENTS = [
    (*BOSTON, *BOSTON, 180.0, 0.0, 0.0),
    (*BOSTON, -80.79664651607472, 44.83744724383204,
     -66.53059478766238, 106.79071710136431, 832838.5416198927),
    (-80.79664651607472, 44.83744724383204, -91.21816704002396,
     46.536201500764776, -73.20928289863558, 99.32289055927389,
     832838.5416198935),
    (-91.21816704002396, 46.536201500764776, -102.10621593474447,
     47.236494630072166, -80.67710944072617, 91.36325611787134,
     832838.5416198947),
    (-102.10621593474447, 47.236494630072166, -113.06616309750775,
     46.88821539471925, -88.63674388212858, 83.32809401477382,
     832838.5416198922),
    (-113.06616309750775, 46.88821539471925, *PORTLAND,
     -96.67190598522616, 75.65363415556973, 832838.5416198926),
]


def test_geodesic_inv_multiple_points():
    # reference test/test_geod.py:78-142 (default decimal=7), incl. the
    # coincident-points row (az12=180, az21=0, dist=0)
    g = Geod(ellps="clrk66")
    arr = np.array(SEGMENTS)
    a12, a21, d = g.inv(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3])
    assert_almost_equal(a12, arr[:, 4])
    assert_almost_equal(a21, arr[:, 5])
    assert_almost_equal(d, arr[:, 6])


def test_scalar_vs_batch():
    # reference test/conftest.py:96-125 scalar/array duality: batch size 1
    # and N must agree bit-for-bit
    g = Geod(ellps="WGS84")
    a12s, a21s, ds = g.inv(*BOSTON, *PORTLAND)
    arr = np.array(SEGMENTS)
    a12b, a21b, db = g.inv(
        np.r_[arr[:, 0], BOSTON[0]], np.r_[arr[:, 1], BOSTON[1]],
        np.r_[arr[:, 2], PORTLAND[0]], np.r_[arr[:, 3], PORTLAND[1]])
    assert float(a12b[-1]) == float(a12s)
    assert float(db[-1]) == float(ds)


def test_fwd_inv_roundtrip_fuzz():
    g = Geodesic("WGS84")
    rng = np.random.default_rng(42)
    n = 5000
    lon1 = rng.uniform(-180, 180, n)
    lat1 = rng.uniform(-89.9, 89.9, n)
    lon2 = rng.uniform(-180, 180, n)
    lat2 = rng.uniform(-89.9, 89.9, n)
    a1, a2, d = g.inverse(lon1, lat1, lon2, lat2)
    x2, y2, _ = g.direct(lon1, lat1, a1, d)
    dlon = np.abs(np.remainder(x2 - lon2 + 180, 360) - 180)
    err_m = np.hypot(dlon * np.cos(np.radians(lat2)), np.abs(y2 - lat2)) * 111194.9
    assert err_m.max() < 1e-6


def test_nearly_antipodal():
    g = Geodesic("WGS84")
    rng = np.random.default_rng(7)
    n = 2000
    lon1 = rng.uniform(-180, 180, n)
    lat1 = rng.uniform(-89, 89, n)
    lon2 = np.remainder(lon1 + 180 + rng.uniform(-0.5, 0.5, n) + 180, 360) - 180
    lat2 = np.clip(-lat1 + rng.uniform(-0.5, 0.5, n), -90, 90)
    a1, a2, d = g.inverse(lon1, lat1, lon2, lat2)
    x2, y2, _ = g.direct(lon1, lat1, a1, d)
    dlon = np.abs(np.remainder(x2 - lon2 + 180, 360) - 180)
    err_m = np.hypot(dlon * np.cos(np.radians(lat2)), np.abs(y2 - lat2)) * 111194.9
    assert err_m.max() < 1e-6


def test_line_length_radians():
    # reference test/test_geod.py:529-544
    g = Geod(ellps="WGS84")
    assert_almost_equal(
        g.line_length([1, 2], [0.5, 1], radians=True), 5426061.32197463,
        decimal=3)
    assert_almost_equal(
        g.line_lengths([1, 2], [0.5, 1], radians=True),
        [5426061.32197463], decimal=3)


def test_line_length_antarctica():
    # reference pyproj/geod.py:856-862 doctest: 14,259,605.611 m traverse
    g = Geod(ellps="WGS84")
    lats = [-72.9, -71.9, -74.9, -74.3, -77.5, -77.4, -71.7, -65.9, -65.7,
            -66.6, -66.9, -69.8, -70.0, -71.0, -77.3, -77.9, -74.7]
    lons = [-74, -102, -102, -131, -163, 163, 172, 140, 113,
            88, 59, 25, -4, -14, -33, -46, -61]
    assert_almost_equal(g.line_length(lons, lats), 14259605.611, decimal=3)


def test_polygon_area_perimeter():
    # reference test/test_geod.py golden: triangle (1,2),(3,4),(5,2) on
    # WGS84 (decimal=2); and single point -> (0, 0)
    g = Geod(ellps="WGS84")
    area, perim = g.polygon_area_perimeter([1, 3, 5], [2, 4, 2])
    assert_almost_equal(area, -49187690467.58623, decimal=2)
    assert_almost_equal(perim, 1072185.2103813463, decimal=2)
    area, perim = g.polygon_area_perimeter([1], [1])
    assert area == 0 and perim == 0


def test_polygon_area_outer_ring_ccw_positive():
    g = Geod(ellps="WGS84")
    # square traversed CCW (west->east along the south edge first)
    area, _ = g.polygon_area_perimeter([1, 10, 10, 1], [1, 1, 10, 10])
    assert area > 0
    area_cw, _ = g.polygon_area_perimeter([1, 1, 10, 10], [1, 10, 10, 1])
    assert_almost_equal(area, -area_cw, decimal=2)


def test_polygon_area_sphere_octant():
    g = Geod(R=6370997)
    area, _ = g.polygon_area_perimeter([0, 90, 0], [0, 0, 90])
    assert_almost_equal(area, 4 * np.pi * 6370997.0 ** 2 / 8, decimal=1)


def test_npts():
    # reference pyproj/geod.py docstring: Boston->Portland 4 points
    g = Geod(ellps="clrk66")
    pts = g.npts(*BOSTON, *PORTLAND, 10)
    expected = [(-75.414, 43.528), (-79.883, 44.637), (-84.512, 45.565),
                (-89.279, 46.299), (-94.156, 46.830), (-99.112, 47.149),
                (-104.106, 47.251), (-109.100, 47.136), (-114.051, 46.805),
                (-118.924, 46.262)]
    for (lon, lat), (elon, elat) in zip(pts, expected):
        assert_almost_equal(lon, elon, decimal=3)
        assert_almost_equal(lat, elat, decimal=3)


def test_inv_intermediate_del_s():
    # reference test/test_geod.py:196-231: del_s = dist/2 -> 3 points
    g = Geod(ellps="clrk66")
    a12, a21, dist = g.inv(*BOSTON, *PORTLAND)
    lons, lats, _ = g.inv_intermediate(
        *BOSTON, *PORTLAND, del_s=dist / 2, initial_idx=0, terminus_idx=0)
    assert_almost_equal(lons, [BOSTON[0], -96.62666098, PORTLAND[0]],
                        decimal=3)


def test_fwd_intermediate():
    # reference test/test_geod.py:234-290-ish: points every del_s along azi
    g = Geod(ellps="clrk66")
    a12, a21, dist = g.inv(*BOSTON, *PORTLAND)
    npts = 2
    del_s = dist / (npts + 1)
    lons, lats, _ = g.fwd_intermediate(
        *BOSTON, a12, npts=npts, del_s=del_s)
    assert len(lons) == npts
    # endpoints of segments must lie on the geodesic: check distance from
    # start equals k*del_s
    for k, (lo, la) in enumerate(zip(lons, lats), start=1):
        _, _, d = g.inv(BOSTON[0], BOSTON[1], lo, la)
        assert_almost_equal(d, k * del_s, decimal=3)


def test_reverse_azimuth():
    assert_almost_equal(reverse_azimuth(np.array([10.0, -170.0])),
                        [-170.0, 10.0])
    assert_almost_equal(
        reverse_azimuth(np.array([np.pi / 2]), radians=True),
        [np.pi / 2 - np.pi])


def test_geod_param_init():
    # a/b, a/rf, a/f, a/es paths (pyproj/geod.py:59-112 algebra)
    g1 = Geod(ellps="clrk66")
    g2 = Geod(a=6378206.4, b=6356583.8)
    assert g1.f == pytest.approx(g2.f, rel=1e-12)
    g3 = Geod(a=6378137.0, rf=298.257223563)
    g4 = Geod(ellps="WGS84")
    assert g3.f == g4.f


def test_inv_intermediate_return_object():
    # reference test/test_geod.py:145-192: GeodIntermediateReturn fields
    g = Geod(ellps="clrk66")
    res = g.inv_intermediate(*BOSTON, *PORTLAND, npts=7,
                             initial_idx=0, terminus_idx=0,
                             return_back_azimuth=False)
    assert res.npts == 7
    assert_almost_equal(res.del_s, 694032.1180165777, decimal=3)
    assert_almost_equal(res.dist, 4164192.7080994663, decimal=3)
    assert_almost_equal(res.lons[0], BOSTON[0])
    assert_almost_equal(res.lons[-1], PORTLAND[0])
    # tuple-unpacking compatibility
    lons, lats, azis = res
    assert len(lons) == 7


def test_geod_initstring():
    # reference test/test_geod.py:506-523
    g1 = Geod("+ellps=clrk66")
    g2 = Geod(ellps="clrk66")
    assert g1.a == g2.a and g1.f == g2.f
    a12, a21, d = g1.inv(*BOSTON, *PORTLAND)
    assert_almost_equal((a12, a21, d), (-66.531, 75.654, 4164192.708),
                        decimal=3)


def test_legacy_transform_function():
    from pyproj_spark.proj import Proj
    from pyproj_spark.transformer_compat import transform
    out = transform(Proj(4326), Proj("EPSG:32610"), -120.108, 34.36116666)
    assert_almost_equal(out, (765975.641, 3805993.134), decimal=3)


def test_inv_intermediate_npts_flags():
    # reference test/test_geod.py:289-335 golden matrix: del_s scaled by
    # 4.5/5 with TRUNC and 5.5/5 with CEIL must both land on 5 points
    # with the increment recalculated (DEL_S_RECALC default)
    from pyproj_spark.enums import GeodIntermediateFlag as GIF
    g = Geod(ellps="clrk66")
    dist = 4164192.7080994663
    del_s = dist / 4
    for fact, flag in [(1, GIF.NPTS_ROUND), (4.5 / 5, GIF.NPTS_TRUNC),
                       (5.5 / 5, GIF.NPTS_CEIL)]:
        res = g.inv_intermediate(
            *BOSTON, *PORTLAND, del_s=del_s * fact,
            initial_idx=0, terminus_idx=0,
            flags=flag | GIF.AZIS_KEEP, return_back_azimuth=False)
        assert res.npts == 5
        assert_almost_equal(res.del_s, del_s)
        assert_almost_equal(res.dist, dist)
        assert_almost_equal(
            res.lons, [BOSTON[0], -83.34061499, -96.62666098,
                       -110.34292364, PORTLAND[0]])
        assert_almost_equal(
            res.azis[:-1],
            [-66.53059479, -75.01125433, -84.6195982, -94.68069764])


def test_inv_intermediate_azis_flag():
    # reference test/test_geod.py:206-243: AZIS_DISCARD (default) -> None
    from pyproj_spark.enums import GeodIntermediateFlag as GIF
    g = Geod(ellps="clrk66")
    res = g.inv_intermediate(*BOSTON, *PORTLAND, npts=3,
                             initial_idx=0, terminus_idx=0,
                             return_back_azimuth=False)
    assert res.azis is None
    res = g.inv_intermediate(*BOSTON, *PORTLAND, npts=3,
                             initial_idx=0, terminus_idx=0,
                             flags=GIF.AZIS_KEEP, return_back_azimuth=False)
    assert_almost_equal(
        res.azis, [-66.5305947876623, -84.61959820187617,
                   -104.34636584443031])


def test_inv_intermediate_del_s_no_recalc():
    # DEL_S_NO_RECALC keeps the caller's increment verbatim
    from pyproj_spark.enums import GeodIntermediateFlag as GIF
    g = Geod(ellps="clrk66")
    _, _, dist = g.inv(*BOSTON, *PORTLAND)
    del_s = dist / 4 * 1.02  # ROUND still lands on npts=5
    res = g.inv_intermediate(*BOSTON, *PORTLAND, del_s=del_s,
                             initial_idx=0, terminus_idx=0,
                             flags=GIF.DEL_S_NO_RECALC)
    assert res.del_s == del_s
    _, _, d01 = g.inv(res.lons[0], res.lats[0], res.lons[1], res.lats[1])
    assert_almost_equal(d01, del_s, decimal=3)
