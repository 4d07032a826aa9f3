"""Property-based tests (hypothesis) for the numeric core + geos/WKT."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from numpy.testing import assert_almost_equal

from pyproj_spark.functions import cells
from pyproj_spark.kernels.geodesic import Geodesic
from pyproj_spark.crs.crs import CRS
from pyproj_spark.plans.spec import Transformer

lons = st.floats(min_value=-179.99, max_value=179.99,
                 allow_nan=False, allow_infinity=False)
lats = st.floats(min_value=-89.0, max_value=89.0,
                 allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lons, lats)
def test_cell_center_roundtrip(lon, lat):
    """encode(center(encode(p))) == encode(p) at any resolution."""
    for res in (3, 9, 15):
        c = cells.encode_np(np.array([lon]), np.array([lat]), res)
        clon, clat = cells.cell_center_np(c)
        c2 = cells.encode_np(clon, clat, res)
        assert c2[0] == c[0]


@settings(max_examples=100, deadline=None)
@given(lons, lats)
def test_cell_parent_consistency(lon, lat):
    """parent(encode(p, r)) == encode(p, r-1)."""
    c9 = cells.encode_np(np.array([lon]), np.array([lat]), 9)
    c8 = cells.encode_np(np.array([lon]), np.array([lat]), 8)
    assert cells.parent_np(c9)[0] == c8[0]


@settings(max_examples=100, deadline=None)
@given(lons, lats, lons, lats)
def test_geodesic_symmetry(lon1, lat1, lon2, lat2):
    """inv(A,B).dist == inv(B,A).dist; forward azimuths mirror."""
    g = Geodesic("WGS84")
    a1, a2, d = g.inverse(lon1, lat1, lon2, lat2)
    b1, b2, d2 = g.inverse(lon2, lat2, lon1, lat1)
    # absolute + relative: near-equatorial inverses accumulate ~1e-11
    # relative round-off (hypothesis found 1.5 um over 122 km), which
    # is double-precision noise, not kernel asymmetry
    assert abs(float(d) - float(d2)) < 1e-6 + 1e-10 * abs(float(d))


@settings(max_examples=50, deadline=None)
@given(lons, lats)
def test_transform_roundtrip_property(lon, lat):
    t = Transformer.from_crs(4326, 32633, always_xy=True)
    x, y = t.transform(lon, lat)
    lon2, lat2 = t.transform(x, y, direction="INVERSE")
    # TM far from the central meridian degrades; only assert where the
    # projection is well-conditioned (PROJ behaves the same way)
    if abs(((lon - 15 + 180) % 360) - 180) < 60:
        assert abs(lon2 - lon) < 1e-7 and abs(lat2 - lat) < 1e-7


def test_geos_roundtrip_grid():
    t = Transformer.from_crs(
        "+proj=latlong +ellps=GRS80 +towgs84=0,0,0",
        "+proj=geos +h=35785831.0 +lon_0=-75 +sweep=y +ellps=GRS80 "
        "+towgs84=0,0,0", always_xy=True)
    lon, lat = np.meshgrid(np.linspace(-130, -20, 40),
                           np.linspace(-60, 60, 40))
    x, y = t.transform(lon.ravel(), lat.ravel())
    ok = np.isfinite(x)
    assert ok.mean() > 0.95
    lon2, lat2 = t.transform(x[ok], y[ok], direction="INVERSE")
    assert_almost_equal(lon2, lon.ravel()[ok], decimal=9)
    assert_almost_equal(lat2, lat.ravel()[ok], decimal=9)
    # sub-satellite point is the origin; far side is inf
    assert t.transform(-75.0, 0.0) == (0.0, 0.0)
    assert np.isinf(t.transform(105.0, 0.0)[0])


def test_wkt_export():
    from pyproj_spark.crs.crs import CRS
    w = CRS.from_epsg(4326).to_wkt()
    assert w.startswith("GEOGCRS[") and 'ID["EPSG",4326]' in w
    w2 = CRS.from_epsg(32610).to_wkt()
    assert w2.startswith("PROJCRS[")
    assert 'METHOD["Transverse Mercator",ID["EPSG",9807]]' in w2
    assert 'PARAMETER["Longitude of natural origin",-123.0' in w2
    w3 = CRS.from_epsg(2263).to_wkt()
    assert '"US survey foot"' in w3
    w4 = CRS.from_epsg(4978).to_wkt()
    assert w4.startswith("GEODCRS[") and "geocentricX" in w4


def test_cf_roundtrip():
    """to_cf -> from_cf preserves the transform math for every supported
    projection family (reference test/test_crs_cf.py pattern)."""
    from pyproj_spark.crs.crs import CRS
    cases = [
        "EPSG:32610", "EPSG:3857", "EPSG:2263",
        "+proj=laea +lat_0=52 +lon_0=10 +a=6378137 +rf=298.257222101 "
        "+towgs84=0,0,0",
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84 "
        "+towgs84=0,0,0",
        "+proj=geos +h=35785831.0 +lon_0=-75 +sweep=y +ellps=GRS80 "
        "+towgs84=0,0,0",
        "+proj=sinu +lon_0=0 +ellps=WGS84 +towgs84=0,0,0",
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
        "+ellps=GRS80 +towgs84=0,0,0",
        "+proj=cea +lat_ts=30 +lon_0=0 +ellps=WGS84 +towgs84=0,0,0",
        "+proj=ortho +lat_0=40 +lon_0=-30 +ellps=WGS84 +towgs84=0,0,0",
        "+proj=nsper +h=5000000 +lat_0=40 +lon_0=-20 +ellps=WGS84 "
        "+towgs84=0,0,0",
        "+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257964666666 "
        "+gamma=90 +k_0=0.99984 +ellps=WGS84 +towgs84=0,0,0",
    ]
    for srs in cases:
        crs = CRS.from_user_input(srs)
        cf = crs.to_cf()
        assert "grid_mapping_name" in cf and "crs_wkt" in cf
        back = CRS.from_cf(cf)
        t1 = Transformer.from_crs(4326, crs, always_xy=True)
        t2 = Transformer.from_crs(4326, back, always_xy=True)
        lon = -70.0 if "geos" in srs else 10.0  # visible from the sat
        lat = -75.0 if "stere" in srs else 45.0
        a = t1.transform(lon, lat)
        b = t2.transform(lon, lat)
        # CF grid mappings carry no linear-unit info (units live on the
        # coordinate variables), so compare in metres
        ua = crs.to_meter or 1.0
        ub = back.to_meter or 1.0
        assert_almost_equal((a[0] * ua, a[1] * ua), (b[0] * ub, b[1] * ub),
                            decimal=5)
    cf = CRS.from_epsg(4326).to_cf()
    assert cf["grid_mapping_name"] == "latitude_longitude"


def test_new_projection_roundtrips_and_invariants():
    """aea/cea/ortho/nsper/ob_tran: roundtrip exactness + the defining
    invariant (areal_scale == 1 for equal-area; hidden -> inf)."""
    from pyproj_spark.proj import Proj
    rng = np.random.default_rng(9)
    lon = rng.uniform(-60, -40, 300)
    lat = rng.uniform(25, 48, 300)

    def rt(src, dst):
        t = Transformer.from_crs(src, dst, always_xy=True)
        x, y = t.transform(lon, lat)
        lo, la = t.transform(x, y, direction="INVERSE")
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9

    W = "+proj=latlong +ellps=WGS84 +towgs84=0,0,0"
    S = "+proj=latlong +R=6370997 +towgs84=0,0,0"
    rt(W, "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
          "+ellps=WGS84 +towgs84=0,0,0")
    rt(W, "+proj=cea +lat_ts=30 +lon_0=0 +ellps=WGS84 +towgs84=0,0,0")
    rt(S, "+proj=ortho +lat_0=40 +lon_0=-74 +R=6370997 +towgs84=0,0,0")
    rt(S, "+proj=nsper +lat_0=40 +lon_0=-74 +h=5000000 +R=6370997 "
          "+towgs84=0,0,0")
    rt(S, "+proj=ob_tran +o_proj=longlat +o_lat_p=30 +o_lon_p=15 +lon_0=10 "
          "+R=6370997 +towgs84=0,0,0")

    # equal-area projections: areal scale exactly 1 everywhere
    for srs in ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
                "+ellps=WGS84 +towgs84=0,0,0",
                "+proj=cea +lat_ts=30 +ellps=WGS84 +towgs84=0,0,0"):
        f = Proj(srs).get_factors(np.array([-96.0, -80.0, -110.0]),
                                  np.array([30.0, 40.0, 55.0]))
        assert_almost_equal(f.areal_scale, [1.0, 1.0, 1.0], decimal=7)

    # conformal projections: h == k (isotropic scale)
    for srs in ("EPSG:32610", "EPSG:3857",
                "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 "
                "+ellps=WGS84 +towgs84=0,0,0"):
        f = Proj(srs).get_factors(np.array([-120.0, -118.0]),
                                  np.array([34.0, 40.0]))
        assert_almost_equal(f.meridional_scale, f.parallel_scale, decimal=8)

    # ortho far hemisphere -> inf
    t = Transformer.from_crs(S, "+proj=ortho +lat_0=40 +lon_0=-74 "
                                "+R=6370997 +towgs84=0,0,0", always_xy=True)
    assert np.isinf(t.transform(106.0, -40.0)[0])


def test_omerc_malaysia_rso():
    """Hotine oblique Mercator (EPSG:3376 parameters): roundtrip,
    conformality, and exact center scale/origin."""
    from pyproj_spark.proj import Proj
    SRS = ("+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257964666666 "
           "+k=0.99984 +x_0=804671 +y_0=0 +gamma=323.1301023611111 "
           "+ellps=GRS80 +towgs84=0,0,0")
    W = "+proj=latlong +ellps=GRS80 +towgs84=0,0,0"
    t = Transformer.from_crs(W, SRS, always_xy=True)
    rng = np.random.default_rng(4)
    lon = rng.uniform(99, 105, 300)
    lat = rng.uniform(1, 7, 300)
    x, y = t.transform(lon, lat)
    lo, la = t.transform(x, y, direction="INVERSE")
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9
    # projection center maps to (x_0, y_0)
    assert_almost_equal(t.transform(102.25, 4.0), (804671.0, 0.0), decimal=5)
    f = Proj(SRS).get_factors(np.array([102.25, 101.0]), np.array([4.0, 2.0]))
    assert_almost_equal(f.meridional_scale, f.parallel_scale, decimal=9)
    assert_almost_equal(f.parallel_scale[0], 0.99984, decimal=7)


def test_cf_stereographic_variants():
    # k_0 must survive to_cf/from_cf for merc + stere; oblique stere maps
    # to CF 'stereographic', polar keeps 'polar_stereographic'
    from pyproj_spark.crs.cf import from_cf, to_cf
    from pyproj_spark.crs.crs import CRS

    cf = to_cf(CRS.from_dict({"proj": "merc", "k_0": 0.7, "lon_0": 10.0}))
    assert cf["scale_factor_at_projection_origin"] == 0.7
    assert float(from_cf(cf).proj_params["k_0"]) == 0.7

    cf = to_cf(CRS.from_dict({"proj": "stere", "lat_0": 90.0,
                              "k_0": 0.994, "lon_0": -45.0}))
    assert cf["grid_mapping_name"] == "polar_stereographic"
    assert cf["straight_vertical_longitude_from_pole"] == -45.0

    cf = to_cf(CRS.from_dict({"proj": "stere", "lat_0": 52.15,
                              "k_0": 0.9999079, "lon_0": 5.38}))
    assert cf["grid_mapping_name"] == "stereographic"
    back = from_cf(cf).proj_params
    assert back["proj"] == "stere" and float(back["lat_0"]) == 52.15


@settings(max_examples=40, deadline=None)
@given(
    proj=st.sampled_from(["tmerc", "merc", "lcc", "laea", "aeqd",
                          "stere", "eqc", "sinu", "aea", "cea", "poly"]),
    lat_0=st.floats(-60.0, 60.0),
    lon_0=st.floats(-179.0, 179.0),
    k_0=st.floats(0.9, 1.1),
    x_0=st.floats(-1e6, 1e6),
    y_0=st.floats(-1e6, 1e6),
)
def test_wkt_projjson_roundtrip_fuzz(proj, lat_0, lon_0, k_0, x_0, y_0):
    # any constructible projected CRS must survive to_wkt->from_wkt and
    # to_json->from_json with an identical canonical key
    params = {"proj": proj, "lon_0": lon_0, "x_0": x_0, "y_0": y_0,
              "ellps": "WGS84"}
    if proj == "lcc":
        params.update(lat_1=lat_0 / 2 + 10, lat_2=lat_0 / 2 + 30,
                      lat_0=lat_0)
    elif proj == "aea":
        params.update(lat_1=20.0, lat_2=50.0, lat_0=lat_0)
    elif proj in ("merc", "cea", "eqc"):
        params.update(lat_ts=abs(lat_0) / 2)
    elif proj == "stere":
        params.update(lat_0=lat_0, k_0=k_0)
    elif proj == "sinu":
        pass
    else:
        params.update(lat_0=lat_0, k_0=k_0)
    crs = CRS.from_dict(params)
    assert CRS.from_wkt(crs.to_wkt())._key() == crs._key()
    assert CRS.from_json(crs.to_json())._key() == crs._key()


@settings(max_examples=30, deadline=None)
@given(
    lon=st.floats(-60.0, -40.0),
    lat=st.floats(-30.0, 30.0),
    lat_0=st.floats(-20.0, 20.0),
)
def test_polyconic_roundtrip_fuzz(lon, lat, lat_0):
    t = Transformer.from_crs(
        4326,
        f"+proj=poly +lat_0={lat_0} +lon_0=-54 +ellps=WGS84 "
        "+towgs84=0,0,0",
        always_xy=True)
    x, y = t.transform(lon, lat)
    lon2, lat2 = t.transform(x, y, direction="INVERSE")
    # machine-precision everywhere since the 2 sin^2(E'/2) forward and
    # the near-equator series branch (kernels/projections.py Polyconic)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


@settings(max_examples=30, deadline=None)
@given(zone=st.integers(1, 60), south=st.booleans())
def test_utm_canonicalization_fuzz(zone, south):
    # compact utm form == expanded tmerc form for every zone/hemisphere
    s = " +south" if south else ""
    a = CRS.from_proj4(f"+proj=utm +zone={zone}{s} +ellps=WGS84")
    b = CRS.from_proj4(
        f"+proj=tmerc +lat_0=0 +lon_0={zone * 6 - 183} +k_0=0.9996 "
        f"+x_0=500000 +y_0={10000000 if south else 0} +ellps=WGS84")
    assert a == b
    code = (32700 if south else 32600) + zone
    assert a.to_epsg() == code


def test_cf_rotated_latitude_longitude_roundtrip():
    """CF pole-rotation attrs (reference _cf1x8.py:336-344) round-trip
    through the ob_tran kernel and preserve the rotation math."""
    import numpy as np
    from pyproj_spark.crs.cf import from_cf, to_cf
    from pyproj_spark.crs.crs import CRS
    cf = {"grid_mapping_name": "rotated_latitude_longitude",
          "grid_north_pole_latitude": 32.5,
          "grid_north_pole_longitude": 170.0,
          "north_pole_grid_longitude": 0.0,
          "semi_major_axis": 6378137.0,
          "inverse_flattening": 298.257223563}
    crs = from_cf(cf)
    assert crs.proj_params["proj"] == "ob_tran"
    back = to_cf(crs)
    for k in ("grid_north_pole_latitude", "grid_north_pole_longitude",
              "north_pole_grid_longitude"):
        assert back[k] == cf[k], k
    # rotation sanity: the true north pole maps to rotated latitude
    # equal to grid_north_pole_latitude (the engine's ob_tran convention
    # outputs radians*a, matching PROJ's bare ob_tran to_meter)
    t = Transformer.from_crs("EPSG:4326", crs, always_xy=True)
    rlon, rlat = t.transform(0.0, 90.0)
    assert abs(np.degrees(rlat / 6378137.0) - 32.5) < 1e-9
    t2 = Transformer.from_crs(crs, "EPSG:4326", always_xy=True)
    lon0, lat0 = t2.transform(rlon, rlat)
    assert abs(lat0 - 90.0) < 1e-9


@given(st.lists(st.tuples(st.floats(-179.99, 179.99),
                          st.floats(-89.99, 89.99)),
                min_size=1, max_size=50),
       st.integers(1, 20))
@settings(max_examples=200, deadline=None)
def test_s2_parent_commutes_with_encode(pts, level):
    """encode(p, Lp) == parent(encode(p, L), Lp) for every Lp <= L —
    the strict-hierarchy property that makes coarse pruning sound."""
    import numpy as np
    from pyproj_spark.functions import s2cell
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    fine = s2cell.encode_np(lon, lat, level)
    assert ((fine >> 58) & 31 == level).all()
    assert (fine & ((1 << 55) - 1) < (1 << (2 * level))).all()
    for lp in {0, level // 2, level}:
        assert (s2cell.parent_np(fine, lp)
                == s2cell.encode_np(lon, lat, lp)).all()


@given(st.text(alphabet="ab", min_size=1, max_size=20),
       st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"),
                        ("b", "b")]))
@settings(max_examples=300, deadline=None)
def test_bpe_greedy_fold_invariants(word, pair):
    """The greedy left-to-right merge fold: output re-concatenates to
    the input, and no un-merged (left, right) adjacency survives."""
    a, b = pair
    out = []
    for x in word:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    assert "".join(out) == word
    assert not any(out[i] == a and out[i + 1] == b
                   for i in range(len(out) - 1))
