"""Proj facade + factors + catalog API + AOI + transform_bounds +
geometry ops — golden values from the reference suite."""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from pyproj_spark.aoi import AreaOfInterest, BBox
from pyproj_spark.crs.crs import CRS
from pyproj_spark.kernels.geod import Geod
from pyproj_spark.plans.spec import Transformer
from pyproj_spark.proj import Proj


def test_proj_call_golden():
    # reference pyproj/proj.py:72-75
    p = Proj("EPSG:32610")
    x, y = p(-120.108, 34.36116666)
    assert_almost_equal((x, y), (765975.641, 3805993.134), decimal=3)
    lon, lat = p(x, y, inverse=True)
    assert_almost_equal((lon, lat), (-120.108, 34.36116666), decimal=8)


def test_proj_kwargs_init():
    p = Proj(proj="utm", zone=10, ellps="WGS84")
    x, y = p(-120.108, 34.36116666)
    assert_almost_equal((x, y), (765975.641, 3805993.134), decimal=3)


def test_get_factors_2d():
    # reference test/test_proj.py:438-473
    p = Proj(3857)
    f = p.get_factors([[0, 1], [2, 3]], [[1, 2], [3, 4]])
    assert_almost_equal(f.meridional_scale,
                        [[1.0001523, 1.0006095], [1.0013723, 1.0024419]])
    assert_almost_equal(f.parallel_scale,
                        [[1.0001523, 1.0006095], [1.0013723, 1.0024419]])
    assert_almost_equal(f.areal_scale,
                        [[1.00030468, 1.00121946], [1.00274658, 1.00488976]],
                        decimal=7)
    assert_almost_equal(f.angular_distortion, [[0, 0], [0, 0]], decimal=5)
    assert_almost_equal(f.meridian_parallel_angle,
                        [[89.99, 90], [90, 90]], decimal=2)
    assert_almost_equal(f.meridian_convergence, [[0, 0], [0, 0]])
    assert_almost_equal(f.dx_dlam, [[1, 1], [1, 1]])
    assert_almost_equal(f.dy_dphi,
                        [[1.00015233, 1.00060954], [1.00137235, 1.0024419]])


def test_get_factors_utm():
    # reference test/test_proj.py:476-490 (EPSG:3717 = NAD83(NSRS2007)/
    # UTM zone 10N; reproduced via the equivalent proj string)
    p = Proj("+proj=utm +zone=10 +ellps=GRS80 +towgs84=0,0,0")
    f = p.get_factors(-120, 34)
    assert_almost_equal(f.meridional_scale, 1.0005466)
    assert_almost_equal(f.parallel_scale, 1.0005466)
    assert_almost_equal(f.areal_scale, 1.00109349)
    assert_almost_equal(f.angular_distortion, 0)
    assert_almost_equal(f.meridian_parallel_angle, 90)
    assert_almost_equal(f.meridian_convergence, 1.67864770)
    assert_almost_equal(f.tissot_semimajor, 1.00055, decimal=5)
    assert_almost_equal(f.tissot_semiminor, 1.00055, decimal=5)
    assert_almost_equal(f.dx_dlam, 0.8300039)
    assert_almost_equal(f.dx_dphi, -0.0292052)
    assert_almost_equal(f.dy_dlam, 0.0243244)
    assert_almost_equal(f.dy_dphi, 0.9965495)


def test_get_factors_nan_inf():
    # reference test/test_proj.py:493-524
    p = Proj(3857)
    f = p.get_factors([0, np.nan, np.inf, 0], [np.nan, 2, 2, np.inf])
    for field in f:
        assert_almost_equal(field, [np.inf] * 4)


def test_get_factors_errcheck():
    p = Proj(3857)
    with pytest.raises(RuntimeError):
        p.get_factors(longitude=40, latitude=70, errcheck=True,
                      radians=True)  # lat 70 rad is out of range


def test_transform_bounds_densify():
    # reference test/test_transformer.py:1449-1502
    t = Transformer.from_crs(
        "EPSG:4326",
        "+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 +a=6370997 "
        "+b=6370997 +units=m +no_defs")
    assert np.allclose(
        t.transform_bounds(40, -120, 64, -80, densify_pts=0),
        (-1684649.41338, -350356.81377, 1684649.41338, 2234551.18559))
    assert np.allclose(
        t.transform_bounds(40, -120, 64, -80, densify_pts=100),
        (-1684649.41338, -555777.79210, 1684649.41338, 2234551.18559))
    with pytest.raises(RuntimeError):
        t.transform_bounds(40, -120, 64, -80, densify_pts=-1)


def test_transform_bounds_xy_radians():
    t = Transformer.from_crs(
        "EPSG:4326",
        "+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 +a=6370997 "
        "+b=6370997 +units=m +no_defs", always_xy=True)
    got = t.transform_bounds(np.radians(-120), np.radians(40),
                             np.radians(-80), np.radians(64),
                             densify_pts=100, radians=True)
    assert np.allclose(
        got, (-1684649.41338, -555777.79210, 1684649.41338, 2234551.18559))


def test_bbox_predicates():
    # reference pyproj/aoi.py:103-139
    a = BBox(0, 0, 10, 10)
    assert a.intersects(BBox(5, 5, 15, 15))
    assert not a.intersects(BBox(11, 11, 15, 15))
    assert a.contains(BBox(2, 2, 8, 8))
    assert not a.contains(BBox(5, 5, 15, 15))
    with pytest.raises(ValueError):
        AreaOfInterest(float("nan"), 0, 10, 10)


def test_geometry_ops():
    # reference test/test_geod.py geometry goldens (GeoJSON input here)
    g = Geod(ellps="WGS84")
    assert g.geometry_length({"type": "Point", "coordinates": (1, 2)}) == 0
    assert_almost_equal(
        g.geometry_area_perimeter(
            {"type": "LineString", "coordinates": [(1, 2), (3, 4)]}),
        (0.0, 627176.7944251911), decimal=2)
    tri = {"type": "Polygon", "coordinates": [[(1, 2), (3, 4), (5, 2)]]}
    assert_almost_equal(g.geometry_area_perimeter(tri),
                        (-49187690467.58623, 1072185.2103813463), decimal=2)
    # polygon with hole (reference test/test_geod.py:83-101)
    poly = {"type": "Polygon", "coordinates": [
        [(1, 1), (10, 1), (10, 10), (1, 10)],       # CCW exterior
        [(1, 2), (3, 4), (5, 2)],                   # hole
    ]}
    area, perim = g.geometry_area_perimeter(poly)
    assert_almost_equal(area, 944373881400.3394, decimal=2)
    assert_almost_equal(perim, 3979008.0359657984, decimal=2)
    multi = {"type": "MultiPolygon",
             "coordinates": [tri["coordinates"], tri["coordinates"]]}
    assert_almost_equal(g.geometry_area_perimeter(multi),
                        (-98375380935.17245, 2144370.4207626926), decimal=2)


def test_catalog_api(spark):
    from pyproj_spark import catalog_api as ca
    assert ca.get_authorities(spark) == ["EPSG", "ESRI", "IGNF", "OGC"]
    codes = ca.get_codes(spark, "EPSG", "GEOGRAPHIC_2D_CRS")
    assert 4326 in codes and 4267 in codes
    # AOI filtering: Greece bbox should keep GGRS87 but drop OSGB36
    aoi = AreaOfInterest(20.0, 35.0, 28.0, 41.0)
    names = [r["datum"] for r in ca.query_crs_info(
        spark, "EPSG", ["GEOGRAPHIC_2D_CRS"], aoi).collect()]
    assert "GGRS87" in names and "OSGB36" not in names
    # UTM finder: San Francisco -> zone 10 north
    utm = ca.query_utm_crs_info(
        spark, "WGS84", AreaOfInterest(-123, 37, -122, 38)).collect()
    assert [r["code"] for r in utm] == [32610]
    assert len(ca.get_ellps_map()) > 10
    assert ca.get_units_map()["US survey foot"]["to_meter"] == \
        pytest.approx(0.30480060960121924)
    assert ca.get_database_metadata("DATABASE.LAYOUT.VERSION.MAJOR") == "1"


def test_transformer_group():
    from pyproj_spark.catalog_api import TransformerGroup
    tg = TransformerGroup("EPSG:4326", "EPSG:4121")
    assert tg.best_available
    assert len(tg.operations) == 2
    # sort contract: real op (accuracy known) before ballpark (unknown)
    assert not tg.operations[0].is_ballpark
    assert tg.operations[1].is_ballpark
    assert len(tg.transformers) == 2


def test_crs_component_accessors():
    # reference pyproj/crs/crs.py:1093-1172 accessor surface
    crs = CRS.from_epsg(4326)
    ax = crs.axis_info
    assert ax[0].direction == "north" and ax[1].direction == "east"
    assert crs.datum.name == "WGS84"
    assert crs.prime_meridian.longitude == 0.0
    w, s, e, n = crs.area_of_use.bounds
    assert (w, s, e, n) == (-180, -90, 180, 90)
    p = CRS.from_epsg(2263)
    assert p.axis_info[0].unit_name == "US survey foot"
    assert p.datum.ellipsoid.name == "GRS80"
    g = CRS.from_epsg(4121).area_of_use
    assert 19 < g.west < 20 and g.north < 42
    assert CRS.from_epsg(4978).axis_info[0].direction == "geocentricX"



def test_top_level_namespace():
    # the reference's pyproj/__init__.py:75-89 __all__ resolves here too
    import pyproj_spark as pp
    for n in pp.__all__:
        assert getattr(pp, n) is not None, n
    assert "tmerc" in pp.pj_list
    assert "WGS84" in pp.pj_ellps
    assert pp.Geod(ellps="WGS84").a == 6378137.0


def test_proj_definition_and_exact_same():
    p = Proj("EPSG:32633")
    d = p.definition_string()
    assert "+proj=utm" in d or "+proj=tmerc" in d
    assert "+proj=longlat" in p.to_latlong_def()
    assert p.is_exact_same(Proj("EPSG:32633"))
    assert not p.is_exact_same(Proj("EPSG:32634"))
    # == is looser than is_exact_same (utm vs expanded tmerc)
    from pyproj_spark.crs.crs import CRS
    a = CRS.from_proj4("+proj=utm +zone=33 +ellps=WGS84")
    b = CRS.from_epsg(32633)
    assert a == b and not a.is_exact_same(b)  # names differ


def test_crs_coordinate_operation_property():
    from pyproj_spark.crs.crs import CRS
    op = CRS.from_epsg(32633).coordinate_operation
    assert op.method_name == "Transverse Mercator"
    assert op.method_code == 9807
    vals = {p.name: p.value for p in op.params}
    assert vals["Longitude of natural origin"] == 15.0
    assert vals["Scale factor at natural origin"] == 0.9996
    assert CRS.from_epsg(4326).coordinate_operation is None


def test_exception_types():
    # reference pyproj/exceptions.py contract: bad CRS input raises
    # CRSError (a ProjError/RuntimeError), errcheck raises ProjError,
    # geod argument misuse raises GeodError
    import pytest
    from pyproj_spark.crs.crs import CRS
    from pyproj_spark.exceptions import CRSError, GeodError, ProjError
    from pyproj_spark.kernels.geod import Geod
    from pyproj_spark.plans.spec import Transformer

    with pytest.raises(CRSError):
        CRS.from_user_input("not a crs at all !!")
    with pytest.raises(CRSError):
        CRS.from_epsg(999999)
    assert issubclass(CRSError, ProjError)
    with pytest.raises(ProjError):
        Transformer.from_crs(4326, 3857, always_xy=True).transform(
            200.0, 95.0, errcheck=True)
    with pytest.raises(GeodError):
        Geod(ellps="WGS84").inv_intermediate(0, 0, 10, 10, npts=5,
                                             del_s=1000.0)


def test_unknown_projection_raises_crs_error():
    """Reference test_exception_logging.py:8-14: an unknown projection
    name fails at construction with CRSError/ProjError."""
    import pytest

    from pyproj_spark.crs.crs import CRS
    from pyproj_spark.exceptions import CRSError, ProjError
    from pyproj_spark.proj import Proj
    with pytest.raises(CRSError, match="Internal Proj Error"):
        CRS("+proj=bobbyjoe")
    with pytest.raises(ProjError, match="Internal Proj Error"):
        Proj("+proj=bobbyjoe")
