"""Typed CRS builder classes + coordinate-operation builders
(reference ``pyproj/crs/crs.py:1798-2107`` and
``pyproj/crs/coordinate_operation.py``; behavioral goldens from
``test/crs/test_crs_cf.py`` / ``test/crs/test_crs.py`` construction
tests)."""

from __future__ import annotations

import pickle

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from pyproj_spark.crs import (
    CRS,
    BoundCRS,
    CompoundCRS,
    DerivedGeographicCRS,
    GeocentricCRS,
    GeographicCRS,
    ProjectedCRS,
    VerticalCRS,
)
from pyproj_spark.crs.builders import CustomDatum, CustomEllipsoid
from pyproj_spark.crs.coordinate_operation import (
    AlbersEqualAreaConversion,
    GeostationarySatelliteConversion,
    LambertConformalConic2SPConversion,
    MercatorAConversion,
    PolarStereographicAConversion,
    RotatedLatitudeLongitudeConversion,
    ToWGS84Transformation,
    TransverseMercatorConversion,
    UTMConversion,
)
from pyproj_spark.plans.spec import Transformer


def test_geographic_crs_default_is_wgs84():
    crs = GeographicCRS()
    assert crs.is_geographic
    assert crs.datum_name == "WGS84"
    assert crs.ellipsoid.a == 6378137.0
    # params match the catalog 4326 entry -> confidence-70 hit, but not
    # a full (name + axis order) match
    assert crs.to_epsg() == 4326
    assert crs.to_epsg(min_confidence=100) is None


def test_geographic_crs_custom_datum():
    crs = GeographicCRS(
        name="mine",
        datum=CustomDatum(ellipsoid=CustomEllipsoid(
            name="myell", semi_major_axis=6378160.0,
            inverse_flattening=298.25)))
    assert crs.ellipsoid.a == 6378160.0
    assert_almost_equal(crs.ellipsoid.rf, 298.25)


def test_projected_crs_matches_catalog_utm():
    crs = ProjectedCRS(conversion=UTMConversion(33),
                       name="WGS 84 / UTM zone 33N")
    cat = CRS.from_epsg(32633)
    assert crs._key() == cat._key()
    # and transforms identically
    t1 = Transformer.from_crs(4326, crs, always_xy=True)
    t2 = Transformer.from_crs(4326, cat, always_xy=True)
    assert_almost_equal(t1.transform(15.5, 45.0),
                        t2.transform(15.5, 45.0), decimal=9)


def test_projected_crs_tmerc_conversion():
    conv = TransverseMercatorConversion(
        latitude_natural_origin=0, longitude_natural_origin=24,
        false_easting=500000, false_northing=0,
        scale_factor_natural_origin=0.9996)
    crs = ProjectedCRS(conversion=conv, name="Greek-Grid-like",
                       geodetic_crs=GeographicCRS(datum="GGRS87"))
    cat = CRS.from_epsg(2100)
    t1 = Transformer.from_crs(4326, crs, always_xy=True)
    t2 = Transformer.from_crs(4326, cat, always_xy=True)
    assert_almost_equal(t1.transform(24.5, 38.0),
                        t2.transform(24.5, 38.0), decimal=6)


def test_conversion_builders_produce_parsable_json():
    convs = [
        LambertConformalConic2SPConversion(30.0, -96.0, 29.5, 45.5),
        AlbersEqualAreaConversion(29.5, 45.5, 23.0, -96.0),
        MercatorAConversion(0.0, 10.0, 1.0, 2.0, 0.9),
        PolarStereographicAConversion(90.0, -45.0, 0.0, 0.0, 0.994),
        GeostationarySatelliteConversion("y", 35785831.0),
    ]
    for conv in convs:
        crs = ProjectedCRS(conversion=conv)
        assert crs.is_projected, conv.method_name
        # WKT + PROJJSON round trip preserves the conversion
        assert CRS.from_wkt(crs.to_wkt())._key() == crs._key()
        assert CRS.from_json(crs.to_json())._key() == crs._key()


def test_derived_geographic_rotated_pole():
    from pyproj_spark.crs.coordinate_operation import (
        PoleRotationNetCDFCFConversion,
    )
    import math
    conv = PoleRotationNetCDFCFConversion(
        grid_north_pole_latitude=37.5, grid_north_pole_longitude=177.5)
    crs = DerivedGeographicCRS(base_crs=GeographicCRS(), conversion=conv)
    t = Transformer.from_crs(4326, crs, always_xy=True)
    # the rotated north pole (true 177.5E, 37.5N per CF) maps to
    # rotated-lat 90 (output scaled by a — PROJ ob_tran convention)
    x, y = t.transform(177.5, 37.5)
    assert_almost_equal(y / 6378137.0, math.pi / 2, decimal=9)
    # a point on the rotated equator due "south" of the pole
    x, y = t.transform(177.5, 37.5 - 90.0)
    assert_almost_equal(y, 0.0, decimal=3)
    # roundtrip
    lon2, lat2 = t.transform(*t.transform(10.0, 50.0),
                             direction="INVERSE")
    assert_almost_equal((lon2, lat2), (10.0, 50.0), decimal=9)


def test_bound_crs_applies_towgs84():
    bound = BoundCRS(
        source_crs=GeographicCRS(datum=CustomDatum(ellipsoid="GRS80")),
        transformation=ToWGS84Transformation(
            None, -199.87, 74.79, 246.62))
    assert bound.towgs84 == (-199.87, 74.79, 246.62, 0.0, 0.0, 0.0, 0.0)
    # behaves like GGRS87 geographic
    t1 = Transformer.from_crs(bound, 4326, always_xy=True)
    t2 = Transformer.from_crs(4121, 4326, always_xy=True)
    assert_almost_equal(t1.transform(24.0, 38.0),
                        t2.transform(24.0, 38.0), decimal=9)


def test_vertical_and_compound_structural():
    v = VerticalCRS(name="NAVD88 height", datum="NAVD88",
                    geoid_model="GEOID12B")
    assert v.is_vertical and not v.is_projected
    assert "VERTCRS" in v.to_wkt() and "GEOIDMODEL" in v.to_wkt()
    assert v.to_json_dict()["type"] == "VerticalCRS"
    assert v.axis_info[0].direction == "up"
    comp = CompoundCRS(name="NAD83 + NAVD88",
                       components=[CRS.from_epsg(4269), v])
    assert comp.is_compound
    assert len(comp.sub_crs_list) == 2
    assert comp.to_wkt().startswith('COMPOUNDCRS["NAD83 + NAVD88"')
    assert [c["type"] for c in comp.to_json_dict()["components"]] == \
        ["GeographicCRS", "VerticalCRS"]
    # pickle round trip (broadcast requirement)
    for obj in (v, comp):
        rt = pickle.loads(pickle.dumps(obj))
        assert rt.name == obj.name and rt.kind == obj.kind
    # transforms must fail loudly, not silently
    with pytest.raises(Exception):
        Transformer.from_crs(v, 4326).transform(0.0, 0.0)


def test_geocentric_crs():
    crs = GeocentricCRS()
    assert crs.is_geocentric
    t = Transformer.from_crs(crs, 4978, always_xy=True)
    x, y, z = t.transform(1113194.0, 6378137.0, 0.0, radians=False) \
        if False else t.transform(3513638.0, 778956.0, 5248216.0)
    assert_almost_equal((x, y, z), (3513638.0, 778956.0, 5248216.0))


def test_ellipsoidal_3d_cs():
    """Ellipsoidal3DCS builder (reference coordinate_system.py:127):
    2D axes plus ellipsoidal height, usable in GeographicCRS."""
    from pyproj_spark.crs import Ellipsoidal3DCS, GeographicCRS
    cs = Ellipsoidal3DCS()
    axes = cs.to_json_dict()["axis"]
    assert len(axes) == 3
    assert axes[-1]["direction"] == "up"
    assert axes[-1]["name"] == "Ellipsoidal height"
    g = GeographicCRS(name="WGS 84 (3D)", ellipsoidal_cs=cs)
    assert len(g.to_json_dict()["coordinate_system"]["axis"]) == 3
