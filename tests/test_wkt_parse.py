"""WKT / PROJJSON / authority INPUT parsing + confidence-scored reverse
lookup (reference ``pyproj/crs/crs.py:362-575`` from_wkt/from_json/
from_authority and ``crs.py:1300-1377`` to_epsg/to_authority tiers;
behavioral goldens from ``test/crs/test_crs.py``)."""

from __future__ import annotations

import re

import pytest
from numpy.testing import assert_almost_equal

from pyproj_spark.crs import catalog
from pyproj_spark.crs.crs import CRS
from pyproj_spark.transformer_compat import Transformer

ALL_CODES = [row[1] for row in catalog.all_codes()]


def test_wkt_roundtrip_full_catalog():
    # from_wkt(to_wkt(crs)).to_epsg() == code for every bundled code,
    # both via the embedded ID and via content-based identification
    for code in ALL_CODES:
        crs = CRS.from_epsg(code)
        wkt = crs.to_wkt()
        assert CRS.from_wkt(wkt).to_epsg() == code
        stripped = re.sub(r',ID\["EPSG",%d\]\]$' % code, "]", wkt)
        assert 'ID["EPSG",%d]' % code not in stripped
        assert CRS.from_wkt(stripped).to_epsg() == code, code


def test_projjson_roundtrip_full_catalog():
    for code in ALL_CODES:
        crs = CRS.from_epsg(code)
        assert CRS.from_json(crs.to_json()).to_epsg() == code, code
        rt = CRS.from_json_dict(crs.to_json_dict())
        assert rt.kind == crs.kind and rt._key() == crs._key()


def test_from_wkt1_gdal():
    # WKT1-GDAL shape: PROJECTION/PARAMETER names + AUTHORITY nodes
    wkt1 = (
        'PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",15],'
        'PARAMETER["scale_factor",0.9996],'
        'PARAMETER["false_easting",500000],'
        'PARAMETER["false_northing",0],UNIT["metre",1],'
        'AUTHORITY["EPSG","32633"]]')
    c = CRS.from_wkt(wkt1)
    assert c.to_epsg() == 32633
    assert c.proj_params["proj"] == "tmerc"
    assert c.proj_params["lon_0"] == 15.0
    # without AUTHORITY: content-based identify still lands on 32633
    assert CRS.from_wkt(
        wkt1.replace(',AUTHORITY["EPSG","32633"]]', "]")).to_epsg() == 32633


def test_from_wkt2_proj_ensemble_style():
    # PROJ 9.x projinfo output uses datum ENSEMBLE + USAGE nodes
    wkt2 = (
        'GEOGCRS["WGS 84",'
        'ENSEMBLE["World Geodetic System 1984 ensemble",'
        'MEMBER["World Geodetic System 1984 (Transit)"],'
        'ELLIPSOID["WGS 84",6378137,298.257223563,'
        'LENGTHUNIT["metre",1]],ENSEMBLEACCURACY[2.0]],'
        'PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],'
        'CS[ellipsoidal,2],'
        'AXIS["geodetic latitude (Lat)",north,ORDER[1],'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'AXIS["geodetic longitude (Lon)",east,ORDER[2],'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'USAGE[SCOPE["Horizontal component of 3D system."],'
        'AREA["World."],BBOX[-90,-180,90,180]],ID["EPSG",4326]]')
    c = CRS.from_wkt(wkt2)
    assert c.is_geographic and c.datum_name == "WGS84"
    assert c.axis == "neu" and c.to_epsg() == 4326


def test_parsed_wkt_transforms_identically():
    # a CRS rebuilt from WKT must produce bit-identical transforms
    for code in (32633, 2100, 3031, 5070, 3376):
        crs = CRS.from_epsg(code)
        rt = CRS.from_wkt(crs.to_wkt())
        t1 = Transformer.from_crs(4326, crs, always_xy=True)
        t2 = Transformer.from_crs(4326, rt, always_xy=True)
        assert_almost_equal(t1.transform(15.5, 45.0),
                            t2.transform(15.5, 45.0), decimal=9)


def test_to_epsg_confidence_tiers():
    # reference crs.py:1300-1340 semantics: CRS84 (lon/lat axis order)
    # identifies as 4326 at the default min_confidence=70, not at 100
    crs84 = CRS.from_authority("OGC", "CRS84")
    assert crs84.to_epsg() == 4326
    assert crs84.to_epsg(min_confidence=100) is None
    assert crs84.to_authority() == ("EPSG", "4326")
    # catalog-born CRS identifies at 100
    assert CRS.from_epsg(4326).to_epsg(min_confidence=100) == 4326
    # proj-string form of a catalog CRS: params match -> >= 70
    c = CRS.from_proj4("+proj=utm +zone=15 +datum=NAD83")
    assert c.to_epsg() == 26915
    # unknown CRS -> None
    assert CRS.from_proj4("+proj=tmerc +lon_0=1.23 +ellps=WGS84"
                          ).to_epsg() is None


def test_from_user_input_variants():
    assert CRS.from_user_input("urn:ogc:def:crs:EPSG::4326").to_epsg() \
        == 4326
    assert CRS.from_user_input(
        "urn:ogc:def:crs:OGC:1.3:CRS84").to_epsg() == 4326
    wkt = CRS.from_epsg(3857).to_wkt()
    assert CRS.from_user_input(wkt).to_epsg() == 3857
    js = CRS.from_epsg(3857).to_json()
    assert CRS.from_user_input(js).to_epsg() == 3857
    assert CRS.from_user_input(
        CRS.from_epsg(3857).to_json_dict()).to_epsg() == 3857
    assert CRS.from_user_input(("EPSG", "4269")).to_epsg() == 4269


def test_boundcrs_wkt_towgs84():
    # BOUNDCRS carries the datum-shift leg as ABRIDGEDTRANSFORMATION
    crs = CRS.from_epsg(2100)  # GGRS87, 3-param towgs84
    wkt = (
        'BOUNDCRS[SOURCECRS[' + crs.to_wkt() + '],'
        'TARGETCRS[' + CRS.from_epsg(4326).to_wkt() + '],'
        'ABRIDGEDTRANSFORMATION["GGRS87 to WGS 84",'
        'METHOD["Geocentric translations",ID["EPSG",9603]],'
        'PARAMETER["X-axis translation",-199.87],'
        'PARAMETER["Y-axis translation",74.79],'
        'PARAMETER["Z-axis translation",246.62]]]')
    c = CRS.from_wkt(wkt)
    assert c.towgs84 == (-199.87, 74.79, 246.62)
    assert c.is_projected


def test_crs_pickles_through_wkt_srs():
    import pickle
    crs = CRS.from_wkt(CRS.from_epsg(26915).to_wkt())
    rt = pickle.loads(pickle.dumps(crs))
    assert rt._key() == crs._key() and rt.to_epsg() == 26915


def test_equality_canonicalization():
    # utm form == expanded tmerc form (same conversion)
    assert CRS.from_proj4("+proj=utm +zone=33 +ellps=WGS84") == \
        CRS.from_proj4("+proj=tmerc +lat_0=0 +lon_0=15 +k_0=0.9996 "
                       "+x_0=500000 +y_0=0 +ellps=WGS84")


def test_typed_errors_on_malformed_inputs():
    # exception contract: bad authority codes and truncated WKT raise
    # CRSError, never bare ValueError/IndexError (reference raises
    # pyproj.exceptions.CRSError for both)
    import pytest
    from pyproj_spark.crs.crs import CRS
    from pyproj_spark.crs.wkt_parse import parse_wkt
    from pyproj_spark.exceptions import CRSError
    with pytest.raises(CRSError):
        CRS.from_user_input("EPSG:ABC")
    with pytest.raises(CRSError):
        CRS.from_authority("EPSG", "not-a-code")
    full = CRS.from_epsg(4326).to_wkt()
    with pytest.raises(CRSError):
        parse_wkt(full[: len(full) // 2])
    with pytest.raises(CRSError):
        CRS.from_wkt('GEOGCRS["truncated", DATUM["x"')


def test_crs_predicates_bound_derived_deprecated():
    # reference test/crs/test_crs.py predicate cases, catalog-subset
    from pyproj_spark.crs.crs import CRS
    # bound: explicit towgs84 in the input; catalog-implied shift is not
    b = CRS.from_user_input("+proj=geocent +datum=WGS84 +towgs84=0,0,0")
    assert b.is_bound
    assert not CRS.from_epsg(4326).is_bound
    assert not CRS.from_epsg(4267).is_bound  # datum-implied shift only
    # bound CRS: no direct authority match, but source_crs resolves
    assert b.list_authority() == []
    src = b.source_crs
    assert src is not None and not src.is_bound
    m = src.list_authority(min_confidence=25)
    assert any(x.code == "4978" for x in m)
    assert CRS.from_epsg(4326).source_crs is None
    # derived: projected and rotated-pole yes, plain geographic no
    assert CRS.from_epsg(32610).is_derived
    assert CRS.from_user_input(
        "+proj=ob_tran +o_proj=longlat +o_lat_p=0 +o_lon_p=0 +lon_0=0"
    ).is_derived
    assert not CRS.from_user_input("+proj=latlon").is_derived
    # deprecated + successor (reference test_non_deprecated pattern)
    dep = CRS.from_epsg(4140)
    assert dep.is_deprecated
    succ = dep.get_non_deprecated()
    assert len(succ) == 1
    assert succ[0].epsg_code == 4617 and not succ[0].is_deprecated
    assert not CRS.from_epsg(4326).is_deprecated
    assert CRS.from_epsg(4326).get_non_deprecated() == []
    # list_authority: exact catalog identity
    la = CRS.from_epsg(4326).list_authority()
    assert [(x.auth_name, x.code, x.confidence) for x in la] == [
        ("EPSG", "4326", 100)]
    assert CRS.from_epsg(4326).list_authority(auth_name="IGNF") == []


def test_component_accessor_surface():
    """utm_zone / coordinate_system / sub_crs_list / get_geod —
    reference pyproj/crs/crs.py:504-518,1038-1071,1153-1161 and
    test/crs/test_crs.py utm_zone cases."""
    assert CRS.from_epsg(32633).utm_zone == "33N"
    assert CRS.from_epsg(32733).utm_zone == "33S"
    assert CRS.from_epsg(4326).utm_zone is None
    assert CRS.from_epsg(3857).utm_zone is None
    # bound CRS delegates to its source (reference crs.py:1060-1061)
    b = CRS.from_user_input(
        "+proj=utm +zone=17 +datum=NAD27 +towgs84=-8,160,176")
    assert b.is_bound and b.utm_zone == "17N"
    # coordinate_system names follow proj_create_cs conventions
    assert CRS.from_epsg(4326).coordinate_system.name == "ellipsoidal"
    assert CRS.from_epsg(32633).coordinate_system.name == "cartesian"
    assert len(CRS.from_epsg(4326).coordinate_system.axis_list) == 2
    # catalog CRSs are never compound
    assert CRS.from_epsg(32633).sub_crs_list == []
    # get_geod carries the CRS ellipsoid into a Geod
    g = CRS.from_epsg(4267).get_geod()  # NAD27 -> Clarke 1866
    assert abs(g.a - 6378206.4) < 1e-6
    assert abs(1.0 / g.f - 294.978698214) < 1e-6


def test_to_3d_to_2d():
    """CRS.to_3d/to_2d — reference pyproj/crs/crs.py:1775-1860 and
    test/crs/test_crs.py to_3d cases: EPSG twins remap, axis lists
    grow/shrink, serialization round-trips preserve dimensionality."""
    c = CRS.from_epsg(4326)
    c3 = c.to_3d()
    assert c3.to_epsg() == 4979 and c3.n_dim == 3
    assert [a.direction for a in c3.axis_info] == ["north", "east", "up"]
    assert c3 != c and c3.to_2d() == c
    assert c3.to_3d() is c3  # already 3D: identity
    assert CRS.from_epsg(4258).to_3d().to_epsg() == 4937
    # un-twinned code: promoted copy drops the EPSG id
    p3 = CRS.from_epsg(32633).to_3d()
    assert p3.n_dim == 3 and p3.to_epsg() is None
    assert p3.axis_info[-1].direction == "up"
    # WKT + PROJJSON round trips keep the third axis
    assert "CS[ellipsoidal,3]" in c3.to_wkt()
    assert CRS.from_wkt(c3.to_wkt()) == c3
    assert "CS[Cartesian,3]" in p3.to_wkt()
    assert CRS.from_wkt(p3.to_wkt()) == p3
    assert len(c3.to_json_dict()["coordinate_system"]["axis"]) == 3
    assert CRS.from_json_dict(c3.to_json_dict()) == c3
    # custom name clears the ASSIGNED code, but the params-based
    # reverse lookup still identifies the 3D twin
    named = c.to_3d(name="WGS 84 (3D custom)")
    assert named.name == "WGS 84 (3D custom)"
    assert named.epsg_code is None and named.to_epsg() == 4979
    # pickling restores dimensionality (srs strings can't express it)
    import pickle
    assert pickle.loads(pickle.dumps(p3)) == p3
