"""Gridded datum shift + grid inventory + get_last_used_operation
(reference surfaces: ``pyproj/transformer.py:362-406`` grid operations,
``pyproj/sync.py:214-280`` inventory, ``transformer.py:559-574``
last-used operation)."""

from __future__ import annotations

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from pyproj_spark.aoi import BBox
from pyproj_spark.kernels.grids import (
    _synth_dlat_sec,
    _synth_dlon_sec,
    build_synthetic_conus_grid,
    grid_for,
)
from pyproj_spark.plans.spec import (
    OP_BALLPARK,
    OP_CONVERSION,
    OP_GRID,
    OP_HELMERT3,
    OP_HELMERT7,
    OP_NOOP,
    Transformer,
)
from pyproj_spark.sync import get_transform_grid_list


def test_bilinear_exact_at_nodes_and_midpoints():
    g = build_synthetic_conus_grid()
    # exactly on nodes: interpolation returns the node value
    for ix, iy in [(0, 0), (10, 7), (236, 104)]:
        lon = g.west + ix * g.dx
        lat = g.south + iy * g.dy
        dlon, dlat = g.interpolate(np.array([lon]), np.array([lat]))
        assert_almost_equal(dlon[0] * 3600, _synth_dlon_sec(ix, iy),
                            decimal=10)
        assert_almost_equal(dlat[0] * 3600, _synth_dlat_sec(ix, iy),
                            decimal=10)
    # cell midpoint: mean of the 4 corners
    lon = g.west + 3.5 * g.dx
    lat = g.south + 4.5 * g.dy
    dlon, _ = g.interpolate(np.array([lon]), np.array([lat]))
    corners = [_synth_dlon_sec(ix, iy) for ix in (3, 4) for iy in (4, 5)]
    assert_almost_equal(dlon[0] * 3600, np.mean(corners), decimal=10)


def test_grid_inverse_roundtrip():
    g = build_synthetic_conus_grid()
    lon = np.linspace(-120.0, -70.0, 40)
    lat = np.linspace(25.0, 49.0, 40)
    glon, glat = g.apply(lon, lat)
    blon, blat = g.apply_inverse(glon, glat)
    assert_almost_equal(blon, lon, decimal=9)
    assert_almost_equal(blat, lat, decimal=9)


def test_registry():
    g, inv = grid_for("NAD27", "NAD83")
    assert g is not None and inv is False
    g2, inv2 = grid_for("NAD83", "NAD27")
    assert g2 is g and inv2 is True
    assert grid_for("WGS84", "OSGB36") == (None, False)


def test_transform_uses_grid_in_coverage():
    t = Transformer.from_crs(4267, 4269, always_xy=True)
    g = build_synthetic_conus_grid()
    lon, lat = -100.0, 40.0
    glon, glat = t.transform(lon, lat)
    elon, elat = g.apply(np.array([lon]), np.array([lat]))
    assert_almost_equal((glon, glat), (elon[0], elat[0]), decimal=12)
    assert t.get_last_used_operation().op_id == OP_GRID
    # inverse direction recovers the NAD27 point
    ti = Transformer.from_crs(4269, 4267, always_xy=True)
    blon, blat = ti.transform(glon, glat)
    assert_almost_equal((blon, blat), (lon, lat), decimal=9)
    assert ti.get_last_used_operation().op_id == OP_GRID


def test_transform_falls_back_outside_coverage():
    # Paris is outside the CONUS grid -> Helmert 3-param fallback
    t = Transformer.from_crs(4267, 4269, always_xy=True)
    t.transform(2.35, 48.85)
    assert t.get_last_used_operation().op_id == OP_HELMERT3
    # mixed batch: per-row ops differ
    t.transform(np.array([-100.0, 2.35]), np.array([40.0, 48.85]))
    assert list(t._last_ops) == [OP_GRID, OP_HELMERT3]
    # per-transformer state: a second facade on the SAME memoized kernel
    # must not see (or clobber) this one's ops
    from pyproj_spark.plans.spec import Transformer as _T
    t2 = _T.from_crs(4267, 4269, always_xy=True)
    assert t2._kernel is t._kernel
    t2.transform(2.35, 48.85)
    assert list(t._last_ops) == [OP_GRID, OP_HELMERT3]
    assert t2.get_last_used_operation().op_id == OP_HELMERT3


def test_last_used_operation_classification():
    t = Transformer.from_crs(4326, 3857, always_xy=True)
    with pytest.raises(RuntimeError, match="transform method"):
        t.get_last_used_operation()
    t.transform(10.0, 50.0)
    assert t.get_last_used_operation().op_id == OP_CONVERSION
    t = Transformer.from_crs(4326, 4326)
    t.transform(10.0, 50.0)
    assert t.get_last_used_operation().op_id == OP_NOOP
    t = Transformer.from_crs(4326, 27700, always_xy=True)  # OSGB 7-param
    t.transform(-2.0, 52.0)
    assert t.get_last_used_operation().op_id == OP_HELMERT7
    # ballpark: no datum info on one side
    t = Transformer.from_crs("+proj=longlat +a=6378137 +f=0.0033",
                             4326, always_xy=True)
    t.transform(10.0, 50.0)
    assert t.get_last_used_operation().op_id == OP_BALLPARK


def test_grid_through_projection():
    # NAD27 geographic -> NAD83 UTM 15N: grid leg + projection leg
    t = Transformer.from_crs(4267, 26915, always_xy=True)
    tn = Transformer.from_crs(4269, 26915, always_xy=True)
    g = build_synthetic_conus_grid()
    elon, elat = g.apply(np.array([-93.2]), np.array([41.5]))
    x27, y27 = t.transform(-93.2, 41.5)
    xn, yn = tn.transform(elon[0], elat[0])
    assert_almost_equal((x27, y27), (xn, yn), decimal=6)
    assert t.get_last_used_operation().op_id == OP_GRID


def test_get_transform_grid_list_filters():
    # not-downloaded only (default): the registered synthetic grid is
    # "already downloaded" and excluded
    names = {f["properties"]["name"] for f in get_transform_grid_list()}
    assert "us_synth_conus.tif" not in names
    allf = get_transform_grid_list(include_already_downloaded=True)
    all_names = {f["properties"]["name"] for f in allf}
    assert "us_synth_conus.tif" in all_names
    # bbox intersects (CONUS window)
    conus = BBox(west=-120.0, south=30.0, east=-80.0, north=45.0)
    hits = get_transform_grid_list(bbox=conus,
                                   include_already_downloaded=True)
    hit_names = {f["properties"]["name"] for f in hits}
    assert "us_noaa_conshpgn.tif" in hit_names
    assert "de_adv_BETA2007.tif" not in hit_names
    assert "us_nga_egm96_15.tif" in hit_names  # world coverage kept
    nohits = get_transform_grid_list(bbox=conus,
                                     include_world_coverage=False,
                                     include_already_downloaded=True)
    assert "us_nga_egm96_15.tif" not in {
        f["properties"]["name"] for f in nohits}
    # contains: grid extent must contain the query bbox
    within = get_transform_grid_list(bbox=BBox(-100.0, 35.0, -95.0, 40.0),
                                     spatial_test="contains",
                                     include_already_downloaded=True)
    wn = {f["properties"]["name"] for f in within}
    assert "us_noaa_conshpgn.tif" in wn and "ca_nrc_ntv2_0.tif" not in wn
    # property filters
    assert all(f["properties"]["source_id"] == "us_noaa"
               for f in get_transform_grid_list(
                   source_id="us_noaa", include_already_downloaded=True))
    assert len(get_transform_grid_list(
        filename="BETA2007", include_already_downloaded=True)) == 1
    with pytest.raises(ValueError):
        get_transform_grid_list(spatial_test="touches")


def test_download_gated_on_network_toggle(monkeypatch):
    # real downloader (tests/test_network.py drives it end-to-end);
    # with networking off it raises the guidance error
    import pyproj_spark.network as net
    from pyproj_spark.sync import _download_resource_file
    monkeypatch.delenv("PROJ_NETWORK", raising=False)
    monkeypatch.setattr(net, "_NETWORK_ENABLED", None)
    with pytest.raises(OSError, match="network is disabled"):
        _download_resource_file("https://cdn.proj.org/x.tif", "x.tif")


def test_transformer_group_grid_candidates():
    from pyproj_spark.catalog_api import TransformerGroup
    from pyproj_spark.aoi import AreaOfInterest
    g = TransformerGroup(4267, 4269)
    names = [o.name for o in g.operations]
    # registered grid op sorts first (best accuracy), helmert next,
    # ballpark last
    assert "hgridshift us_synth_conus.tif" in names[0]
    assert any("Helmert" in n for n in names)
    assert names[-1] == "Ballpark geographic offset"
    # inventory grids that aren't downloadable here -> unavailable
    un = [o.name for o in g.unavailable_operations]
    assert any("us_noaa_conshpgn" in n for n in un)
    # superseded grids hidden by default, included on request
    assert not any("1986_conus" in n for n in un)
    g2 = TransformerGroup(4267, 4269, allow_superseded=True)
    assert any("1986_conus" in o.name
               for o in g2.unavailable_operations)
    # AOI outside the grid drops the grid candidate
    eu = AreaOfInterest(0.0, 45.0, 10.0, 55.0)
    g3 = TransformerGroup(4267, 4269, area_of_interest=eu)
    assert not any("hgridshift" in o.name for o in g3.operations)
    assert g3.best_available


def test_transformer_group_download_grids_warns():
    import warnings
    from pyproj_spark.catalog_api import TransformerGroup
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        TransformerGroup(4267, 4269, download_grids=True)
    assert any("cannot be downloaded" in str(w.message) for w in rec)


def test_proj_operations_and_prime_meridians_maps():
    from pyproj_spark.catalog_api import (get_prime_meridians_map,
                                          get_proj_operations_map)
    ops = get_proj_operations_map()
    assert ops["tmerc"].startswith("Transverse")
    assert "poly" in ops and "geocent" in ops
    pm = get_prime_meridians_map()
    assert pm["greenwich"] == "0dE"
    assert "paris" in pm and len(pm) >= 13


def test_transformer_metadata_props():
    # reference transformer.py:484-558 property surface
    t = Transformer.from_crs(4267, 26915, always_xy=True)
    assert "hgridshift" in t.definition and "pipeline" in t.definition
    assert "Gridded datum shift" in t.description
    assert t.accuracy == 0.15
    assert t.has_inverse
    assert "us_synth_conus" in t.remarks
    ops = t.operations
    assert [o.method_name for o in ops][-1] == "utm"
    assert any(o.method_name == "hgridshift" for o in ops)
    aou = t.area_of_use
    # NAD83's area of use crosses the antimeridian (west > east is
    # legal there); just assert the 4-tuple shape and lat sanity
    assert len(aou.bounds) == 4 and aou.south <= aou.north
    # noop + conversion + ballpark tiers
    t = Transformer.from_crs(4326, 4326)
    assert t.accuracy == 0.0 and t.definition == "+proj=noop"
    t = Transformer.from_crs(4326, 3857, always_xy=True)
    assert t.accuracy == 0.0 and "webmerc" in t.definition
    t = Transformer.from_crs("+proj=longlat +a=6378137 +f=0.0033", 4326,
                             always_xy=True)
    assert t.accuracy == -1.0


def test_cli():
    from pyproj_spark.__main__ import main
    assert main([]) == 0
    assert main(["-v"]) == 0
    assert main(["sync", "--list-files",
                 "--include-already-downloaded"]) == 0
    assert main(["sync", "--all"]) == 1  # downloads unavailable


def test_datadir_resolution(tmp_path, monkeypatch):
    """datadir.py — reference pyproj/datadir.py:22-118 semantics:
    explicit set wins, then the env var, then the packaged dir;
    DataDirError when nothing resolves."""
    import pyproj_spark.datadir as dd
    from pyproj_spark.exceptions import DataDirError

    monkeypatch.setattr(dd, "_USER_SET_DIR", None)
    monkeypatch.delenv("PYPROJ_SPARK_DATA", raising=False)
    # the packaged data/ dir does not ship in this repo -> error
    import pytest as _pytest
    with _pytest.raises(DataDirError):
        dd.get_data_dir()
    # env var resolves
    d1 = tmp_path / "env_data"
    d1.mkdir()
    monkeypatch.setenv("PYPROJ_SPARK_DATA", str(d1))
    assert dd.get_data_dir() == str(d1)
    # explicit set wins over the env var
    d2 = tmp_path / "set_data"
    d2.mkdir()
    dd.set_data_dir(str(d2))
    try:
        assert dd.get_data_dir() == str(d2)
    finally:
        dd._USER_SET_DIR = None
    # user dir is deterministic and creatable
    u = dd.get_user_data_dir(create=True)
    import os
    assert os.path.isdir(u) and u.endswith("pyproj_spark")


# ------------------------------------------------ vertical / geoid leg

def test_geoid_grid_bilinear_matches_closed_form():
    import numpy as np

    from pyproj_spark.kernels.grids import (_synth_geoid_m,
                                            build_synthetic_geoid)
    g = build_synthetic_geoid()
    # at exact nodes the bilinear value IS the node value
    lon, lat = -100.0, 40.0
    ix, iy = lon + 180.0, lat + 90.0
    got = g.interpolate(np.array([lon]), np.array([lat]))[0]
    assert abs(got - _synth_geoid_m(ix, iy)) < 1e-12
    # midpoint = average of the 4 corners
    got_mid = g.interpolate(np.array([lon + 0.5]),
                            np.array([lat + 0.5]))[0]
    corners = [_synth_geoid_m(ix + a, iy + b)
               for a in (0, 1) for b in (0, 1)]
    assert abs(got_mid - sum(corners) / 4.0) < 1e-12


def test_compound_crs_transform_applies_geoid():
    import numpy as np

    from pyproj_spark.crs.builders import CompoundCRS, VerticalCRS
    from pyproj_spark.kernels.grids import geoid_for
    from pyproj_spark.plans.spec import Transformer
    vert = VerticalCRS("Synth height", "NAVD88 (synth)",
                       geoid_model="SYNTH2025")
    comp = CompoundCRS("WGS 84 + synth height", ["EPSG:4326", vert])
    t = Transformer.from_crs(comp, "EPSG:4979", always_xy=True)
    lon, lat, H = -100.0, 40.0, 100.0
    x, y, h = t.transform(lon, lat, H)
    N = float(geoid_for("SYNTH2025").interpolate(
        np.array([lon]), np.array([lat]))[0])
    assert abs(h - (H + N)) < 1e-9
    assert (x, y) == (lon, lat)
    # inverse restores the gravity-related height
    _, _, H2 = t.transform(x, y, h, direction="INVERSE")
    assert abs(H2 - H) < 1e-9
    # op id reports the vertical grid leg
    assert t.get_last_used_operation().name \
        == "Vertical geoid-grid shift (vgridshift)"


def test_compound_to_projected_keeps_vertical_leg():
    import numpy as np

    from pyproj_spark.crs.builders import CompoundCRS, VerticalCRS
    from pyproj_spark.kernels.grids import geoid_for
    from pyproj_spark.plans.spec import Transformer
    vert = VerticalCRS("Synth height", "NAVD88 (synth)",
                       geoid_model="SYNTH2025")
    comp = CompoundCRS("WGS 84 + synth height", ["EPSG:4326", vert])
    t = Transformer.from_crs(comp, "EPSG:3857", always_xy=True)
    lon, lat, H = 10.0, 50.0, 25.0
    _, _, h = t.transform(lon, lat, H)
    N = float(geoid_for("SYNTH2025").interpolate(
        np.array([lon]), np.array([lat]))[0])
    assert abs(h - (H + N)) < 1e-9


def test_vertical_only_pair_and_ballpark_passthrough():
    from pyproj_spark.crs.builders import CompoundCRS, VerticalCRS
    from pyproj_spark.exceptions import CRSError
    from pyproj_spark.plans.spec import Transformer
    a = VerticalCRS("A", "NAVD88 (synth)", geoid_model="SYNTH2025")
    b = VerticalCRS("B", "SYNTH GEOID 2025")
    # same registered surface on both sides -> H unchanged
    _, _, h = Transformer.from_crs(a, b).transform(-100.0, 40.0, 7.0)
    assert abs(h - 7.0) < 1e-12
    # unregistered vertical datum -> ballpark z passthrough
    u = VerticalCRS("U", "NO-SUCH-VDATUM")
    comp = CompoundCRS("WGS + U", ["EPSG:4326", u])
    _, _, hb = Transformer.from_crs(comp, "EPSG:4979",
                                    always_xy=True) \
        .transform(-100.0, 40.0, 7.0)
    assert abs(hb - 7.0) < 1e-12
    # vertical-only <-> horizontal CRS is meaningless -> CRSError
    try:
        Transformer.from_crs(a, "EPSG:4326")
        assert False, "expected CRSError"
    except CRSError:
        pass


def test_compound_crs_projjson_roundtrip_and_identity():
    from pyproj_spark.crs.builders import CompoundCRS, VerticalCRS
    from pyproj_spark.crs.crs import CRS
    vert = VerticalCRS("Synth height", "NAVD88 (synth)",
                       geoid_model="SYNTH2025")
    comp = CompoundCRS("WGS 84 + synth height", ["EPSG:4326", vert])
    back = CRS.from_user_input(comp.srs)
    assert back.is_compound and back == comp
    assert back.sub_crs_list[1].geoid_model == "SYNTH2025"
    # differing vertical component -> different CRS
    other = CompoundCRS("x", ["EPSG:4326",
                              VerticalCRS("U", "OTHER-DATUM")])
    assert comp != other
