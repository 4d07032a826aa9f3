"""Round-5 catalog breadth: Pulkovo GK, DHDN GK, Japan Plane
Rectangular, Belgian Lambert 72, and the ESRI/IGNF authority
namespaces (reference pyproj/database.pyx:54-79, crs/crs.py:362-382).

The Gauss-Kruger family cross-checks against the engine's own UTM
path (golden-verified against reference docstrings): for tmerc,
xi/eta depend only on (dlam, phi), so easting-x_0 scales EXACTLY by
k_0 between two grids sharing lon_0/lat_0.
"""

import math

import pytest

from pyproj_spark import CRS, Transformer
from pyproj_spark.crs import catalog
from pyproj_spark.exceptions import CRSError


def xy(src, dst, lon, lat):
    return Transformer.from_crs(src, dst, always_xy=True).transform(lon, lat)


class TestGaussKruger:
    def test_zone_7_matches_utm_scaling(self):
        # GK zone 7 (lon_0=39, k=1) vs UTM 37N (lon_0=39, k=0.9996):
        # identical xi/eta => exact k_0 ratio on de-falsed coordinates.
        lon, lat = 37.6176, 55.7558  # Moscow
        gx, gy = xy("EPSG:4284", "EPSG:28407", lon, lat)
        # UTM 37N on the SAME ellipsoid via proj string (krass)
        t = Transformer.from_crs(
            "+proj=longlat +ellps=krass +no_defs",
            "+proj=utm +zone=37 +ellps=krass +no_defs", always_xy=True)
        ux, uy = t.transform(lon, lat)
        assert (gx - 7_500_000.0) * 0.9996 == pytest.approx(
            ux - 500_000.0, abs=1e-6)
        assert gy * 0.9996 == pytest.approx(uy, abs=1e-6)

    def test_moscow_plausible(self):
        gx, gy = xy("EPSG:4284", "EPSG:28407", 37.6176, 55.7558)
        assert 7_400_000 < gx < 7_430_000   # ~87 km west of lon_0=39
        assert 6_170_000 < gy < 6_195_000   # meridian arc to 55.76N

    def test_false_easting_is_zone_prefixed(self):
        # the central meridian of every zone maps to x = z*1e6 + 500000
        for z in (5, 10, 16, 32):
            gx, _ = xy("EPSG:4284", f"EPSG:{28400 + z}",
                       min(6 * z - 3, 177), 50.0) if z != 32 else xy(
                "EPSG:4284", "EPSG:28432", -171.0, 50.0)
            assert gx == pytest.approx(z * 1_000_000 + 500_000, abs=1e-6)

    def test_dhdn_gk4_berlin(self):
        gx, gy = xy("EPSG:4314", "EPSG:31468", 13.4050, 52.5200)
        assert 4_590_000 < gx < 4_600_000
        assert 5_815_000 < gy < 5_830_000
        # round-trip
        lon, lat = xy("EPSG:31468", "EPSG:4314", gx, gy)
        assert lon == pytest.approx(13.4050, abs=1e-9)
        assert lat == pytest.approx(52.5200, abs=1e-9)


class TestJapanPlaneRectangular:
    def test_zone_ix_origin_and_tokyo(self):
        # zone IX origin (139 deg 50 min E, 36 N) maps to (0, 0)
        ex, ny = xy("EPSG:6668", "EPSG:6677", 139.0 + 50.0 / 60.0, 36.0)
        assert abs(ex) < 1e-6 and abs(ny) < 1e-6
        # Tokyo: ~6 km west, ~35 km south of the origin
        ex, ny = xy("EPSG:6668", "EPSG:6677", 139.7671, 35.6812)
        assert -7_000 < ex < -5_000
        assert -36_500 < ny < -34_500

    def test_jgd2000_jgd2011_twins(self):
        # same projection parameters -> identical planar coordinates
        for code00, code11 in ((2443, 6669), (2451, 6677), (2461, 6687)):
            a = xy("EPSG:4612", f"EPSG:{code00}", 135.1, 34.7)
            b = xy("EPSG:6668", f"EPSG:{code11}", 135.1, 34.7)
            assert a == b

    def test_authority_axis_order_is_north_first(self):
        # EPSG axis order for 2443-2461/6669-6687 is (X=north, Y=east)
        t = Transformer.from_crs("EPSG:4612", "EPSG:2451")
        n, e = t.transform(35.6812, 139.7671)   # lat, lon in
        te = Transformer.from_crs("EPSG:4612", "EPSG:2451", always_xy=True)
        ex, ny = te.transform(139.7671, 35.6812)
        assert (n, e) == (ny, ex)


class TestBelgianLambert72:
    def test_brussels_window_and_roundtrip(self):
        bx, by = xy("EPSG:4313", "EPSG:31370", 4.3572, 50.8476)
        assert 147_000 < bx < 152_000
        assert 168_000 < by < 173_000
        lon, lat = xy("EPSG:31370", "EPSG:4313", bx, by)
        assert lon == pytest.approx(4.3572, abs=1e-9)
        assert lat == pytest.approx(50.8476, abs=1e-9)

    def test_north_pole_false_origin(self):
        # lat_0=90 exercises the rho0 -> 0 branch of LCC-2SP
        crs = CRS.from_epsg(31370)
        assert crs.proj_params["lat_0"] == 90


class TestAuthorities:
    def test_esri_albers_inverse_origin(self):
        lon, lat = xy("ESRI:102003", "EPSG:4326", 0.0, 0.0)
        assert lon == pytest.approx(-96.0, abs=1e-9)
        assert lat == pytest.approx(37.5, abs=1e-7)

    def test_esri_from_user_input_string(self):
        crs = CRS.from_user_input("ESRI:102008")
        assert crs.proj_params["proj"] == "aea"
        assert crs.proj_params["lat_0"] == 40

    def test_ignf_lamb93_aliases_epsg_2154(self):
        a = xy("IGNF:RGF93G", "IGNF:LAMB93", 2.35, 48.85)
        b = xy("EPSG:4171", "EPSG:2154", 2.35, 48.85)
        assert a == b
        assert CRS.from_user_input("IGNF:LAMB93").to_epsg() == 2154

    def test_unknown_codes_raise(self):
        with pytest.raises(CRSError):
            CRS.from_authority("ESRI", "999999")
        with pytest.raises(CRSError):
            CRS.from_authority("IGNF", "NOPE")

    def test_authority_names_table(self):
        assert set(catalog.AUTHORITY_NAMES) >= {"EPSG", "ESRI", "IGNF"}
        assert "102003" in catalog.authority_codes("ESRI")
        assert "LAMB93" in catalog.authority_codes("IGNF")


class TestEuroPacificAdditions:
    def test_lcc_europe_false_origin(self):
        # EPSG:3034 natural origin (10E, 52N) -> the false origin
        x, y = xy("EPSG:4258", "EPSG:3034", 10.0, 52.0)
        assert x == pytest.approx(4000000.0, abs=1e-6)
        assert y == pytest.approx(2800000.0, abs=1e-6)

    def test_pdc_mercator_is_shifted_world_mercator(self):
        # EPSG:3832 = Mercator centred on 150E: equals EPSG:3395
        # easting of (lon-150) at the equator band
        x1, y1 = xy("EPSG:4326", "EPSG:3832", 170.0, -20.0)
        x2, y2 = xy("EPSG:4326", "EPSG:3395", 20.0, -20.0)
        assert x1 == pytest.approx(x2, abs=1e-6)
        assert y1 == pytest.approx(y2, abs=1e-6)
