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


class TestRound5SessionAdditions:
    """NTF (Paris) Lambert zones, Korea 2000, Poland CS92/CS2000,
    Baltic TM family, Portugal TM06, Belgian Lambert 2008, IRENET95
    ITM, SVY21, Hong Kong 1980, California Albers (reference
    pyproj/database.pyx:129-277 catalog surface)."""

    PARIS = 2.337229166666667  # 2d20'14.025"E, EPSG:8903 in degrees

    def test_ntf_lambert_natural_origins(self):
        # Each classic zone's origin (Paris meridian, zone lat_0) maps
        # to (600000, 200000); "carto" variants prepend the zone digit
        # to the false northing.
        for code, lat0, y0 in [(27561, 49.5, 200000.0),
                               (27562, 46.8, 200000.0),
                               (27563, 44.1, 200000.0),
                               (27571, 49.5, 1200000.0),
                               (27572, 46.8, 2200000.0),
                               (27573, 44.1, 3200000.0)]:
            x, y = xy("EPSG:4275", f"EPSG:{code}", self.PARIS, lat0)
            assert x == pytest.approx(600000.0, abs=1e-6), code
            assert y == pytest.approx(y0, abs=1e-6), code

    def test_ntf_paris_geographic_zero_is_paris_meridian(self):
        # 4807 longitudes are measured from Paris: lon=0 there equals
        # lon=PARIS in the Greenwich-framed 4275.
        x1, y1 = xy("EPSG:4807", "EPSG:27572", 0.0, 46.8)
        x2, y2 = xy("EPSG:4275", "EPSG:27572", self.PARIS, 46.8)
        assert x1 == pytest.approx(x2, abs=1e-9)
        assert y1 == pytest.approx(y2, abs=1e-9)

    def test_lambert_2e_paris_golden(self):
        # Central Paris in Lambert II etendu: the classic pre-RGF93
        # all-France grid (also IGNF:LAMBE); well-known ~(601.1km,
        # 2428.7km) values.
        x, y = xy("EPSG:4326", "EPSG:27572", 2.3522, 48.8566)
        assert x == pytest.approx(601152.3, abs=5.0)
        assert y == pytest.approx(2428695.9, abs=5.0)
        assert CRS.from_user_input("IGNF:LAMBE").to_epsg() == 27572

    def test_tm_origin_family(self):
        # tmerc members: natural origin -> (x_0, y_0) exactly when the
        # geographic anchor shares the ellipsoid; 1 mm when the
        # null-shift Helmert crosses WGS84<->GRS80 (flattening differs
        # in the 9th decimal)
        for code, geog, lon0, lat0, x0, y0 in [
            (5179, 4326, 127.5, 38.0, 1000000.0, 2000000.0),
            (5186, 4326, 127.0, 38.0, 200000.0, 600000.0),
            (2180, 4258, 19.0, 0.0, 500000.0, -5300000.0),
            (2177, 4258, 18.0, 0.0, 6500000.0, 0.0),
            (3763, 4258, -8.133108333333334, 39.66825833333333, 0.0, 0.0),
            (3346, 4258, 24.0, 0.0, 500000.0, 0.0),
            (3059, 4258, 24.0, 0.0, 500000.0, -6000000.0),
            (3794, 4258, 15.0, 0.0, 500000.0, -5000000.0),
            (2157, 4258, -8.0, 53.5, 600000.0, 750000.0),
            (3414, 4326, 103.83333333333333, 1.3666666666666667,
             28001.642, 38744.572),
        ]:
            tol = 1e-3 if geog == 4326 else 1e-6
            x, y = xy(f"EPSG:{geog}", f"EPSG:{code}", lon0, lat0)
            assert x == pytest.approx(x0, abs=tol), code
            assert y == pytest.approx(y0, abs=tol), code

    def test_hk1980_origin_same_datum(self):
        crs = CRS.from_epsg(2326)
        assert "Hong Kong" in crs.name
        # origin exactness requires the HK1980 geographic side; check
        # WGS84 round-trip + ballpark instead (datum shift ~200 m).
        x, y = xy("EPSG:4326", "EPSG:2326", 114.17855555555556,
                  22.312133333333333)
        assert abs(x - 836694.05) < 300 and abs(y - 819069.8) < 300
        lon, lat = xy("EPSG:2326", "EPSG:4326", x, y)
        assert lon == pytest.approx(114.17855555555556, abs=1e-8)
        assert lat == pytest.approx(22.312133333333333, abs=1e-8)

    def test_california_albers_twins(self):
        # NAD83 and NAD83(2011) variants share projection params
        x1, y1 = xy("EPSG:4269", "EPSG:3310", -120.0, 37.0)
        x2, y2 = xy("EPSG:4269", "EPSG:6414", -120.0, 37.0)
        assert (x1, y1) == (x2, y2)
        assert x1 == pytest.approx(0.0, abs=1e-6)

    def test_estonia_lcc_origin(self):
        x, y = xy("EPSG:4258", "EPSG:3301", 24.0, 57.51755393055556)
        assert x == pytest.approx(500000.0, abs=1e-6)
        assert y == pytest.approx(6375000.0, abs=1e-6)

    def test_world_sinusoidal_esri(self):
        crs = CRS.from_authority("ESRI", "54008")
        assert crs.proj_params["proj"] == "sinu"
        # equal-area sanity at the equator: x = a * lon_rad
        x, y = xy("ESRI:54008", "EPSG:4326", 0.0, 0.0)
        assert (x, y) == (0.0, 0.0)


class TestSwerefLadder:
    """SWEREF99 local zones 3007-3018 (the RT90-replacement comb)."""

    def test_cm_easting_and_k0_ratio_vs_tm(self):
        # at every zone's central meridian the easting IS the false
        # easting, and because the local zones use k_0 = 1 while
        # SWEREF99 TM uses 0.9996, the northing ratio at the shared
        # 15-degree meridian is EXACTLY 0.9996 (both are k_0 * arc)
        lat = 59.35
        for code, cm in [(3007, 12.0), (3008, 13.5), (3009, 15.0),
                         (3010, 16.5), (3011, 18.0), (3012, 14.25),
                         (3013, 15.75), (3014, 17.25), (3015, 18.75),
                         (3016, 20.25), (3017, 21.75), (3018, 23.25)]:
            x, y = xy("EPSG:4619", f"EPSG:{code}", cm, lat)
            assert x == pytest.approx(150000.0, abs=1e-6), code
            assert 6_000_000 < y < 7_000_000, code
        _, n_local = xy("EPSG:4619", "EPSG:3009", 15.0, lat)
        _, n_tm = xy("EPSG:4619", "EPSG:3006", 15.0, lat)
        assert n_tm / (n_local - 0.0) == pytest.approx(0.9996,
                                                       abs=1e-12)

    def test_axis_order_and_roundtrip(self):
        from pyproj_spark import CRS
        crs = CRS.from_epsg(3011)
        assert "SWEREF99 18 00" == crs.name
        x, y = xy("EPSG:4619", "EPSG:3011", 18.06, 59.33)
        lon, lat = xy("EPSG:3011", "EPSG:4619", x, y)
        assert lon == pytest.approx(18.06, abs=1e-9)
        assert lat == pytest.approx(59.33, abs=1e-9)


class TestNorwayNTM:
    """ETRS89 / NTM zones 5-30 (EPSG 5105-5130)."""

    def test_projection_origin_is_exact(self):
        # at (lon_0, lat_0) a tmerc with k_0=1 maps EXACTLY to the
        # false origin: easting 100 000, northing 1 000 000
        for z in (5, 12, 23, 30):
            x, y = xy("EPSG:4258", f"EPSG:{5100 + z}", z + 0.5, 58.0)
            assert x == pytest.approx(100000.0, abs=1e-7), z
            assert y == pytest.approx(1000000.0, abs=1e-7), z

    def test_k0_one_arc_matches_sweref_local(self):
        # both ladders are tmerc with k_0 = 1 on GRS80, so the
        # northing GROWTH along the central meridian between two
        # latitudes is the same meridian arc in both — despite
        # different lat_0 / false origins (NTM zone 14, CM 14.5;
        # SWEREF99 14 15, CM 14.25 — the CM offset is irrelevant ON
        # the CM)
        _, n1 = xy("EPSG:4258", "EPSG:5114", 14.5, 59.0)
        _, n0 = xy("EPSG:4258", "EPSG:5114", 14.5, 58.0)
        _, s1 = xy("EPSG:4619", "EPSG:3012", 14.25, 59.0)
        _, s0 = xy("EPSG:4619", "EPSG:3012", 14.25, 58.0)
        assert (n1 - n0) == pytest.approx(s1 - s0, abs=1e-7)

    def test_roundtrip(self):
        x, y = xy("EPSG:4258", "EPSG:5110", 10.75, 59.91)
        lon, lat = xy("EPSG:5110", "EPSG:4258", x, y)
        assert lon == pytest.approx(10.75, abs=1e-9)
        assert lat == pytest.approx(59.91, abs=1e-9)
