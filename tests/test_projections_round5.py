"""Round-5 projection families: moll, mill, gnom, cass (reference
pyproj exposes every PROJ projection through proj-strings —
pyproj/proj.py:40-120). Each family is validated by a Snyder golden
or a defining geometric property plus round-trip closure."""

import numpy as np
import pytest

from pyproj_spark import Transformer


def t(src, dst):
    return Transformer.from_crs(src, dst, always_xy=True)


class TestMollweide:
    def test_snyder_golden(self):
        # Snyder numerical example: R=1, lon_0=-90, (50N, 75W);
        # theta converges to 0.7091086 rad
        x, y = t("+proj=longlat +a=1 +b=1",
                 "+proj=moll +lon_0=-90 +a=1 +b=1").transform(-75.0, 50.0)
        assert x == pytest.approx(0.1788845, abs=5e-7)
        assert y == pytest.approx(0.9208758, abs=5e-7)

    def test_equal_area(self):
        # Jacobian determinant == R^2 cos(phi) everywhere (equal-area)
        tr = t("+proj=longlat +a=1 +b=1", "+proj=moll +a=1 +b=1")
        h = 1e-5
        for lon, lat in ((10.0, 20.0), (-120.0, 55.0), (60.0, -35.0)):
            x0, y0 = tr.transform(lon, lat)
            xl, yl = tr.transform(lon + h, lat)
            xp, yp = tr.transform(lon, lat + h)
            hr = np.radians(h)
            jac = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / hr**2
            assert jac == pytest.approx(np.cos(np.radians(lat)), rel=1e-3)

    def test_roundtrip(self):
        tr = t("+proj=longlat +ellps=WGS84", "+proj=moll +ellps=WGS84")
        ti = t("+proj=moll +ellps=WGS84", "+proj=longlat +ellps=WGS84")
        lon = np.array([-170.0, -45.0, 0.0, 80.0, 179.0])
        lat = np.array([-80.0, -10.0, 0.0, 45.0, 85.0])
        x, y = tr.transform(lon, lat)
        lo, la = ti.transform(x, y)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)


class TestMiller:
    def test_snyder_form(self):
        # y = ln(tan(pi/4 + 0.4*phi)) / 0.8 on the unit sphere
        x, y = t("+proj=longlat +a=1 +b=1",
                 "+proj=mill +a=1 +b=1").transform(-75.0, 50.0)
        assert x == pytest.approx(np.radians(-75.0), abs=1e-12)
        want = np.log(np.tan(np.pi / 4 + 0.4 * np.radians(50.0))) / 0.8
        assert y == pytest.approx(want, abs=1e-12)

    def test_roundtrip(self):
        tr = t("EPSG:4326", "+proj=mill +ellps=WGS84")
        ti = t("+proj=mill +ellps=WGS84", "EPSG:4326")
        x, y = tr.transform(123.4, -56.7)
        lon, lat = ti.transform(x, y)
        assert (lon, lat) == (pytest.approx(123.4, abs=1e-9),
                              pytest.approx(-56.7, abs=1e-9))


class TestGnomonic:
    def test_great_circles_are_straight(self):
        # the defining property: any great circle maps to a line
        tr = t("EPSG:4326", "+proj=gnom +lat_0=40 +lon_0=-100 +ellps=sphere")

        def gc(p1, p2, f):
            a1, a2 = np.radians(p1), np.radians(p2)
            v1 = np.array([np.cos(a1[1]) * np.cos(a1[0]),
                           np.cos(a1[1]) * np.sin(a1[0]), np.sin(a1[1])])
            v2 = np.array([np.cos(a2[1]) * np.cos(a2[0]),
                           np.cos(a2[1]) * np.sin(a2[0]), np.sin(a2[1])])
            w = np.arccos(v1 @ v2)
            v = (np.sin((1 - f) * w) * v1 + np.sin(f * w) * v2) / np.sin(w)
            return (np.degrees(np.arctan2(v[1], v[0])),
                    np.degrees(np.arcsin(v[2])))

        for ends in (((-110.0, 30.0), (-80.0, 50.0)),
                     ((-95.0, 20.0), (-120.0, 55.0))):
            pts = [gc(*ends, f) for f in (0.0, 0.3, 0.7, 1.0)]
            xs, ys = tr.transform([p[0] for p in pts], [p[1] for p in pts])
            # normalized cross products of consecutive segments ~ 0
            for i in (1, 2):
                cr = ((xs[i] - xs[0]) * (ys[-1] - ys[0])
                      - (ys[i] - ys[0]) * (xs[-1] - xs[0]))
                norm = np.hypot(xs[-1] - xs[0], ys[-1] - ys[0]) ** 2
                assert abs(cr) / norm < 1e-9

    def test_center_and_roundtrip(self):
        tr = t("EPSG:4326", "+proj=gnom +lat_0=40 +lon_0=-100 +ellps=sphere")
        ti = t("+proj=gnom +lat_0=40 +lon_0=-100 +ellps=sphere", "EPSG:4326")
        x, y = tr.transform(-100.0, 40.0)
        assert abs(x) < 1e-6 and abs(y) < 1e-6
        x, y = tr.transform(-95.5, 44.25)
        lon, lat = ti.transform(x, y)
        assert (lon, lat) == (pytest.approx(-95.5, abs=1e-9),
                              pytest.approx(44.25, abs=1e-9))

    def test_horizon_is_inf(self):
        tr = t("EPSG:4326", "+proj=gnom +lat_0=40 +lon_0=-100 +ellps=sphere")
        x, _ = tr.transform(80.0, -40.0)  # antipode, past the horizon
        assert not np.isfinite(x)


class TestCassini:
    LON0, LAT0 = 13.62720366666667, 52.41864827777778

    def test_central_meridian_equals_tmerc_arc(self):
        # at dl=0 both cass and tmerc(k=1) reduce to the meridian arc
        # M - M0; the two implementations agree to sub-micron
        c = t("+proj=longlat +ellps=bessel",
              f"+proj=cass +lat_0={self.LAT0} +lon_0={self.LON0} "
              "+ellps=bessel")
        m = t("+proj=longlat +ellps=bessel",
              f"+proj=tmerc +lat_0={self.LAT0} +lon_0={self.LON0} +k=1 "
              "+ellps=bessel")
        for lat in (48.0, 52.0, self.LAT0, 55.5):
            xc, yc = c.transform(self.LON0, lat)
            xt, yt = m.transform(self.LON0, lat)
            assert abs(xc) < 1e-9
            assert yc == pytest.approx(yt, abs=1e-6)

    def test_soldner_berlin(self):
        # EPSG:3068 with the Muggelberg false origin (40000, 10000);
        # Berlin Mitte is ~15.1 km west / ~11.3 km north of the origin
        x, y = t("EPSG:4314", "EPSG:3068").transform(13.4050, 52.5200)
        assert 24_000 < x < 26_000
        assert 21_000 < y < 22_000
        lon, lat = t("EPSG:3068", "EPSG:4314").transform(x, y)
        assert lon == pytest.approx(13.4050, abs=1e-9)
        assert lat == pytest.approx(52.5200, abs=1e-9)

    def test_roundtrip_off_meridian(self):
        c = t("+proj=longlat +ellps=bessel",
              f"+proj=cass +lat_0={self.LAT0} +lon_0={self.LON0} "
              "+ellps=bessel")
        ci = t(f"+proj=cass +lat_0={self.LAT0} +lon_0={self.LON0} "
               "+ellps=bessel", "+proj=longlat +ellps=bessel")
        lon = np.array([12.8, 13.3, 13.9, 14.4])
        lat = np.array([52.1, 52.4, 52.7, 53.0])
        x, y = c.transform(lon, lat)
        lo, la = ci.transform(x, y)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)


class TestEsriWorldCodes:
    def test_mollweide_and_miller_registered(self):
        a = t("EPSG:4326", "ESRI:54009").transform(12.0, 42.0)
        b = t("EPSG:4326",
              "+proj=moll +lon_0=0 +ellps=WGS84").transform(12.0, 42.0)
        assert a == b
        a = t("EPSG:4326", "ESRI:54003").transform(12.0, 42.0)
        b = t("EPSG:4326",
              "+proj=mill +lon_0=0 +ellps=WGS84").transform(12.0, 42.0)
        assert a == b


class TestKrovak:
    def test_epsg_worked_example(self):
        # EPSG guidance note 7-2, method 9819 worked example:
        # 50d12'32.4416"N 16d50'59.1790"E -> southing 1050538.63,
        # westing 568991.00 (cm-rounded in the note); EPSG:5514
        # east-north negates both.
        lat = 50 + 12 / 60 + 32.4416 / 3600
        lon = 16 + 50 / 60 + 59.1790 / 3600
        x, y = t("EPSG:4156", "EPSG:5514").transform(lon, lat)
        assert x == pytest.approx(-568991.00, abs=0.05)
        assert y == pytest.approx(-1050538.63, abs=0.05)

    def test_roundtrip(self):
        fw = t("EPSG:4156", "EPSG:5514")
        bw = t("EPSG:5514", "EPSG:4156")
        lon = np.array([12.1, 14.44, 17.2, 21.9])
        lat = np.array([48.6, 50.08, 49.2, 48.7])
        x, y = fw.transform(lon, lat)
        lo, la = bw.transform(x, y)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)

    def test_conformality(self):
        # oblique conformal conic: local scale is isotropic once the
        # ellipsoidal metric (nu cos(phi) along parallels, rho along
        # meridians) is divided out
        from pyproj_spark.kernels.ellipsoid import get_ellipsoid
        E = get_ellipsoid("bessel")
        fw = t("EPSG:4156", "EPSG:5514")
        h = 1e-6
        for lon, lat in ((14.4378, 50.0755), (17.1077, 48.1486)):
            x0, y0 = fw.transform(lon, lat)
            xl, yl = fw.transform(lon + h, lat)
            xp, yp = fw.transform(lon, lat + h)
            s2 = np.sin(np.radians(lat)) ** 2
            nu = E.a / np.sqrt(1 - E.e2 * s2)
            rho = E.a * (1 - E.e2) / (1 - E.e2 * s2) ** 1.5
            slon = np.hypot(xl - x0, yl - y0) / (nu * np.cos(np.radians(lat)))
            slat = np.hypot(xp - x0, yp - y0) / rho
            assert slon == pytest.approx(slat, rel=1e-6)


class TestObliqueStereographic:
    """sterea — EPSG method 9809 (double stereographic through the
    Gauss conformal sphere), the Amersfoort / RD New projection.
    Reference exposes it via proj=sterea (pyproj/crs/crs.py
    CRS.from_proj4); distinct from stere's direct Snyder form."""

    def test_epsg_worked_example_rd_new(self):
        # EPSG Guidance Note 7-2, Oblique Stereographic example:
        # Amersfoort / RD New (EPSG:28992), Bessel 1841,
        # 53N 6E -> E 196105.283 m, N 557057.739 m
        x, y = t("EPSG:4289", "EPSG:28992").transform(6.0, 53.0)
        assert x == pytest.approx(196105.283, abs=2e-3)
        assert y == pytest.approx(557057.739, abs=2e-3)

    def test_roundtrip(self):
        tr = t("EPSG:4289", "EPSG:28992")
        ti = t("EPSG:28992", "EPSG:4289")
        rng = np.random.default_rng(11)
        lon = rng.uniform(3.2, 7.2, 500)
        lat = rng.uniform(50.7, 53.6, 500)
        x, y = tr.transform(lon, lat)
        lo, la = ti.transform(x, y)
        np.testing.assert_allclose(lo, lon, atol=1e-11)
        np.testing.assert_allclose(la, lat, atol=1e-11)

    def test_conformality(self):
        # double stereographic is conformal: local Jacobian is a
        # scaled rotation (equal column norms, orthogonal columns)
        from pyproj_spark.kernels.ellipsoid import get_ellipsoid
        E = get_ellipsoid("bessel")
        tr = t("EPSG:4289", "EPSG:28992")
        h = 1e-6
        for lon, lat in ((5.0, 52.0), (6.8, 51.2), (4.1, 53.1)):
            x0, y0 = tr.transform(lon, lat)
            xl, yl = tr.transform(lon + h, lat)
            xp, yp = tr.transform(lon, lat + h)
            # ellipsoidal arc lengths: parallel = nu*cos(phi)*dlam,
            # meridian = rho*dphi — conformal => equal scale both ways
            s2 = np.sin(np.radians(lat)) ** 2
            nu = E.a / np.sqrt(1.0 - E.e2 * s2)
            rho = E.a * (1.0 - E.e2) / (1.0 - E.e2 * s2) ** 1.5
            gl = np.hypot(xl - x0, yl - y0) / (nu * np.cos(np.radians(lat)))
            gp = np.hypot(xp - x0, yp - y0) / rho
            assert gl == pytest.approx(gp, rel=1e-4)
            dot = (xl - x0) * (xp - x0) + (yl - y0) * (yp - y0)
            assert abs(dot) < 1e-3 * np.hypot(xl - x0, yl - y0) \
                * np.hypot(xp - x0, yp - y0)

    def test_sterea_differs_from_stere(self):
        # same parameters through stere (single projection) must NOT
        # reproduce the 9809 double-projection easting/northing
        xs, ys = t("+proj=longlat +ellps=bessel",
                   "+proj=sterea +lat_0=52.15616055555555 "
                   "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 "
                   "+y_0=463000 +ellps=bessel").transform(6.0, 53.0)
        xd, yd = t("+proj=longlat +ellps=bessel",
                   "+proj=stere +lat_0=52.15616055555555 "
                   "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 "
                   "+y_0=463000 +ellps=bessel").transform(6.0, 53.0)
        assert (abs(xs - xd) > 0.01) or (abs(ys - yd) > 0.01)

    def test_wkt_roundtrip_with_named_ellipsoid(self):
        # parsed WKT recovers the bessel name from (a, rf), so the
        # emitted WKT is byte-stable across a parse cycle
        from pyproj_spark.crs.crs import CRS
        w = CRS.from_epsg(28992).to_wkt()
        assert 'METHOD["Oblique Stereographic",ID["EPSG",9809]]' in w
        assert CRS.from_wkt(w).to_wkt() == w


class TestEqualEarth:
    """eqearth — Equal Earth (Šavrič/Patterson/Jenny 2019; EPSG
    method 1078, EPSG:8857-8859). Reference exposes it through
    proj=eqearth CRS strings and the EPSG codes."""

    def test_exactly_equal_area(self):
        from pyproj_spark.kernels.ellipsoid import get_ellipsoid
        E = get_ellipsoid("WGS84")
        tr = t("EPSG:4326", "EPSG:8857")
        h = 1e-6
        for lon, lat in ((0.0, 0.0), (100.0, 45.0), (-60.0, -70.0),
                         (170.0, 80.0), (30.0, -20.0)):
            x0, y0 = tr.transform(lon, lat)
            xl, yl = tr.transform(lon + h, lat)
            xp, yp = tr.transform(lon, lat + h)
            jac = abs((xl - x0) * (yp - y0)
                      - (xp - x0) * (yl - y0)) / np.radians(h) ** 2
            s2 = np.sin(np.radians(lat)) ** 2
            nu = E.a / np.sqrt(1 - E.e2 * s2)
            rho = E.a * (1 - E.e2) / (1 - E.e2 * s2) ** 1.5
            assert jac == pytest.approx(
                nu * rho * np.cos(np.radians(lat)), rel=1e-4)

    def test_aspect_ratio(self):
        # the defining Equal Earth trait: width:height = 2.05458:1
        tr = t("EPSG:4326", "EPSG:8857")
        xe, _ = tr.transform(179.999999, 0.0)
        _, yp = tr.transform(0.0, 90.0)
        assert abs(xe) / yp == pytest.approx(2.05458, abs=2e-5)

    def test_pseudocylindrical(self):
        # parallels are straight lines: y independent of lon
        tr = t("EPSG:4326", "EPSG:8857")
        _, y1 = tr.transform(0.0, 37.0)
        _, y2 = tr.transform(120.0, 37.0)
        assert y1 == pytest.approx(y2, abs=1e-9)

    def test_roundtrip(self):
        tr = t("EPSG:4326", "EPSG:8857")
        ti = t("EPSG:8857", "EPSG:4326")
        rng = np.random.default_rng(5)
        lon = rng.uniform(-179.0, 179.0, 1000)
        lat = rng.uniform(-89.0, 89.0, 1000)
        x, y = tr.transform(lon, lat)
        lo, la = ti.transform(x, y)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)

    def test_americas_aspect_is_lon_shift(self):
        # 8858 is 8857 with lon_0=-90: same invariants, shifted frame
        xg, yg = t("EPSG:4326", "EPSG:8857").transform(10.0, 40.0)
        xa, ya = t("EPSG:4326", "EPSG:8858").transform(-80.0, 40.0)
        assert xa == pytest.approx(xg, abs=1e-6)
        assert ya == pytest.approx(yg, abs=1e-6)


class TestRound5CatalogAdditions:
    def test_polar_families_roundtrip(self):
        from pyproj_spark.crs.crs import CRS
        for code in (3995, 5041, 5042, 3571, 3572, 3573, 3574, 3575,
                     3576, 3577, 4087, 5243, 6350, 3347, 3978, 3979,
                     2039, 31965, 31976, 31977, 31985, 7846, 7859):
            w = CRS.from_epsg(code).to_wkt()
            assert CRS.from_wkt(w).to_wkt() == w, code

    def test_ups_north_grid(self):
        # UPS: pole maps to (2e6, 2e6); at 84N the northing offset is
        # ~666.7 km of meridian arc scaled by k0=0.994
        x, y = t("EPSG:4326", "EPSG:5041").transform(0.0, 84.0)
        assert x == pytest.approx(2000000.0, abs=1e-6)
        assert 2000000.0 - y == pytest.approx(666727.7, abs=1.0)

    def test_esri_webmercator_alias(self):
        from pyproj_spark.crs.crs import CRS
        a = CRS.from_user_input("ESRI:102100")
        t1 = Transformer.from_crs("EPSG:4326", a, always_xy=True)
        t2 = t("EPSG:4326", "EPSG:3857")
        assert t1.transform(5.0, 45.0) == t2.transform(5.0, 45.0)

    def test_sirgas_utm_matches_wgs84_utm(self):
        # SIRGAS2000 is ITRF-aligned: same UTM numbers as WGS84 zone
        # sub-mm agreement (the null-Helmert datum hop costs ~0.1 mm
        # of geocentric roundtrip noise vs the direct WGS84 path)
        xs, ys = t("EPSG:4674", "EPSG:31983").transform(-46.0, -23.0)
        xw, yw = t("EPSG:4326", "EPSG:32723").transform(-46.0, -23.0)
        assert xs == pytest.approx(xw, abs=1e-3)
        assert ys == pytest.approx(yw, abs=1e-3)
