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
