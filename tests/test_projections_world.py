"""World-projection kernels added in round 5: Bonne (ellipsoidal
pseudoconic, EPSG method 9827), Van der Grinten I (spherical, Snyder
pp. 239-243), Winkel Tripel (spherical mean of equirectangular and
Aitoff). Locked by the projections' defining properties plus Snyder's
numerical example for Van der Grinten (reference: pyproj exposes these
via +proj strings through proj.4, pyproj/crs/crs.py:236-320)."""

from __future__ import annotations

import numpy as np
import pytest

from pyproj_spark.kernels.ellipsoid import get_ellipsoid
from pyproj_spark.kernels.projections import (
    Bonne,
    VanDerGrinten,
    WinkelTripel,
)


class _UnitSphere:
    a = 1.0
    b = 1.0
    e = 0.0
    e2 = 0.0
    n = 0.0


WGS84 = get_ellipsoid("WGS84")


class TestBonne:
    def setup_method(self):
        self.p = Bonne(WGS84, lon_0=-75.0, lat_1=40.0)

    def test_origin_is_zero(self):
        x, y = self.p.forward(np.radians([-75.0]), np.radians([40.0]))
        assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9

    def test_roundtrip(self):
        lam = np.radians(np.linspace(-170.0, 170.0, 23))
        phi = np.radians(np.linspace(-85.0, 85.0, 23))
        L, P = np.meshgrid(lam, phi)
        x, y = self.p.forward(L.ravel(), P.ravel())
        l2, p2 = self.p.inverse(x, y)
        assert np.max(np.abs(l2 - L.ravel())) < 1e-12
        assert np.max(np.abs(p2 - P.ravel())) < 1e-12

    def test_equal_area_jacobian(self):
        # defining property: |d(x,y)/d(lam,phi)| == Mr * N * cos(phi),
        # the ellipsoidal area element (exact equal-area projection)
        lam = np.radians(np.array([-85.0, -60.0, 10.0, -100.0, 179.0]))
        phi = np.radians(np.array([30.0, 50.0, -20.0, 70.0, -45.0]))
        h = 1e-6
        x, y = self.p.forward(lam, phi)
        x1, y1 = self.p.forward(lam + h, phi)
        x2, y2 = self.p.forward(lam, phi + h)
        J = ((x1 - x) * (y2 - y) - (x2 - x) * (y1 - y)) / (h * h)
        s2 = np.sin(phi) ** 2
        Mr = WGS84.a * (1 - WGS84.e2) / (1 - WGS84.e2 * s2) ** 1.5
        N = WGS84.a / np.sqrt(1 - WGS84.e2 * s2)
        np.testing.assert_allclose(J, Mr * N * np.cos(phi), rtol=1e-6)

    def test_central_meridian_distances_true(self):
        # y along the central meridian equals the meridian arc from
        # the standard parallel (Snyder: meridian distances true)
        phi = np.radians(np.array([0.0, 25.0, 40.0, 60.0, -35.0]))
        _, y = self.p.forward(np.full_like(phi, np.radians(-75.0)), phi)
        expect = self.p._mdist(phi) - self.p._mdist(
            np.array([np.radians(40.0)]))
        np.testing.assert_allclose(y, expect, atol=1e-8)

    def test_parallels_true_to_scale(self):
        # arc length along any parallel per radian of longitude is
        # a*m = N cos(phi) (all parallels are standard)
        phi = np.radians(np.array([30.0, 55.0, -10.0]))
        lam = np.radians(np.array([-70.0, -70.0, -70.0]))
        h = 1e-7
        x, y = self.p.forward(lam, phi)
        x1, y1 = self.p.forward(lam + h, phi)
        d = np.hypot(x1 - x, y1 - y) / h
        s2 = np.sin(phi) ** 2
        np.testing.assert_allclose(
            d, WGS84.a * np.cos(phi) / np.sqrt(1 - WGS84.e2 * s2),
            rtol=1e-6)

    def test_lat1_zero_rejected(self):
        with pytest.raises(ValueError):
            Bonne(WGS84, lat_1=0.0)
        with pytest.raises(ValueError):
            Bonne(WGS84)

    def test_south_standard_parallel_roundtrip(self):
        p = Bonne(WGS84, lon_0=135.0, lat_1=-30.0)
        lam = np.radians(np.array([110.0, 155.0, 135.0]))
        phi = np.radians(np.array([-45.0, -10.0, -30.0]))
        x, y = p.forward(lam, phi)
        l2, p2 = p.inverse(x, y)
        np.testing.assert_allclose(l2, lam, atol=1e-12)
        np.testing.assert_allclose(p2, phi, atol=1e-12)


class TestVanDerGrinten:
    def test_snyder_numerical_example(self):
        # Snyder "Map Projections: A Working Manual" Van der Grinten
        # example: R=1, lon_0=-85, (phi,lam)=(-50,-160) ->
        # (-1.1954154, -0.9960733)
        p = VanDerGrinten(_UnitSphere(), lon_0=-85.0)
        x, y = p.forward(np.radians([-160.0]), np.radians([-50.0]))
        assert abs(x[0] - (-1.1954154)) < 2e-7
        assert abs(y[0] - (-0.9960733)) < 2e-7
        # and the closed-form cubic inverse recovers the input
        l2, p2 = p.inverse(x, y)
        assert abs(np.degrees(l2[0]) - (-160.0)) < 1e-9
        assert abs(np.degrees(p2[0]) - (-50.0)) < 1e-9

    def test_world_maps_inside_pi_r_circle(self):
        p = VanDerGrinten(_UnitSphere(), lon_0=0.0)
        lam = np.radians(np.linspace(-179.9, 179.9, 41))
        phi = np.radians(np.linspace(-89.0, 89.0, 41))
        L, P = np.meshgrid(lam, phi)
        x, y = p.forward(L.ravel(), P.ravel())
        assert np.max(np.hypot(x, y)) <= np.pi + 1e-9

    def test_boundary_meridian_on_circle(self):
        # the +-180 meridian IS the bounding circle of radius pi*R
        p = VanDerGrinten(_UnitSphere(), lon_0=0.0)
        phi = np.radians(np.array([10.0, 37.0, -55.0, 80.0]))
        x, y = p.forward(np.full_like(phi, np.pi), phi)
        np.testing.assert_allclose(np.hypot(x, y), np.pi, atol=1e-12)

    def test_equator_straight_and_true(self):
        p = VanDerGrinten(_UnitSphere(), lon_0=0.0)
        lam = np.radians(np.array([-120.0, -30.0, 45.0, 170.0]))
        x, y = p.forward(lam, np.zeros_like(lam))
        np.testing.assert_allclose(x, lam, atol=1e-12)
        np.testing.assert_allclose(y, 0.0, atol=1e-12)

    def test_central_meridian(self):
        # x=0, y = pi R tan(theta/2) with theta = asin|2 phi/pi|
        p = VanDerGrinten(_UnitSphere(), lon_0=0.0)
        phi = np.radians(np.array([30.0, -60.0, 85.0]))
        x, y = p.forward(np.zeros_like(phi), phi)
        theta = np.arcsin(np.abs(2.0 * phi / np.pi))
        np.testing.assert_allclose(x, 0.0, atol=1e-12)
        np.testing.assert_allclose(
            y, np.sign(phi) * np.pi * np.tan(theta / 2.0), atol=1e-12)

    def test_roundtrip_grid(self):
        p = VanDerGrinten(_UnitSphere(), lon_0=0.0)
        lam = np.radians(np.linspace(-170.0, 170.0, 15))
        phi = np.radians(np.linspace(-80.0, 80.0, 15))
        L, P = np.meshgrid(lam, phi)
        x, y = p.forward(L.ravel(), P.ravel())
        l2, p2 = p.inverse(x, y)
        assert np.max(np.abs(l2 - L.ravel())) < 1e-11
        assert np.max(np.abs(p2 - P.ravel())) < 1e-11


class TestWinkelTripel:
    def test_central_meridian_is_r_phi(self):
        # at dl=0 the Aitoff half degenerates to y = R*phi, so the
        # mean is exactly R*phi and x = 0
        p = WinkelTripel(_UnitSphere())
        phi = np.radians(np.array([10.0, 45.0, -70.0, 89.0]))
        x, y = p.forward(np.zeros_like(phi), phi)
        np.testing.assert_allclose(x, 0.0, atol=1e-15)
        np.testing.assert_allclose(y, phi, atol=1e-12)

    def test_equator_scaled_by_mean_of_cosphi1_and_one(self):
        # on the equator d = |dl/2|, sinc = sin(dl/2)/(dl/2), so the
        # Aitoff half gives x = R*dl and the mean is
        # R*dl*(cosphi1 + 1)/2
        p = WinkelTripel(_UnitSphere())
        lam = np.radians(np.array([-150.0, -40.0, 60.0, 179.0]))
        x, y = p.forward(lam, np.zeros_like(lam))
        np.testing.assert_allclose(
            x, lam * (2.0 / np.pi + 1.0) / 2.0, atol=1e-12)
        np.testing.assert_allclose(y, 0.0, atol=1e-15)

    def test_symmetry(self):
        p = WinkelTripel(_UnitSphere())
        lam = np.radians(np.array([30.0, 110.0]))
        phi = np.radians(np.array([25.0, -60.0]))
        x, y = p.forward(lam, phi)
        xn, yn = p.forward(-lam, phi)
        xs, ys = p.forward(lam, -phi)
        np.testing.assert_allclose(xn, -x, atol=1e-15)
        np.testing.assert_allclose(yn, y, atol=1e-15)
        np.testing.assert_allclose(xs, x, atol=1e-15)
        np.testing.assert_allclose(ys, -y, atol=1e-15)

    def test_newton_inverse_roundtrip(self):
        p = WinkelTripel(WGS84)
        lam = np.radians(np.linspace(-170.0, 170.0, 15))
        phi = np.radians(np.linspace(-85.0, 85.0, 15))
        L, P = np.meshgrid(lam, phi)
        x, y = p.forward(L.ravel(), P.ravel())
        l2, p2 = p.inverse(x, y)
        assert np.max(np.abs(l2 - L.ravel())) < 1e-9
        assert np.max(np.abs(p2 - P.ravel())) < 1e-9

    def test_custom_lat_1(self):
        p = WinkelTripel(_UnitSphere(), lat_1=40.0)
        lam = np.radians(np.array([100.0]))
        x, _ = p.forward(lam, np.zeros(1))
        np.testing.assert_allclose(
            x, lam * (np.cos(np.radians(40.0)) + 1.0) / 2.0, atol=1e-12)


class TestTransformerIntegration:
    def test_proj_string_pipelines(self):
        from pyproj_spark import Transformer
        t = Transformer.from_crs(
            "EPSG:4326", "+proj=bonne +lat_1=45 +ellps=WGS84",
            always_xy=True)
        x, y = t.transform(2.0, 48.0)
        ti = Transformer.from_crs(
            "+proj=bonne +lat_1=45 +ellps=WGS84", "EPSG:4326",
            always_xy=True)
        lon, lat = ti.transform(x, y)
        assert abs(lon - 2.0) < 1e-9 and abs(lat - 48.0) < 1e-9

    def test_wkt_roundtrip_names(self):
        from pyproj_spark.crs import CRS
        for srs in ("+proj=bonne +lat_1=45 +ellps=WGS84",
                    "+proj=vandg +R=6371000",
                    "+proj=wintri +ellps=WGS84"):
            c = CRS.from_user_input(srs)
            c2 = CRS.from_wkt(c.to_wkt())
            p4 = c2.to_proj4()
            assert srs.split()[0].split("=")[1] in p4


class TestHammerAitoff:
    def test_hammer_equal_area_and_ellipse(self):
        from pyproj_spark.kernels.projections import Hammer
        p = Hammer(_UnitSphere())
        lam = np.radians(np.linspace(-170.0, 170.0, 15))
        phi = np.radians(np.linspace(-85.0, 85.0, 15))
        L, P = np.meshgrid(lam, phi)
        L, P = L.ravel(), P.ravel()
        x, y = p.forward(L, P)
        h = 1e-6
        x1, y1 = p.forward(L + h, P)
        x2, y2 = p.forward(L, P + h)
        J = ((x1 - x) * (y2 - y) - (x2 - x) * (y1 - y)) / (h * h)
        np.testing.assert_allclose(J, np.cos(P), rtol=1e-5)
        # whole world inside the 2:1 ellipse of semi-axes 2sqrt2, sqrt2
        assert np.max((x / np.sqrt(8.0)) ** 2
                      + (y / np.sqrt(2.0)) ** 2) <= 1.0 + 1e-12
        l2, p2 = p.inverse(x, y)
        assert np.max(np.abs(l2 - L)) < 1e-12
        assert np.max(np.abs(p2 - P)) < 1e-12

    def test_aitoff_roundtrip_and_central_meridian(self):
        from pyproj_spark.kernels.projections import Aitoff
        p = Aitoff(_UnitSphere())
        lam = np.radians(np.linspace(-170.0, 170.0, 15))
        phi = np.radians(np.linspace(-85.0, 85.0, 15))
        L, P = np.meshgrid(lam, phi)
        L, P = L.ravel(), P.ravel()
        x, y = p.forward(L, P)
        l2, p2 = p.inverse(x, y)
        assert np.max(np.abs(l2 - L)) < 1e-9
        assert np.max(np.abs(p2 - P)) < 1e-9
        ph = np.radians(np.array([10.0, -70.0, 85.0]))
        x0, y0 = p.forward(np.zeros_like(ph), ph)
        np.testing.assert_allclose(x0, 0.0, atol=1e-15)
        np.testing.assert_allclose(y0, ph, atol=1e-12)

    def test_wintri_is_mean_of_eqc_and_aitoff(self):
        from pyproj_spark.kernels.projections import Aitoff, WinkelTripel
        a = Aitoff(_UnitSphere())
        w = WinkelTripel(_UnitSphere())
        lam = np.radians(np.array([-120.0, 30.0, 160.0]))
        phi = np.radians(np.array([-55.0, 12.0, 78.0]))
        xa, ya = a.forward(lam, phi)
        xw, yw = w.forward(lam, phi)
        np.testing.assert_allclose(
            xw, 0.5 * (lam * 2.0 / np.pi + xa), atol=1e-14)
        np.testing.assert_allclose(yw, 0.5 * (phi + ya), atol=1e-14)
