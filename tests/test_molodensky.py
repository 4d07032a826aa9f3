"""Molodensky datum-shift kernel (EPSG 9604 full / 9605 abridged).

Locks the kernel against an INDEPENDENT exact path already tested on
its own goldens: cart -> helmert -> cart (geocentric translation).
Molodensky is the first-order geodetic-domain expansion of that chain,
so over a world grid the two must agree to the method's documented
accuracy (sub-metre for continental translation magnitudes) — a
property check with no shared code between the two sides.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyproj_spark.kernels.datum import Molodensky
from pyproj_spark.kernels.ellipsoid import Ellipsoid, get_ellipsoid
from pyproj_spark.plans.pipeline import PipelineTransformer

INTL = get_ellipsoid("intl")
# ED50 -> WGS84 classic three-parameter shift
DX, DY, DZ = -87.0, -96.0, -120.0
DA = 6378137.0 - 6378388.0
DF = 1.0 / 298.257223563 - 1.0 / 297.0

EXACT_PIPE = (
    "+proj=pipeline "
    "+step +proj=unitconvert +xy_in=deg +xy_out=rad "
    "+step +proj=cart +ellps=intl "
    f"+step +proj=helmert +x={DX} +y={DY} +z={DZ} "
    "+step +inv +proj=cart +ellps=WGS84 "
    "+step +proj=unitconvert +xy_in=rad +xy_out=deg")


def _world_grid():
    lon, lat = np.meshgrid(np.arange(-175.0, 176.0, 25.0),
                           np.arange(-80.0, 81.0, 10.0))
    return lon.ravel(), lat.ravel()


@pytest.mark.parametrize("abridged", [False, True])
def test_molodensky_matches_exact_geocentric_path(abridged):
    lon, lat = _world_grid()
    h = np.full_like(lon, 120.0)
    mo = Molodensky(INTL, DX, DY, DZ, DA, DF, abridged=abridged)
    lam2, phi2, h2 = mo.forward(np.radians(lon), np.radians(lat), h)

    exact = PipelineTransformer(EXACT_PIPE)
    lon_e, lat_e, h_e = exact.transform(lon, lat, h)

    # horizontal agreement: first-order method, sub-metre on a
    # ~190 m translation (1e-5 deg ~ 1.1 m)
    assert np.abs(np.degrees(lam2) - lon_e).max() < 1.2e-5
    assert np.abs(np.degrees(phi2) - lat_e).max() < 1.2e-5
    # vertical agreement within a metre
    assert np.abs(h2 - h_e).max() < 1.0


def test_molodensky_roundtrip_first_order():
    lon, lat = _world_grid()
    h = np.zeros_like(lon)
    mo = Molodensky(INTL, DX, DY, DZ, DA, DF)
    lam2, phi2, h2 = mo.forward(np.radians(lon), np.radians(lat), h)
    lam0, phi0, h0 = mo.inverse(lam2, phi2, h2)
    # fwd o inv cancels to second order: |residual| ~ (|shift|/R)^2 * R
    # ~ 0.1-0.2 m for ~350 m of combined translation + ellipsoid change
    assert np.abs(np.degrees(lam0) - lon).max() < 2e-6
    assert np.abs(np.degrees(phi0) - lat).max() < 2e-6
    assert np.abs(h0).max() < 0.2


def test_molodensky_zero_params_is_identity():
    mo = Molodensky(INTL)
    lam, phi, h = mo.forward(np.array([0.3]), np.array([0.8]),
                             np.array([55.0]))
    assert lam[0] == pytest.approx(0.3, abs=1e-15)
    assert phi[0] == pytest.approx(0.8, abs=1e-15)
    assert h[0] == pytest.approx(55.0, abs=1e-9)


def test_pipeline_step_grammar_parses_molodensky():
    p = PipelineTransformer(
        "+proj=pipeline "
        "+step +proj=unitconvert +xy_in=deg +xy_out=rad "
        "+step +proj=molodensky +ellps=intl +dx=-87 +dy=-96 +dz=-120 "
        f"+da={DA} +df={DF!r} +abridged "
        "+step +proj=unitconvert +xy_in=rad +xy_out=deg")
    lon, lat, h = p.transform([2.0], [49.0], [0.0])
    # shift is a few hundred metres, direction south-west-ish here
    assert abs(lon[0] - 2.0) < 0.01 and lon[0] != 2.0
    assert abs(lat[0] - 49.0) < 0.01 and lat[0] != 49.0


def test_abridged_ignores_height_full_uses_it():
    lam = np.radians([10.0])
    phi = np.radians([45.0])
    ab = Molodensky(INTL, DX, DY, DZ, DA, DF, abridged=True)
    fu = Molodensky(INTL, DX, DY, DZ, DA, DF, abridged=False)
    a0 = ab.forward(lam, phi, np.array([0.0]))
    a9 = ab.forward(lam, phi, np.array([9000.0]))
    f0 = fu.forward(lam, phi, np.array([0.0]))
    f9 = fu.forward(lam, phi, np.array([9000.0]))
    # abridged: identical dphi/dlam regardless of h
    assert a0[0][0] == a9[0][0] and a0[1][0] == a9[1][0]
    # full: (M+h)/(N+h) divisors shrink the shift measurably at 9 km
    assert f0[1][0] != f9[1][0]
