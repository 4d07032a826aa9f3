"""Datum-shift kernels: geodetic<->geocentric and Helmert transforms.

The Spark analogues of PROJ's ``cart`` and ``helmert`` pipeline steps,
which the reference drives through ``proj_trans_generic``
(``pyproj/_transformer.pyx:807-827``). Supports the classic
``+towgs84=`` 3/7-parameter position-vector convention and 14-parameter
time-dependent Helmert (for ITRF frame transformations, tested in the
reference at ``test/test_transformer.py:87-102``).
"""

from __future__ import annotations

import numpy as np

from pyproj_spark.kernels.ellipsoid import Ellipsoid

_AS2RAD = np.pi / (180.0 * 3600.0)  # arc-seconds to radians
_PPM = 1e-6


def geodetic_to_geocentric(E: Ellipsoid, lam, phi, h=None):
    """(lam, phi[, h]) radians/metres -> ECEF (X, Y, Z) metres."""
    if h is None:
        h = np.zeros_like(lam)
    s, c = np.sin(phi), np.cos(phi)
    N = E.a / np.sqrt(1.0 - E.e2 * s * s)
    X = (N + h) * c * np.cos(lam)
    Y = (N + h) * c * np.sin(lam)
    Z = (N * (1.0 - E.e2) + h) * s
    return X, Y, Z


def geocentric_to_geodetic(E: Ellipsoid, X, Y, Z):
    """ECEF -> (lam, phi, h), iterative (Bowring start + fixed point)."""
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    # Bowring's initial guess
    u = np.arctan2(Z * E.a, p * E.b)
    phi = np.arctan2(Z + E.ep2 * E.b * np.sin(u) ** 3,
                     p - E.e2 * E.a * np.cos(u) ** 3)
    for _ in range(6):
        s = np.sin(phi)
        N = E.a / np.sqrt(1.0 - E.e2 * s * s)
        phi = np.arctan2(Z + E.e2 * N * s, p)
    s, c = np.sin(phi), np.cos(phi)
    N = E.a / np.sqrt(1.0 - E.e2 * s * s)
    # height: use the more stable of the two expressions by latitude
    h = np.where(np.abs(c) > 0.1, p / c - N, Z / s - N * (1.0 - E.e2))
    return lam, phi, h


class Helmert:
    """7/14-parameter Helmert, position-vector rotation convention
    (EPSG method 9606/1053). Params: tx ty tz (m), rx ry rz (arc-sec),
    s (ppm); optional rates (per year) + epoch for time-dependence."""

    def __init__(self, tx=0.0, ty=0.0, tz=0.0, rx=0.0, ry=0.0, rz=0.0,
                 s=0.0, dtx=0.0, dty=0.0, dtz=0.0, drx=0.0, dry=0.0,
                 drz=0.0, ds=0.0, t_epoch=None, exact=False):
        self.p = (tx, ty, tz, rx, ry, rz, s)
        self.rates = (dtx, dty, dtz, drx, dry, drz, ds)
        self.t_epoch = t_epoch
        self.time_dependent = t_epoch is not None and any(
            v != 0.0 for v in self.rates)

    @classmethod
    def from_towgs84(cls, params):
        p = list(params) + [0.0] * (7 - len(params))
        return cls(*p)

    def _params_at(self, t):
        tx, ty, tz, rx, ry, rz, s = self.p
        if self.time_dependent and t is not None:
            dt = np.asarray(t, dtype=np.float64) - self.t_epoch
            dtx, dty, dtz, drx, dry, drz, ds = self.rates
            tx = tx + dtx * dt
            ty = ty + dty * dt
            tz = tz + dtz * dt
            rx = rx + drx * dt
            ry = ry + dry * dt
            rz = rz + drz * dt
            s = s + ds * dt
        return tx, ty, tz, rx * _AS2RAD, ry * _AS2RAD, rz * _AS2RAD, s * _PPM

    def forward(self, X, Y, Z, t=None):
        tx, ty, tz, rx, ry, rz, s = self._params_at(t)
        m = 1.0 + s
        X2 = tx + m * (X - rz * Y + ry * Z)
        Y2 = ty + m * (rz * X + Y - rx * Z)
        Z2 = tz + m * (-ry * X + rx * Y + Z)
        return X2, Y2, Z2

    def inverse(self, X, Y, Z, t=None):
        tx, ty, tz, rx, ry, rz, s = self._params_at(t)
        m = 1.0 + s
        dx, dy, dz = (X - tx) / m, (Y - ty) / m, (Z - tz) / m
        # small-angle rotation transpose
        X1 = dx + rz * dy - ry * dz
        Y1 = -rz * dx + dy + rx * dz
        Z1 = ry * dx - rx * dy + dz
        return X1, Y1, Z1

    @property
    def is_identity(self):
        return (not self.time_dependent
                and all(v == 0.0 for v in self.p))


class Molodensky:
    """(Abridged) Molodensky datum shift, EPSG method 9604 (full) /
    9605 (abridged) — the direct geodetic-domain alternative to the
    cart->helmert->cart chain, PROJ's ``+proj=molodensky`` step
    (reference drives it through pipeline transformers,
    ``pyproj/transformer.py:754-803``). Params: dx dy dz (m) geocentric
    translation, da (m) semi-major change, df flattening change, source
    ellipsoid. Formulas are the EPSG Guidance Note 7-2 closed forms —
    pure elementwise numpy, no iteration, so one Arrow crossing batches
    the whole partition."""

    def __init__(self, E: Ellipsoid, dx=0.0, dy=0.0, dz=0.0,
                 da=0.0, df=0.0, abridged=False):
        self.E = E
        self.dx, self.dy, self.dz = float(dx), float(dy), float(dz)
        self.da, self.df = float(da), float(df)
        self.abridged = bool(abridged)

    def _shift(self, lam, phi, h, dx, dy, dz, da, df):
        E = self.E
        sphi, cphi = np.sin(phi), np.cos(phi)
        slam, clam = np.sin(lam), np.cos(lam)
        w2 = 1.0 - E.e2 * sphi * sphi
        w = np.sqrt(w2)
        N = E.a / w
        M = E.a * (1.0 - E.e2) / (w2 * w)
        if self.abridged:
            adffda = E.a * df + E.f * da
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + adffda * np.sin(2.0 * phi)) / M
            dlam = (-dx * slam + dy * clam) / (N * cphi)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi
                  + adffda * sphi * sphi - da)
        else:
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + da * N * E.e2 * sphi * cphi / E.a
                    + df * (M / (1.0 - E.f) + N * (1.0 - E.f))
                    * sphi * cphi) / (M + h)
            dlam = (-dx * slam + dy * clam) / ((N + h) * cphi)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi
                  - da * E.a / N + df * (1.0 - E.f) * N * sphi * sphi)
        return lam + dlam, phi + dphi, h + dh

    def forward(self, lam, phi, h=None):
        """radians/metres in -> radians/metres out."""
        lam = np.asarray(lam, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        h = np.zeros_like(lam) if h is None else np.asarray(h, np.float64)
        return self._shift(lam, phi, h, self.dx, self.dy, self.dz,
                           self.da, self.df)

    def inverse(self, lam, phi, h=None):
        """Negated-parameter shift evaluated on the TARGET ellipsoid
        coordinates — PROJ's molodensky inverse convention (first-order
        exact, like the method itself)."""
        lam = np.asarray(lam, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        h = np.zeros_like(lam) if h is None else np.asarray(h, np.float64)
        return self._shift(lam, phi, h, -self.dx, -self.dy, -self.dz,
                           -self.da, -self.df)
