"""Vectorized Karney geodesics (direct + inverse) in pure numpy.

Re-implements the semantics of the reference's Geod kernels
(``pyproj/geod.py:239-421``, ``pyproj/_geod.pyx:102-303``, which wrap
Karney's C geodesic library) from the published algorithm:
C.F.F. Karney, "Algorithms for geodesics", J. Geodesy 87, 43-55 (2013).

All series coefficients below were DERIVED symbolically from the
geodesic integrals with sympy (``tools/derive_geodesic_series.py``) and
cross-checked against the paper; order 6 in the expansion parameter
epsilon gives ~1e-9 m round-off-level accuracy for |f| < 1/150, well
inside pyproj's test tolerances (decimal=3 on distances,
``test/test_geod.py:41-75``; decimal=7 on the segment fixtures).

Differences vs geographiclib: everything is numpy-vectorized over the
whole batch (mask-and-iterate Newton instead of per-point loops), and
the Newton derivative is a safeguarded finite difference with a
bisection fallback on the bracketing interval (lambda12 is monotonic in
alpha1), trading a few extra series evaluations for robustness.
"""

from __future__ import annotations

import numpy as np

from pyproj_spark.kernels.ellipsoid import Ellipsoid, get_ellipsoid

_TINY = np.sqrt(np.finfo(np.float64).tiny)
_TOL = np.finfo(np.float64).eps ** 0.75  # ~1e-12 bracket tolerance
_VTOL = 1e-14  # |lambda residual| convergence (rad)
_MAXIT = 60


# --------------------------------------------------------------- angle utils

def sincosd(x):
    """sin/cos of degrees, exact at multiples of 90."""
    x = np.asarray(x, dtype=np.float64)
    r = np.remainder(x, 360.0)
    q = np.round(r / 90.0)
    t = np.radians(r - 90.0 * q)
    s, c = np.sin(t), np.cos(t)
    qm = q.astype(np.int64) % 4
    sin = np.choose(qm, [s, c, -s, -c]) + 0.0
    cos = np.choose(qm, [c, -s, -c, s]) + 0.0
    return sin, cos


def atan2d(y, x):
    return np.degrees(np.arctan2(y, x))


def ang_diff(x, y):
    """(y - x) normalized to (-180, 180]."""
    d = np.remainder(np.asarray(y, dtype=np.float64) - np.asarray(x, dtype=np.float64),
                     360.0)
    return np.where(d > 180.0, d - 360.0, d)


def _norm(s, c):
    h = np.hypot(s, c)
    return s / h, c / h


# ----------------------------------------------------- series (sympy-derived)

def _a1m1(eps):
    e2 = eps * eps
    t = e2 * (e2 * (e2 / 256.0 + 1.0 / 64.0) + 0.25)
    return (t + eps) / (1.0 - eps)          # A1 - 1


def _a2m1(eps):
    e2 = eps * eps
    t = e2 * (e2 * (-11.0 / 256.0 * e2 - 7.0 / 64.0) - 0.75)
    return (t - eps) / (1.0 + eps)          # A2 - 1


def _c1(eps):
    """C1[1..6] each shaped like eps."""
    e2 = eps * eps
    return [
        eps * (-0.5 + e2 * (3.0 / 16.0 - e2 / 32.0)),
        e2 * (-1.0 / 16.0 + e2 * (1.0 / 32.0 - 9.0 / 2048.0 * e2)),
        eps * e2 * (-1.0 / 48.0 + e2 * (3.0 / 256.0)),
        e2 * e2 * (-5.0 / 512.0 + e2 * (3.0 / 512.0)),
        eps * e2 * e2 * (-7.0 / 1280.0),
        e2 * e2 * e2 * (-7.0 / 2048.0),
    ]


def _c1p(eps):
    """C1'[1..6] — reversion series."""
    e2 = eps * eps
    return [
        eps * (0.5 + e2 * (-9.0 / 32.0 + e2 * (205.0 / 1536.0))),
        e2 * (5.0 / 16.0 + e2 * (-37.0 / 96.0 + e2 * (1335.0 / 4096.0))),
        eps * e2 * (29.0 / 96.0 + e2 * (-75.0 / 128.0)),
        e2 * e2 * (539.0 / 1536.0 + e2 * (-2391.0 / 2560.0)),
        eps * e2 * e2 * (3467.0 / 7680.0),
        e2 * e2 * e2 * (38081.0 / 61440.0),
    ]


def _c2(eps):
    e2 = eps * eps
    return [
        eps * (0.5 + e2 * (1.0 / 16.0 + e2 / 32.0)),
        e2 * (3.0 / 16.0 + e2 * (1.0 / 32.0 + 35.0 / 2048.0 * e2)),
        eps * e2 * (5.0 / 48.0 + e2 * (5.0 / 256.0)),
        e2 * e2 * (35.0 / 512.0 + e2 * (7.0 / 512.0)),
        eps * e2 * e2 * (63.0 / 1280.0),
        e2 * e2 * e2 * (77.0 / 2048.0),
    ]


def _sin_series(sinx, cosx, c):
    """Clenshaw sum of c[l-1]*sin(2*l*x), l = 1..len(c)."""
    ar = 2.0 * (cosx - sinx) * (cosx + sinx)  # 2 cos(2x)
    y0 = np.zeros(np.broadcast(sinx, cosx).shape)
    y1 = np.zeros_like(y0)
    for k in range(len(c) - 1, -1, -1):
        y1 = ar * y0 - y1 + c[k]
        y0, y1 = y1, y0
    return 2.0 * sinx * cosx * y0


class Geodesic:
    """Karney geodesics on an ellipsoid (a, f) — all methods vectorized."""

    def __init__(self, ellps: Ellipsoid | str = "WGS84",
                 a: float | None = None, f: float | None = None):
        if a is not None:
            self.E = Ellipsoid(a=float(a), f=float(f or 0.0))
        elif isinstance(ellps, str):
            self.E = get_ellipsoid(ellps)
        else:
            self.E = ellps
        E = self.E
        self.a, self.f, self.b = E.a, E.f, E.b
        self.e2, self.ep2, self.n = E.e2, E.ep2, E.n
        self.f1 = 1.0 - self.f
        n = self.n
        # n-dependent parts of the A3 / C3 series (constants per ellipsoid):
        # A3 = 1 + sum_k a3x[k] * eps^(k+1)
        self._a3x = [
            -(0.5 - n / 2.0),
            -(0.25 + n / 8.0 - 3.0 * n * n / 8.0),
            -(1.0 / 16.0 + 3.0 * n / 16.0 + n * n / 16.0),
            -(3.0 / 64.0 + n / 32.0),
            -3.0 / 128.0,
        ]
        # C3[l] = sum_k c3x[l][k] * eps^(k+1) starting at eps^l
        nn = n * n
        self._c3x = [
            # C3[1]: coeffs of eps^1..eps^5
            [(1.0 - n) / 4.0, (1.0 - nn) / 8.0,
             (3.0 + 3.0 * n - nn) / 64.0, (5.0 + 2.0 * n) / 128.0, 3.0 / 128.0],
            # C3[2]: eps^2..eps^5
            [(1.0 / 16.0 - 3.0 * n / 32.0 + nn / 32.0),
             (3.0 / 64.0 - n / 32.0 - 3.0 * nn / 64.0),
             (3.0 + n) / 128.0, 5.0 / 256.0],
            # C3[3]: eps^3..eps^5
            [(5.0 / 192.0 - 3.0 * n / 64.0 + 5.0 * nn / 192.0),
             (3.0 / 128.0 - 5.0 * n / 192.0), 7.0 / 512.0],
            # C3[4]: eps^4..eps^5
            [(7.0 / 512.0 - 7.0 * n / 256.0), 7.0 / 512.0],
            # C3[5]: eps^5
            [21.0 / 2560.0],
        ]

    # -- ellipsoid-frame helpers ------------------------------------------

    def _beta(self, lat):
        """Reduced latitude -> normalized (sin beta, cos beta), cos >= tiny."""
        s, c = sincosd(lat)
        sb, cb = _norm(self.f1 * s, c)
        cb = np.maximum(cb, _TINY)
        return sb, cb

    def _a3f(self, eps):
        out = np.ones_like(eps)
        p = np.ones_like(eps)
        for coef in self._a3x:
            p = p * eps
            out = out + coef * p
        return out

    def _c3f(self, eps):
        out = []
        for ll, coeffs in enumerate(self._c3x, start=1):
            p = eps ** ll
            acc = np.zeros_like(eps)
            for k, coef in enumerate(coeffs):
                acc = acc + coef * p
                p = p * eps
            out.append(acc)
        return out

    @staticmethod
    def _eps(k2):
        sq = np.sqrt(1.0 + k2)
        return k2 / (sq + 1.0) ** 2

    def _lengths(self, eps, ssig1, csig1, ssig2, csig2, sig12, k2):
        """(s12/b, m12/b) between sigma1 and sigma2 on one geodesic."""
        a1 = 1.0 + _a1m1(eps)
        a2 = 1.0 + _a2m1(eps)
        c1 = _c1(eps)
        c2 = _c2(eps)
        b1 = _sin_series(ssig2, csig2, c1) - _sin_series(ssig1, csig1, c1)
        b2 = _sin_series(ssig2, csig2, c2) - _sin_series(ssig1, csig1, c2)
        s12b = a1 * (sig12 + b1)
        # J = I1 - I2
        j12 = (a1 - a2) * sig12 + (a1 * b1 - a2 * b2)
        dn1 = np.sqrt(1.0 + k2 * ssig1 ** 2)
        dn2 = np.sqrt(1.0 + k2 * ssig2 ** 2)
        m12b = dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2) - csig1 * csig2 * j12
        return s12b, m12b

    # -- direct problem ----------------------------------------------------

    def direct(self, lon1, lat1, az1, s12):
        """Direct geodesic: start + forward azimuth + distance -> end + fwd az.

        Returns (lon2, lat2, az2_forward) in degrees. Mirrors
        ``pyproj/geod.py:239-329`` semantics (there az21 is additionally
        flipped by 180 deg when return_back_azimuth=True — done by the
        Geod wrapper, not here).
        """
        lon1, lat1, az1, s12 = np.broadcast_arrays(
            *[np.asarray(v, dtype=np.float64) for v in (lon1, lat1, az1, s12)])
        sa1, ca1 = sincosd(az1)
        sb1, cb1 = self._beta(np.clip(lat1, -90.0, 90.0))
        # Clairaut constant
        sa0 = sa1 * cb1
        ca0 = np.hypot(ca1, sa1 * sb1)
        # sigma1, omega1
        both0 = (sb1 == 0) & (ca1 == 0)
        ssig1 = np.where(both0, 0.0, sb1)
        csig1 = np.where(both0, 1.0, ca1 * cb1)
        ssig1, csig1 = _norm(ssig1, csig1)
        somg1, comg1 = _norm(sa0 * ssig1, csig1)

        k2 = self.ep2 * ca0 ** 2
        eps = self._eps(k2)
        a1s = 1.0 + _a1m1(eps)
        c1 = _c1(eps)
        b11 = _sin_series(ssig1, csig1, c1)
        sb11, cb11 = np.sin(b11), np.cos(b11)
        # tau1 = sigma1 + B11
        stau1 = ssig1 * cb11 + csig1 * sb11
        ctau1 = csig1 * cb11 - ssig1 * sb11
        tau12 = s12 / (self.b * a1s)
        st12, ct12 = np.sin(tau12), np.cos(tau12)
        # tau2 = tau1 + tau12
        stau2 = stau1 * ct12 + ctau1 * st12
        ctau2 = ctau1 * ct12 - stau1 * st12
        c1p = _c1p(eps)
        b12p = _sin_series(stau2, ctau2, c1p)
        sb12, cb12 = np.sin(b12p), np.cos(b12p)
        ssig2 = stau2 * cb12 + ctau2 * sb12
        csig2 = ctau2 * cb12 - stau2 * sb12

        sb2 = ca0 * ssig2
        cb2 = np.hypot(sa0, ca0 * csig2)
        somg2, comg2 = _norm(sa0 * ssig2, csig2)

        # continuous sigma12 (supports multi-wrap long lines)
        b12 = _sin_series(ssig2, csig2, c1)
        sig12 = tau12 - (b12 - b11)
        # wrapped omega12 + unwrap to follow sigma
        omg12_w = np.arctan2(somg2 * comg1 - comg2 * somg1,
                             comg2 * comg1 + somg2 * somg1)
        omg12 = omg12_w + 2.0 * np.pi * np.floor(
            (sig12 - omg12_w) / (2.0 * np.pi) + 0.5)
        a3 = self._a3f(eps)
        c3 = self._c3f(eps)
        sig1 = np.arctan2(ssig1, csig1)
        b31 = _sin_series(ssig1, csig1, c3)
        b32 = _sin_series(ssig2, csig2, c3)
        lam12 = omg12 - self.f * sa0 * a3 * (sig12 + (b32 - b31))
        lon2 = lon1 + np.degrees(lam12)
        lon2 = np.remainder(lon2 + 180.0, 360.0) - 180.0
        lat2 = atan2d(sb2, self.f1 * cb2)
        az2 = atan2d(sa0, ca0 * csig2)
        return lon2, lat2, az2

    # -- inverse problem ---------------------------------------------------

    def _lambda12(self, alp1, sb1, cb1, sb2, cb2):
        """Given alpha1 (rad) in canonical config, predicted lambda12 (rad)
        plus state needed downstream."""
        salp1, calp1 = np.sin(alp1), np.cos(alp1)
        salp1 = np.maximum(salp1, _TINY)  # canonical: alpha1 in (0, pi)
        sa0 = salp1 * cb1
        ca0 = np.hypot(calp1, salp1 * sb1)
        # sigma1 / omega1
        ssig1, csig1 = _norm(sb1, calp1 * cb1)
        somg1, comg1 = _norm(sa0 * ssig1, csig1)
        # alpha2 (cos >= 0 in canonical config |beta2| <= |beta1|)
        salp2 = sa0 / cb2
        calp2 = np.sqrt(np.maximum(
            (calp1 * cb1) ** 2 + (cb2 - cb1) * (cb2 + cb1), 0.0)) / cb2
        ssig2, csig2 = _norm(sb2, calp2 * cb2)
        somg2, comg2 = _norm(sa0 * ssig2, csig2)

        sig12 = np.arctan2(
            np.maximum(csig1 * ssig2 - ssig1 * csig2, 0.0),
            csig1 * csig2 + ssig1 * ssig2)
        omg12 = np.arctan2(
            np.maximum(comg1 * somg2 - somg1 * comg2, 0.0),
            comg1 * comg2 + somg1 * somg2)
        k2 = self.ep2 * ca0 ** 2
        eps = self._eps(k2)
        a3 = self._a3f(eps)
        c3 = self._c3f(eps)
        b31 = _sin_series(ssig1, csig1, c3)
        b32 = _sin_series(ssig2, csig2, c3)
        lam12 = omg12 - self.f * sa0 * a3 * (sig12 + (b32 - b31))
        state = (salp1, calp1, salp2, calp2, ssig1, csig1, ssig2, csig2,
                 sig12, eps, k2)
        return lam12, state

    def inverse(self, lon1, lat1, lon2, lat2):
        """Inverse geodesic -> (az1_fwd, az2_fwd, s12) degrees/metres.

        az2 is the FORWARD azimuth at point 2 (direction of travel); the
        Geod wrapper flips it to a back azimuth to match
        ``pyproj/_geod.pyx:294-295``.
        """
        lon1, lat1, lon2, lat2 = np.broadcast_arrays(
            *[np.asarray(v, dtype=np.float64) for v in (lon1, lat1, lon2, lat2)])
        lat1 = np.clip(lat1, -90.0, 90.0)
        lat2 = np.clip(lat2, -90.0, 90.0)
        lon12 = ang_diff(lon1, lon2)
        lonsign = np.where(lon12 >= 0.0, 1.0, -1.0)
        lam12d = lon12 * lonsign  # [0, 180]
        swap = np.abs(lat1) < np.abs(lat2)
        la1 = np.where(swap, lat2, lat1)
        la2 = np.where(swap, lat1, lat2)
        latsign = np.where(la1 <= 0.0, 1.0, -1.0)
        la1 = la1 * latsign
        la2 = la2 * latsign
        sb1, cb1 = self._beta(la1)
        sb2, cb2 = self._beta(la2)
        # tie symmetric cases together exactly
        eq_lat = np.abs(sb1) == np.abs(sb2)
        sb2 = np.where(eq_lat, np.sign(sb2) * np.abs(sb1), sb2)
        cb2 = np.where(eq_lat, cb1, cb2)
        lam12 = np.radians(lam12d)

        n_pts = lam12.shape[0] if lam12.ndim else 1
        shape = lam12.shape
        salp1 = np.zeros(shape)
        calp1 = np.ones(shape)
        salp2 = np.zeros(shape)
        calp2 = np.ones(shape)
        s12 = np.zeros(shape)

        meridional = (lam12d == 0.0) | (lam12d == 180.0)
        # --- meridional candidate -----------------------------------------
        if meridional.any():
            over_pole = lam12d == 180.0
            ssig1m = sb1
            csig1m = np.where(over_pole, -cb1, cb1)
            ssig2m = sb2
            csig2m = cb2
            sig12m = np.arctan2(ssig2m, csig2m) - np.arctan2(ssig1m, csig1m)
            k2m = np.full(shape, self.ep2)
            epsm = self._eps(k2m)
            s12bm, m12bm = self._lengths(
                epsm, ssig1m, csig1m, ssig2m, csig2m, sig12m, k2m)
            ok = meridional & ((sig12m < 1.0) | (m12bm >= 0.0))
            salp1 = np.where(ok, 0.0, salp1)
            calp1 = np.where(ok, np.where(over_pole, -1.0, 1.0), calp1)
            salp2 = np.where(ok, 0.0, salp2)
            calp2 = np.where(ok, 1.0, calp2)
            s12 = np.where(ok, s12bm * self.b, s12)
            meridional = ok

        # --- equatorial candidate -----------------------------------------
        equatorial = ((sb1 == 0.0) & (sb2 == 0.0)
                      & (lam12d <= self.f1 * 180.0) & ~meridional)
        if equatorial.any():
            salp1 = np.where(equatorial, 1.0, salp1)
            calp1 = np.where(equatorial, 0.0, calp1)
            salp2 = np.where(equatorial, 1.0, salp2)
            calp2 = np.where(equatorial, 0.0, calp2)
            s12 = np.where(equatorial, self.a * lam12, s12)

        general = ~(meridional | equatorial)
        if general.any():
            g = general
            alp1 = self._inverse_start(
                sb1[g], cb1[g], sb2[g], cb2[g], lam12[g])
            alp1, st = self._newton(alp1, sb1[g], cb1[g], sb2[g], cb2[g],
                                    lam12[g])
            (sa1g, ca1g, sa2g, ca2g, ssig1, csig1, ssig2, csig2,
             sig12, eps, k2) = st
            s12b, _ = self._lengths(eps, ssig1, csig1, ssig2, csig2,
                                    sig12, k2)
            salp1[g] = sa1g
            calp1[g] = ca1g
            salp2[g] = sa2g
            calp2[g] = ca2g
            s12[g] = s12b * self.b

        # --- undo canonicalization ----------------------------------------
        # Swapping endpoints solves B->A whose lon-sign is -lonsign; mapping
        # its forward azimuths back to A->B reverses direction (sin & cos
        # negate). Net effect: sin keeps +lonsign, cos gets -latsign.
        sa1n = np.where(swap, salp2, salp1) * lonsign
        sa2n = np.where(swap, salp1, salp2) * lonsign
        ca1n = np.where(swap, -calp2, calp1) * latsign
        ca2n = np.where(swap, -calp1, calp2) * latsign
        az1 = atan2d(sa1n, ca1n)
        az2 = atan2d(sa2n, ca2n)
        return az1, az2, s12

    def _inverse_start(self, sb1, cb1, sb2, cb2, lam12):
        """Initial alpha1 (rad) — Karney 2013 section 5 (incl. astroid for
        nearly-antipodal)."""
        sbet12 = sb2 * cb1 - cb2 * sb1
        cbet12 = cb2 * cb1 + sb2 * sb1
        sbet12a = sb2 * cb1 + cb2 * sb1
        shortline = (cbet12 >= 0.0) & (sbet12 < 0.5) & (cb2 * lam12 < 0.5)
        # midpoint flattening correction for short lines
        sbetm2 = (sb1 + sb2) ** 2
        sbetm2 = sbetm2 / (sbetm2 + (cb1 + cb2) ** 2)
        dnm = np.sqrt(1.0 + self.ep2 * sbetm2)
        omg12 = np.where(shortline, lam12 / (self.f1 * dnm), lam12)
        somg12, comg12 = np.sin(omg12), np.cos(omg12)

        salp1 = cb2 * somg12
        with np.errstate(divide="ignore", invalid="ignore"):
            calp1 = np.where(
                comg12 >= 0.0,
                sbet12 + cb2 * sb1 * somg12 ** 2
                / np.where(comg12 >= 0.0, 1.0 + comg12, 1.0),
                sbet12a - cb2 * sb1 * somg12 ** 2
                / np.where(comg12 >= 0.0, 1.0, 1.0 - comg12),
            )
        ssig12 = np.hypot(salp1, calp1)
        csig12 = sb1 * sb2 + cb1 * cb2 * comg12

        # nearly-antipodal test
        antip = (~shortline) & (csig12 < 0.0) & (
            ssig12 < 6.0 * np.abs(self.n) * np.pi * cb1 ** 2)
        if antip.any():
            k2 = sb1[antip] ** 2 * self.ep2
            eps = self._eps(k2)
            lamscale = self.f * cb1[antip] * self._a3f(eps) * np.pi
            betscale = lamscale * cb1[antip]
            x = (lam12[antip] - np.pi) / lamscale
            y = sbet12a[antip] / betscale
            k = _astroid(x, y)
            omg12a = lamscale * (-x * k / (1.0 + k))
            somg = np.sin(omg12a)
            comg = -np.cos(omg12a)
            sa = cb2[antip] * somg
            ca = sbet12a[antip] - (cb2[antip] * sb1[antip] * somg ** 2
                                   / (1.0 - comg))
            # y == 0 degenerate: beta1 + beta2 == 0 exactly
            ydeg = y > -np.finfo(float).eps * 0.1
            sa = np.where(ydeg, np.minimum(1.0, -x), sa)
            ca = np.where(ydeg, -np.sqrt(np.maximum(0.0, 1.0 - sa ** 2)), ca)
            salp1[antip] = sa
            calp1[antip] = ca
        salp1, calp1 = _norm(np.maximum(salp1, _TINY), calp1)
        return np.arctan2(salp1, calp1)

    def _newton(self, alp1, sb1, cb1, sb2, cb2, lam12):
        """Safeguarded FD-Newton on v(alpha1) = lambda12(alpha1) - lam12.

        v is monotonically increasing in alpha1 on (0, pi)."""
        lo = np.full_like(alp1, _TINY)
        hi = np.full_like(alp1, np.pi - 1e-12)
        alp1 = np.clip(alp1, lo, hi)
        h = 1e-8
        active = np.ones(alp1.shape, dtype=bool)
        lam_pred, state = self._lambda12(alp1, sb1, cb1, sb2, cb2)
        for _ in range(_MAXIT):
            v = lam_pred - lam12
            conv = np.abs(v) <= _VTOL
            active = active & ~conv & ((hi - lo) > _TOL * 1e-3)
            if not active.any():
                break
            # maintain bracket
            lo = np.where(active & (v < 0.0) & (alp1 > lo), alp1, lo)
            hi = np.where(active & (v > 0.0) & (alp1 < hi), alp1, hi)
            # FD derivative
            ah = np.where(alp1 + h < np.pi, alp1 + h, alp1 - h)
            lam_h, _ = self._lambda12(ah, sb1, cb1, sb2, cb2)
            dv = (lam_h - lam_pred) / (ah - alp1)
            step_ok = dv > 0.0
            cand = np.where(step_ok, alp1 - v / np.where(step_ok, dv, 1.0),
                            alp1)
            bad = ~step_ok | (cand <= lo) | (cand >= hi) | ~np.isfinite(cand)
            cand = np.where(bad, 0.5 * (lo + hi), cand)
            alp1 = np.where(active, cand, alp1)
            lam_new, state_new = self._lambda12(alp1, sb1, cb1, sb2, cb2)
            lam_pred = np.where(active, lam_new, lam_pred)
            state = tuple(np.where(active, sn, so)
                          for sn, so in zip(state_new, state))
        return alp1, state


def _astroid(x, y):
    """Positive root k of k^4 + 2k^3 - (x^2 + y^2 - 1)k^2 - 2y^2 k - y^2 = 0
    (Karney 2013, eq. 65) — vectorized closed form."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p = x * x
    q = y * y
    r = (p + q - 1.0) / 6.0
    out = np.zeros_like(x)
    easy = ~((q == 0.0) & (r <= 0.0))
    # general: solve via the discriminant trick
    S = p * q / 4.0
    r2 = r * r
    r3 = r * r2
    disc = S * (S + 2.0 * r3)
    u = np.where(easy, r, 0.0)
    pos = disc >= 0.0
    T3 = np.where(pos, S + r3, 0.0)
    T3 = T3 + np.where(pos, np.where(T3 < 0.0, -1.0, 1.0) * np.sqrt(np.abs(disc)), 0.0)
    T = np.cbrt(T3)
    u = np.where(easy & pos, r + T + np.where(T != 0.0, r2 / np.where(T != 0.0, T, 1.0), 0.0), u)
    ang = np.arctan2(np.sqrt(np.abs(disc)), -(S + r3))
    u = np.where(easy & ~pos, r * (1.0 + 2.0 * np.cos(ang / 3.0)), u)
    v = np.sqrt(u * u + q)
    safe_vu = np.where(v - u != 0.0, v - u, 1.0)
    uv = np.where(u < 0.0, q / safe_vu, u + v)
    w = (uv - q) / (2.0 * np.where(v != 0.0, v, 1.0))
    # masked (~easy) lanes can carry uv + w*w < 0 garbage; silence the
    # sqrt warning — those lanes are discarded by the final where
    with np.errstate(invalid="ignore"):
        k = uv / (np.sqrt(uv + w * w) + w)
    return np.where(easy, k, 0.0)
