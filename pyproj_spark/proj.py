"""Proj — single-CRS lon/lat <-> x/y facade + distortion factors.

Mirrors the reference API (``pyproj/proj.py:48-278``): a Proj IS a
Transformer from the CRS's geodetic base to the CRS, always lon/lat
ordered. ``get_factors`` computes the 12 per-point scale/distortion
factors (``pyproj/_transformer.pyx:1131-1270``) from central-difference
partials of the normalized projection — the same numerical-derivative
approach PROJ's proj_factors uses, validated against the reference's
golden values in tests/test_proj.py.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from pyproj_spark.crs.crs import CRS
from pyproj_spark.plans.spec import Transformer, TransformSpec, get_kernel


class Factors(NamedTuple):
    meridional_scale: np.ndarray
    parallel_scale: np.ndarray
    areal_scale: np.ndarray
    angular_distortion: np.ndarray
    meridian_parallel_angle: np.ndarray
    meridian_convergence: np.ndarray
    tissot_semimajor: np.ndarray
    tissot_semiminor: np.ndarray
    dx_dlam: np.ndarray
    dx_dphi: np.ndarray
    dy_dlam: np.ndarray
    dy_dphi: np.ndarray


class Proj:
    """Performs cartographic transformations lon/lat <-> native x/y."""

    def __init__(self, projparams=None, preserve_units: bool = True,
                 **kwargs):
        self.crs = CRS.from_user_input(projparams) if not kwargs else \
            CRS(projparams, **kwargs)
        self._t = Transformer.from_crs(self.crs.geodetic_crs, self.crs,
                                       always_xy=True)

    def __call__(self, longitude, latitude, inverse: bool = False,
                 errcheck: bool = False, radians: bool = False):
        direction = "INVERSE" if inverse else "FORWARD"
        return self._t.transform(longitude, latitude, radians=radians,
                                 errcheck=errcheck, direction=direction)

    def to_latlong(self) -> "Proj":
        return Proj(self.crs.geodetic_crs)

    def to_latlong_def(self) -> str:
        """proj string of the geographic CRS — reference proj.py:180."""
        return self.crs.geodetic_crs.to_proj4()

    def definition_string(self) -> str:
        """proj-string definition — reference proj.py:168-178."""
        return self.crs.to_proj4()

    def is_exact_same(self, other) -> bool:
        return self.crs.is_exact_same(getattr(other, "crs", other))

    def get_factors(self, longitude, latitude, radians: bool = False,
                    errcheck: bool = False) -> Factors:
        """12 distortion factors per point — reference
        ``pyproj/proj.py:204-278``. Non-finite inputs yield inf
        (in-band), or raise with errcheck=True."""
        scalar = np.isscalar(longitude) and np.isscalar(latitude)
        lon = np.atleast_1d(np.asarray(longitude, dtype=np.float64))
        lat = np.atleast_1d(np.asarray(latitude, dtype=np.float64))
        lon, lat = np.broadcast_arrays(lon, lat)
        shape = lon.shape
        lon = lon.ravel().copy()
        lat = lat.ravel().copy()
        if radians:
            lon, lat = np.degrees(lon), np.degrees(lat)
        bad = ~np.isfinite(lon) | ~np.isfinite(lat) | (np.abs(lat) > 90.0)
        if errcheck and bad.any():
            raise RuntimeError(f"factors error on {int(bad.sum())} point(s)")
        lon = np.where(bad, 0.0, lon)
        lat = np.where(bad, 0.0, lat)

        E = self.crs.ellipsoid
        spec = TransformSpec(self.crs.geodetic_crs.srs, self.crs.srs,
                             always_xy=True)
        k = get_kernel(spec)
        hstep = 1e-5  # radians; same scale PROJ's proj_factors uses

        def fwd(lo, la):
            x, y, _ = k(lo, la)
            return x, y

        hd = np.degrees(hstep)
        xe, ye = fwd(lon + hd, lat)
        xw, yw = fwd(lon - hd, lat)
        xn, yn = fwd(lon, lat + hd)
        xs, ys = fwd(lon, lat - hd)
        a = E.a
        # normalized partials (per radian of geodetic angle, per a metres)
        dx_dlam = (xe - xw) / (2 * hstep) / a
        dy_dlam = (ye - yw) / (2 * hstep) / a
        dx_dphi = (xn - xs) / (2 * hstep) / a
        dy_dphi = (yn - ys) / (2 * hstep) / a
        # account for non-metre units (e.g. EPSG:2263 ftUS)
        u = self.crs.to_meter or 1.0
        if u != 1.0:
            dx_dlam, dy_dlam = dx_dlam * u, dy_dlam * u
            dx_dphi, dy_dphi = dx_dphi * u, dy_dphi * u

        # factors follow the projection's own sphere/ellipsoid convention
        # (webmerc/eqc are spherical by definition — PROJ does the same)
        proj_obj = k.proj_dst if not k.noop else None
        e2 = 0.0 if (proj_obj is not None
                     and getattr(proj_obj, "spherical_factors", False)) \
            else E.e2
        phi = np.radians(lat)
        sphi = np.sin(phi)
        w2 = 1.0 - e2 * sphi * sphi
        m_over_a = (1.0 - e2) / w2 ** 1.5      # M/a (meridional radius)
        ncos_over_a = np.cos(phi) / np.sqrt(w2)  # N cos(phi)/a

        with np.errstate(all="ignore"):
            h = np.hypot(dx_dphi, dy_dphi) / m_over_a
            kk = np.hypot(dx_dlam, dy_dlam) / ncos_over_a
            s = ((dy_dphi * dx_dlam - dx_dphi * dy_dlam)
                 / (m_over_a * ncos_over_a))
            apbp = np.sqrt(np.maximum(h * h + kk * kk + 2.0 * s, 0.0))
            ambp = np.sqrt(np.maximum(h * h + kk * kk - 2.0 * s, 0.0))
            t_a = (apbp + ambp) / 2.0
            t_b = (apbp - ambp) / 2.0
            omega = 2.0 * np.degrees(np.arcsin(
                np.clip(ambp / apbp, -1.0, 1.0)))
            theta_p = np.degrees(np.arcsin(np.clip(s / (h * kk),
                                                   -1.0, 1.0)))
            conv = np.degrees(np.arctan2(-dx_dphi, dy_dphi))

        out = [h, kk, s, omega, theta_p, conv, t_a, t_b,
               dx_dlam, dx_dphi, dy_dlam, dy_dphi]
        res = []
        for arr in out:
            arr = np.where(bad | ~np.isfinite(arr), np.inf, arr)
            arr = arr.reshape(shape)
            res.append(float(arr[0]) if scalar and arr.size == 1 else arr)
        return Factors(*res)

    def __repr__(self):
        return f"Proj({self.crs.srs!r})"
