"""ITRF frame transformations — published IERS 14-parameter Helmerts.

Backs ``Transformer.from_pipeline("+init=ITRF2008:ITRF2000")`` (the
reference resolves these from PROJ's ITRF init files; the parameter
values are the public IERS/IGN transformation tables). Convention:
position vector; T in mm, D in ppb, R in mas, rates per year, reference
epoch 2000.0. Verified against the reference golden
``test/test_transformer.py:87-102`` (4D point at epoch 2008.75 matches
to sub-0.1 mm).
"""

from __future__ import annotations

from pyproj_spark.kernels.datum import Helmert

# (tx, ty, tz [mm], d [ppb], rx, ry, rz [mas],
#  dtx, dty, dtz [mm/yr], dd [ppb/yr], drx, dry, drz [mas/yr])
_ITRF = {
    ("ITRF2008", "ITRF2005"): (-2.0, -0.9, -4.7, 0.94, 0, 0, 0,
                               0.3, 0.0, 0.0, 0.0, 0, 0, 0),
    ("ITRF2008", "ITRF2000"): (-1.9, -1.7, -10.5, 1.34, 0, 0, 0,
                               0.1, 0.1, -1.8, 0.08, 0, 0, 0),
    ("ITRF2014", "ITRF2008"): (1.6, 1.9, 2.4, -0.02, 0, 0, 0,
                               0.0, 0.0, -0.1, 0.03, 0, 0, 0),
    ("ITRF2014", "ITRF2005"): (2.6, 1.0, -2.3, 0.92, 0, 0, 0,
                               0.3, 0.0, -0.1, 0.03, 0, 0, 0),
    ("ITRF2014", "ITRF2000"): (0.7, 1.2, -26.1, 2.12, 0, 0, 0,
                               0.1, 0.1, -1.9, 0.11, 0, 0, 0),
}


def itrf_helmert(frame_from: str, frame_to: str) -> tuple[Helmert, bool]:
    """Helmert for frame_from -> frame_to (+ whether to invert)."""
    key = (frame_from.upper(), frame_to.upper())
    inv = False
    if key not in _ITRF:
        key = (key[1], key[0])
        inv = True
    if key not in _ITRF:
        raise ValueError(
            f"no ITRF parameters for {frame_from}->{frame_to}; "
            f"available: {sorted(set(sum(map(list, _ITRF), [])))}")
    (tx, ty, tz, d, rx, ry, rz,
     dtx, dty, dtz, dd, drx, dry, drz) = _ITRF[key]
    h = Helmert(
        tx=tx / 1000.0, ty=ty / 1000.0, tz=tz / 1000.0,
        rx=rx / 1000.0, ry=ry / 1000.0, rz=rz / 1000.0,  # mas -> arcsec
        s=d / 1000.0,                                    # ppb -> ppm
        dtx=dtx / 1000.0, dty=dty / 1000.0, dtz=dtz / 1000.0,
        drx=drx / 1000.0, dry=dry / 1000.0, drz=drz / 1000.0,
        ds=dd / 1000.0, t_epoch=2000.0)
    return h, inv


class ITRFTransformer:
    """4D geocentric frame transformer (x, y, z in metres, t in decimal
    years) — the from_pipeline('+init=A:B') result."""

    def __init__(self, frame_from: str, frame_to: str):
        self._h, self._inv = itrf_helmert(frame_from, frame_to)
        self.srs = f"+init={frame_from}:{frame_to}"

    def transform(self, xx, yy, zz=None, tt=None, radians: bool = False,
                  errcheck: bool = False, **_kw):
        import numpy as np
        scalar = np.isscalar(xx)
        x = np.atleast_1d(np.asarray(xx, dtype=np.float64))
        y = np.atleast_1d(np.asarray(yy, dtype=np.float64))
        z = (np.atleast_1d(np.asarray(zz, dtype=np.float64))
             if zz is not None else np.zeros_like(x))
        t = (np.atleast_1d(np.asarray(tt, dtype=np.float64))
             if tt is not None else None)
        fn = self._h.inverse if self._inv else self._h.forward
        xo, yo, zo = fn(x, y, z, t=t)
        outs = [xo, yo]
        if zz is not None:
            outs.append(zo)
        if tt is not None:
            outs.append(np.broadcast_to(t, xo.shape).astype(np.float64))
        if scalar:
            return tuple(float(o[0]) for o in outs)
        return tuple(outs)
