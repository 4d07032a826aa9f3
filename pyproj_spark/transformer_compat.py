"""Legacy module-level transform()/itransform() (reference
``pyproj/transformer.py`` tail: deprecated in pyproj but still part of
its surface; always_xy-style lon/lat ordering when given Proj objects,
matching the old-API convention the reference tests use)."""

from __future__ import annotations

from pyproj_spark.crs.crs import CRS
from pyproj_spark.plans.spec import Transformer
from pyproj_spark.proj import Proj


def _as_crs(p) -> CRS:
    if isinstance(p, Proj):
        return p.crs
    return CRS.from_user_input(p)


def transform(p1, p2, x, y, z=None, tt=None, radians: bool = False,
              errcheck: bool = False, always_xy: bool = True):
    """One-shot transform between two Proj/CRS objects. NOTE: replans on
    every call — the reference documents this as ~25000x slower than a
    reused Transformer (docs/advanced_examples.rst:13-44); the engine
    memoizes kernels per spec, so repeated calls here only pay python
    dispatch."""
    t = Transformer.from_crs(_as_crs(p1), _as_crs(p2), always_xy=always_xy)
    if z is None:
        return t.transform(x, y, radians=radians, errcheck=errcheck)
    return t.transform(x, y, z, radians=radians, errcheck=errcheck)


def itransform(p1, p2, points, switch: bool = False,
               always_xy: bool = True, **kw):
    t = Transformer.from_crs(_as_crs(p1), _as_crs(p2), always_xy=always_xy)
    return t.itransform(points, switch=switch, **kw)
