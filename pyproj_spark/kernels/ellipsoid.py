"""Ellipsoid parameters and the named-ellipsoid map.

Mirrors the semantics of the reference's ellipsoid resolution
(``pyproj/geod.py:59-112`` param algebra, ``pyproj/list.pyx:21-40``
named map — the constants themselves are PROJ's public ellipsoid
table). Sphere detection threshold matches ``pyproj/geod.py:232``
(|f| < 1e-8).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Ellipsoid:
    a: float                      # semi-major axis (m)
    f: float                      # flattening
    name: str = "unknown"
    rf_exact: float | None = None  # inverse flattening as given (exports)
    b: float = field(init=False)  # semi-minor axis
    e2: float = field(init=False)   # first eccentricity squared
    ep2: float = field(init=False)  # second eccentricity squared
    n: float = field(init=False)    # third flattening

    def __post_init__(self):
        object.__setattr__(self, "b", self.a * (1.0 - self.f))
        e2 = self.f * (2.0 - self.f)
        object.__setattr__(self, "e2", e2)
        object.__setattr__(self, "ep2", e2 / (1.0 - e2) if e2 < 1 else math.inf)
        object.__setattr__(self, "n", self.f / (2.0 - self.f))

    @property
    def e(self) -> float:
        return math.sqrt(self.e2)

    @property
    def rf(self) -> float:
        """Inverse flattening, preserving the exact catalog value."""
        if self.rf_exact is not None:
            return self.rf_exact
        return (1.0 / self.f) if self.f else 0.0

    @property
    def is_sphere(self) -> bool:
        return abs(self.f) < 1e-8

    @classmethod
    def from_params(cls, a: float, b: float | None = None, rf: float | None = None,
                    f: float | None = None, es: float | None = None,
                    e: float | None = None, name: str = "unknown") -> "Ellipsoid":
        """Resolve (a, one-of b/rf/f/es/e) -> Ellipsoid, like pyproj/geod.py:59-112."""
        if b is not None:
            f = (a - b) / a
        elif rf is not None:
            f = 0.0 if rf == 0 else 1.0 / rf
            if name == "unknown":
                name = _name_from_params(float(a), rf=float(rf))
            return cls(a=float(a), f=float(f), name=name,
                       rf_exact=float(rf))
        elif es is not None:
            f = 1.0 - math.sqrt(1.0 - es)
        elif e is not None:
            f = 1.0 - math.sqrt(1.0 - e * e)
        elif f is None:
            f = 0.0
        if name == "unknown":
            name = _name_from_params(float(a), f=float(f))
        return cls(a=float(a), f=float(f), name=name)


def _name_from_params(a: float, rf: float | None = None,
                      f: float | None = None) -> str:
    """Recover the catalog ellipsoid name from (a, rf-or-f) so parsed
    WKT with a recognized figure round-trips byte-identically (the
    reference resolves names through proj.db the same way)."""
    for nm, (ca, crf, cb) in _ELLPS.items():
        if abs(ca - a) > 1e-6:
            continue
        if crf is None:
            crf = 0.0 if cb == ca else 1.0 / ((ca - cb) / ca)
        if rf is not None and abs(crf - rf) <= 1e-9 * max(1.0, abs(crf)):
            return nm
        if f is not None and crf and abs(1.0 / crf - f) <= 1e-15:
            return nm
        if f is not None and not crf and f == 0.0:
            return nm
    return "unknown"


# PROJ's public named-ellipsoid table (subset; a + rf or b).
_ELLPS: dict[str, tuple[float, float | None, float | None]] = {
    # name: (a, rf, b)
    "WGS84": (6378137.0, 298.257223563, None),
    "GRS80": (6378137.0, 298.257222101, None),
    "clrk66": (6378206.4, None, 6356583.8),
    "clrk80": (6378249.145, 293.4663, None),
    "clrk80ign": (6378249.2, 293.4660212936266, None),
    "intl": (6378388.0, 297.0, None),
    "bessel": (6377397.155, 299.1528128, None),
    "krass": (6378245.0, 298.3, None),
    "airy": (6377563.396, None, 6356256.910),
    "WGS72": (6378135.0, 298.26, None),
    "WGS66": (6378145.0, 298.25, None),
    "WGS60": (6378165.0, 298.3, None),
    "GRS67": (6378160.0, 298.2471674270, None),
    "aust_SA": (6378160.0, 298.25, None),
    "helmert": (6378200.0, 298.3, None),
    "evrst30": (6377276.345, 300.8017, None),
    "sphere": (6370997.0, None, 6370997.0),
}


def get_ellipsoid(name: str) -> Ellipsoid:
    try:
        a, rf, b = _ELLPS[name]
    except KeyError:
        raise ValueError(f"unknown ellipsoid {name!r}") from None
    return Ellipsoid.from_params(a=a, rf=rf, b=b, name=name)


WGS84 = get_ellipsoid("WGS84")
