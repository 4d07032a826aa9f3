"""CRS — parsed, typed, picklable description of a coordinate system.

Mirrors the construction surface of the reference
(``pyproj/crs/crs.py:185-350`` from_user_input semantics;
``pyproj/crs/crs.py:67-144`` proj-string/dict normalization) for the
engine's supported families: geographic, geocentric, and projected CRSs
built from the bundled EPSG catalog or from PROJ strings / dicts /
kwargs.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyproj_spark.crs import catalog
from pyproj_spark.kernels.ellipsoid import Ellipsoid, get_ellipsoid

_AUTH_CODE_RE = re.compile(r"^\s*(?P<auth>[A-Za-z]+)\s*:\s*(?P<code>\d+)\s*$")

_NUMERIC_KEYS = {
    "lat_0", "lat_1", "lat_2", "lat_ts", "lon_0", "k", "k_0", "x_0", "y_0",
    "zone", "a", "b", "rf", "f", "es", "e", "R", "to_meter", "h",
    "lonc", "alpha", "gamma", "o_lat_p", "o_lon_p",
}
_FLAG_KEYS = {"south", "no_defs", "wktext", "over"}


def _parse_proj_string(s: str) -> dict:
    """'+proj=utm +zone=10 +ellps=WGS84' -> params dict.
    Mirrors pyproj/crs/crs.py:107-144 normalization (strips +, handles
    flags, numeric coercion). init=EPSG:n is resolved to the catalog."""
    params: dict = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            if k in _NUMERIC_KEYS:
                try:
                    v = int(v) if re.fullmatch(r"-?\d+", v) else float(v)
                except ValueError:
                    pass
            params[k] = v
        else:
            params[tok] = True
    return params


class CRS:
    """Immutable CRS spec. Picklable (pickles as its srs string, like the
    reference — ``pyproj/crs/crs.py:1596-1601``)."""

    def __init__(self, projparams=None, **kwargs):
        obj = _build(projparams, kwargs)
        self.__dict__.update(obj.__dict__ if isinstance(obj, CRS) else obj)

    # internal: bypass __init__ when building from a record
    @classmethod
    def _from_record(cls, rec: dict, srs: str) -> "CRS":
        self = object.__new__(cls)
        self.srs = srs
        self.kind = rec["kind"]
        self.name = rec.get("name", "unknown")
        self.epsg_code = rec.get("code")
        self.datum_name = rec.get("datum")
        ellps = rec.get("ellps")
        if ellps is not None:
            self.ellipsoid = get_ellipsoid(ellps)
        else:
            self.ellipsoid = rec["ellipsoid"]
        self.towgs84 = tuple(rec["towgs84"]) if rec.get("towgs84") else None
        self.axis = rec.get("axis", "enu")
        self.proj_params = dict(rec.get("proj_params") or {})
        self.to_meter = rec.get("to_meter")
        return self

    # ----------------------------------------------------------- factories
    @classmethod
    def from_epsg(cls, code: int) -> "CRS":
        return cls._from_record(catalog.epsg_entry(code), f"EPSG:{int(code)}")

    @classmethod
    def from_proj4(cls, s: str) -> "CRS":
        return cls.from_dict(_parse_proj_string(s), srs=s)

    @classmethod
    def from_dict(cls, params: dict, srs: str | None = None) -> "CRS":
        params = dict(params)
        if "init" in params:
            init = str(params.pop("init"))
            m = _AUTH_CODE_RE.match(init)
            if not m or m.group("auth").upper() != "EPSG":
                raise ValueError(f"unsupported init {init!r}")
            return cls.from_epsg(int(m.group("code")))
        proj = params.get("proj")
        if proj is None:
            raise ValueError("proj= parameter required")
        # ellipsoid resolution (pyproj/geod.py:59-112 semantics)
        if "R" in params:
            ellipsoid = Ellipsoid.from_params(a=params["R"], f=0.0,
                                              name="sphere")
        elif "a" in params:
            ellipsoid = Ellipsoid.from_params(
                a=params["a"], b=params.get("b"), rf=params.get("rf"),
                f=params.get("f"), es=params.get("es"), e=params.get("e"))
        elif "ellps" in params:
            ellipsoid = get_ellipsoid(params["ellps"])
        elif "datum" in params:
            ellipsoid = get_ellipsoid(
                catalog.DATUMS[params["datum"]][0])
        else:
            ellipsoid = get_ellipsoid("WGS84")
        towgs84 = None
        if "towgs84" in params:
            towgs84 = tuple(float(v) for v in
                            str(params["towgs84"]).split(","))
        elif "datum" in params:
            towgs84 = catalog.DATUMS[params["datum"]][1]
        elif params.get("ellps") == "WGS84" or (
                "a" not in params and "ellps" not in params and
                "R" not in params):
            towgs84 = (0, 0, 0)
        kind = ("geographic" if proj in ("longlat", "latlong", "lonlat")
                else "geocentric" if proj in ("geocent", "cart")
                else "projected")
        proj_params = {k: v for k, v in params.items()
                       if k not in ("ellps", "datum", "towgs84", "units",
                                    "to_meter", "no_defs", "type",
                                    "wktext")}
        to_meter = None
        if kind != "geographic":
            to_meter = float(params.get("to_meter", 1.0))
            units = params.get("units")
            if units == "us-ft":
                to_meter = catalog.US_FT
            elif units == "ft":
                to_meter = 0.3048
            elif units in (None, "m"):
                pass
            else:
                raise ValueError(f"unsupported units {units!r}")
        rec = dict(kind=kind, name=f"unknown ({proj})", code=None,
                   datum=params.get("datum"), ellps=None,
                   ellipsoid=ellipsoid, towgs84=towgs84, axis="enu",
                   proj_params=proj_params, to_meter=to_meter)
        srs = srs or " ".join(
            f"+{k}" if v is True else f"+{k}={v}"
            for k, v in sorted(params.items()))
        return cls._from_record(rec, srs)

    @classmethod
    def from_user_input(cls, value) -> "CRS":
        """Accepts: CRS, int, 'EPSG:n', ('EPSG', 'n'), proj string, dict —
        reference pyproj/crs/crs.py:477-503."""
        if isinstance(value, CRS):
            return value
        if isinstance(value, int):
            return cls.from_epsg(value)
        if isinstance(value, dict):
            return cls.from_dict(value)
        if isinstance(value, (tuple, list)) and len(value) == 2:
            auth, code = value
            if str(auth).upper() != "EPSG":
                raise ValueError(f"unsupported authority {auth!r}")
            return cls.from_epsg(int(code))
        if isinstance(value, str):
            m = _AUTH_CODE_RE.match(value)
            if m:
                if m.group("auth").upper() != "EPSG":
                    raise ValueError(f"unsupported authority "
                                     f"{m.group('auth')!r}")
                return cls.from_epsg(int(m.group("code")))
            if value.strip().isdigit():
                return cls.from_epsg(int(value))
            if "+" in value or "proj=" in value:
                return cls.from_proj4(value)
        if hasattr(value, "to_wkt"):
            raise ValueError("WKT input is not supported by this engine "
                             "(round-1 scope); use EPSG codes, proj "
                             "strings, or dicts")
        raise ValueError(f"cannot interpret CRS input {value!r}")

    # ---------------------------------------------------------- predicates
    @property
    def is_geographic(self) -> bool:
        return self.kind == "geographic"

    @property
    def is_projected(self) -> bool:
        return self.kind == "projected"

    @property
    def is_geocentric(self) -> bool:
        return self.kind == "geocentric"

    @property
    def geodetic_crs(self) -> "CRS":
        """The underlying geographic CRS (same datum) — reference
        pyproj/crs/crs.py:1174-1190."""
        if self.is_geographic:
            return self
        rec = dict(kind="geographic", name=f"{self.name} (geodetic)",
                   code=None, datum=self.datum_name, ellps=None,
                   ellipsoid=self.ellipsoid, towgs84=self.towgs84,
                   axis="enu", proj_params=dict(proj="longlat"),
                   to_meter=None)
        # srs must stay machine-parseable (TransformSpec re-resolves it
        # on executors), so emit a proj string, not a display name
        e = self.ellipsoid
        srs = f"+proj=longlat +a={e.a!r} +f={e.f!r}"
        if self.towgs84:
            srs += " +towgs84=" + ",".join(str(v) for v in self.towgs84)
        return CRS._from_record(rec, srs)

    # ------------------------------------------------- component accessors
    @property
    def axis_info(self) -> list:
        """Axis descriptors — reference pyproj/crs/crs.py:1093-1120."""
        from types import SimpleNamespace as NS
        if self.is_geocentric:
            return [NS(name=n, abbrev=a, direction=d, unit_name="metre")
                    for n, a, d in (("Geocentric X", "X", "geocentricX"),
                                    ("Geocentric Y", "Y", "geocentricY"),
                                    ("Geocentric Z", "Z", "geocentricZ"))]
        if self.is_geographic:
            lat = NS(name="Geodetic latitude", abbrev="Lat",
                     direction="north", unit_name="degree")
            lon = NS(name="Geodetic longitude", abbrev="Lon",
                     direction="east", unit_name="degree")
            return [lat, lon] if self.axis == "neu" else [lon, lat]
        unit = ("metre" if (self.to_meter or 1.0) == 1.0
                else "US survey foot")
        e_ax = NS(name="Easting", abbrev="E", direction="east",
                  unit_name=unit)
        n_ax = NS(name="Northing", abbrev="N", direction="north",
                  unit_name=unit)
        return [n_ax, e_ax] if self.axis == "neu" else [e_ax, n_ax]

    @property
    def datum(self):
        """Datum descriptor — reference pyproj/crs/crs.py:1122-1138."""
        from types import SimpleNamespace as NS
        return NS(name=self.datum_name or "unknown",
                  type_name="Geodetic Reference Frame",
                  ellipsoid=self.ellipsoid, towgs84=self.towgs84)

    @property
    def prime_meridian(self):
        from types import SimpleNamespace as NS
        return NS(name="Greenwich", longitude=0.0,
                  unit_name="degree")

    @property
    def area_of_use(self):
        """Rough area of use from the datum table — reference
        pyproj/crs/crs.py:1140-1160 (AreaOfUse with .bounds)."""
        from types import SimpleNamespace as NS
        from pyproj_spark.catalog_api import _DATUM_AOU
        w, s, e, n = _DATUM_AOU.get(self.datum_name,
                                    (-180.0, -90.0, 180.0, 90.0))
        return NS(west=w, south=s, east=e, north=n,
                  bounds=(w, s, e, n),
                  name=f"{self.datum_name or 'world'} area of use")

    # ------------------------------------------------------------- exports
    def to_epsg(self):
        return self.epsg_code

    def to_authority(self):
        return ("EPSG", str(self.epsg_code)) if self.epsg_code else None

    def to_proj4(self) -> str:
        parts = []
        for k, v in self.proj_params.items():
            parts.append(f"+{k}" if v is True else f"+{k}={v}")
        e = self.ellipsoid
        if e.name != "unknown":
            parts.append(f"+ellps={e.name}")
        else:
            parts.append(f"+a={e.a} +f={e.f}")
        if self.towgs84:
            parts.append("+towgs84=" + ",".join(str(v) for v in self.towgs84))
        if self.to_meter not in (None, 1.0):
            parts.append(f"+to_meter={self.to_meter}")
        parts.append("+no_defs")
        return " ".join(parts)

    def to_json_dict(self) -> dict:
        """Minimal PROJJSON-shaped export (reference crs.py:1242-1274)."""
        e = self.ellipsoid
        return {
            "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
            "type": {"geographic": "GeographicCRS",
                     "geocentric": "GeodeticCRS",
                     "projected": "ProjectedCRS"}[self.kind],
            "name": self.name,
            "datum": {
                "type": "GeodeticReferenceFrame",
                "name": self.datum_name or "unknown",
                "ellipsoid": {"name": e.name, "semi_major_axis": e.a,
                              "inverse_flattening":
                                  (1.0 / e.f) if e.f else 0.0},
            },
            "id": ({"authority": "EPSG", "code": self.epsg_code}
                   if self.epsg_code else None),
            "conversion": ({"method": self.proj_params.get("proj"),
                            "parameters": {
                                k: v for k, v in self.proj_params.items()
                                if k != "proj"}}
                           if self.is_projected else None),
        }

    def to_json(self) -> str:
        import json
        return json.dumps(self.to_json_dict())

    def to_cf(self) -> dict:
        """CF-1.8 grid-mapping dict — reference pyproj/crs/crs.py:620-756."""
        from pyproj_spark.crs.cf import to_cf
        return to_cf(self)

    @classmethod
    def from_cf(cls, in_cf: dict) -> "CRS":
        """CRS from a CF grid-mapping dict — reference crs.py:758-876."""
        from pyproj_spark.crs.cf import from_cf
        return from_cf(in_cf)

    def to_wkt(self, version: str = "WKT2_2019", pretty: bool = False
               ) -> str:
        """Minimal WKT2:2019 export — reference pyproj/_crs.pyx:93-102
        (emit only; parsing is out of scope)."""
        if not str(version).startswith("WKT2"):
            raise ValueError("only WKT2_2019 output is supported")
        from pyproj_spark.crs.wkt import to_wkt
        return to_wkt(self, pretty=pretty)

    # ------------------------------------------------------------ equality
    def _key(self):
        e = self.ellipsoid
        return (self.kind, round(e.a, 9), round(e.f, 15), self.towgs84,
                tuple(sorted(self.proj_params.items())), self.to_meter)

    def __eq__(self, other):
        if not isinstance(other, CRS):
            try:
                other = CRS.from_user_input(other)
            except Exception:
                return NotImplemented
        return self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def equals(self, other, ignore_axis_order: bool = False) -> bool:
        return self == CRS.from_user_input(other)

    def __repr__(self):
        return f"CRS({self.srs!r})"

    def __reduce__(self):
        return (_crs_from_srs, (self.srs,))


@lru_cache(maxsize=512)
def _crs_from_srs(srs: str) -> CRS:
    return CRS.from_user_input(srs)


def _build(projparams, kwargs):
    if kwargs:
        if projparams is not None:
            if isinstance(projparams, dict):
                merged = {**projparams, **kwargs}
            else:
                raise ValueError("cannot mix positional CRS input and "
                                 "kwargs")
        else:
            merged = kwargs
        return CRS.from_dict(merged).__dict__
    if projparams is None:
        raise ValueError("CRS input required")
    return CRS.from_user_input(projparams).__dict__
