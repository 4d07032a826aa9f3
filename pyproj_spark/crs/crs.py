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
from pyproj_spark.exceptions import CRSError
from pyproj_spark.kernels.ellipsoid import Ellipsoid, get_ellipsoid

_AUTH_CODE_RE = re.compile(
    r"^\s*(?P<auth>[A-Za-z]+)\s*:\s*(?P<code>\w+)\s*$")
#: 'urn:ogc:def:crs:EPSG::4326' / 'urn:ogc:def:crs:OGC:1.3:CRS84'
_URN_RE = re.compile(
    r"^urn:ogc:def:crs:(?P<auth>[A-Za-z]+):[\d.]*:(?P<code>\w+)$",
    re.IGNORECASE)
_WKT_ROOT_RE = re.compile(
    r"^\s*(GEOGCRS|GEOGCS|GEOGRAPHICCRS|PROJCRS|PROJCS|PROJECTEDCRS|"
    r"GEODCRS|GEOCCS|GEODETICCRS|BOUNDCRS|VERTCRS|VERT_CS|COMPOUNDCRS|"
    r"COMPD_CS)\s*[\[\(]", re.IGNORECASE)

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
        self.pm = float(rec.get("pm") or 0.0)
        self.deprecated = bool(rec.get("deprecated", False))
        self.bound = bool(rec.get("bound", False))
        self.n_dim = int(rec.get("n_dim",
                                 3 if self.kind == "geocentric" else 2))
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
                raise CRSError(f"unsupported init {init!r}")
            return cls.from_epsg(int(m.group("code")))
        proj = params.get("proj")
        if proj is None:
            raise CRSError("proj= parameter required")
        # reference parity: an unknown projection name fails at CRS
        # construction time with CRSError (reference
        # test/test_exception_logging.py:12-14), not later when a
        # kernel is first planned
        from pyproj_spark.kernels.projections import PROJECTIONS
        known = (set(PROJECTIONS) | {"lonlat", "latlon", "geocent",
                                     "cart", "pipeline", "noop"})
        if proj not in known:
            raise CRSError(
                f"Internal Proj Error: unknown projection {proj!r}")
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
        pm = 0.0
        if "pm" in params:
            raw_pm = params.pop("pm")
            try:
                pm = float(raw_pm)
            except (TypeError, ValueError):
                key = str(raw_pm).lower()
                if key not in catalog.PRIME_MERIDIANS:
                    raise CRSError(f"unknown prime meridian {raw_pm!r}")
                pm = catalog.PRIME_MERIDIANS[key]
        kind = ("geographic"
                if proj in ("longlat", "latlong", "lonlat", "latlon")
                else "geocentric" if proj in ("geocent", "cart")
                else "projected")
        proj_params = {k: v for k, v in params.items()
                       if k not in ("ellps", "datum", "towgs84", "units",
                                    "to_meter", "no_defs", "type",
                                    "wktext", "pm")}
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
                raise CRSError(f"unsupported units {units!r}")
        rec = dict(kind=kind, name=f"unknown ({proj})", code=None,
                   datum=params.get("datum"), ellps=None,
                   ellipsoid=ellipsoid, towgs84=towgs84, axis="enu",
                   proj_params=proj_params, to_meter=to_meter, pm=pm,
                   # an EXPLICIT +towgs84/+nadgrids makes a BoundCRS
                   # (reference crs.py:1516-1526); a datum-implied shift
                   # does not
                   bound="towgs84" in params or "nadgrids" in params)
        srs = srs or " ".join(
            f"+{k}" if v is True else f"+{k}={v}"
            for k, v in sorted(params.items()))
        return cls._from_record(rec, srs)

    @classmethod
    def from_wkt(cls, in_wkt_string: str) -> "CRS":
        """CRS from a WKT1 or WKT2 string — reference
        pyproj/crs/crs.py:417-452 (PROJ WKT importer)."""
        from pyproj_spark.crs.wkt_parse import crs_record_from_wkt
        rec = crs_record_from_wkt(in_wkt_string)
        return cls._from_record(rec, srs=in_wkt_string)

    @classmethod
    def from_json(cls, crs_json: str) -> "CRS":
        """CRS from a PROJJSON string — reference crs.py:539-555."""
        import json
        return cls.from_json_dict(json.loads(crs_json))

    @classmethod
    def from_json_dict(cls, crs_dict: dict) -> "CRS":
        """CRS from a PROJJSON dict — reference crs.py:557-575.
        VerticalCRS / CompoundCRS dicts dispatch to the typed builders
        (reference crs.py:1997-2075), so compound srs strings (stored
        as PROJJSON) round-trip through from_user_input."""
        import json
        typ = str(crs_dict.get("type", ""))
        if typ in ("VerticalCRS", "CompoundCRS"):
            from pyproj_spark.crs import builders
            if typ == "VerticalCRS":
                gm = crs_dict.get("geoid_model", {})
                return builders.VerticalCRS(
                    crs_dict.get("name", "undefined"),
                    crs_dict.get("datum", {}).get("name", "undefined"),
                    geoid_model=gm.get("name") if isinstance(gm, dict)
                    else gm)
            return builders.CompoundCRS(
                crs_dict.get("name", "undefined"),
                [cls.from_json_dict(c)
                 for c in crs_dict.get("components", [])])
        from pyproj_spark.crs.projjson import crs_record_from_json_dict
        rec = crs_record_from_json_dict(crs_dict)
        return cls._from_record(rec, srs=json.dumps(crs_dict))

    @classmethod
    def from_authority(cls, auth_name: str, code) -> "CRS":
        """CRS from (authority, code) — reference crs.py:362-382.
        EPSG codes resolve to the bundled catalog; OGC:CRS84 is WGS84
        with forced lon/lat axis order."""
        auth = str(auth_name).upper()
        if auth == "EPSG":
            try:
                icode = int(code)
            except (TypeError, ValueError):
                raise CRSError(
                    f"invalid EPSG code {code!r}") from None
            return cls.from_epsg(icode)
        if auth == "OGC" and str(code).upper() == "CRS84":
            rec = catalog.epsg_entry(4326)
            rec.update(axis="enu", code=None, name="WGS 84 (CRS84)")
            return cls._from_record(rec, "OGC:CRS84")
        if auth in ("ESRI", "IGNF"):
            rec = catalog.authority_entry(auth, code)
            return cls._from_record(rec, f"{auth}:{code}")
        raise CRSError(f"unsupported authority {auth_name!r}")

    @classmethod
    def from_user_input(cls, value) -> "CRS":
        """Accepts: CRS, int, 'AUTH:code', ('AUTH', 'code'), proj string,
        dict, WKT string, PROJJSON string/dict, OGC urn —
        reference pyproj/crs/crs.py:477-503."""
        if isinstance(value, CRS):
            return value
        if isinstance(value, int):
            return cls.from_epsg(value)
        if isinstance(value, dict):
            if "$schema" in value or str(value.get("type", "")).endswith(
                    "CRS"):
                return cls.from_json_dict(value)
            return cls.from_dict(value)
        if isinstance(value, (tuple, list)) and len(value) == 2:
            return cls.from_authority(*value)
        if isinstance(value, str):
            s = value.strip()
            if s.startswith("{"):
                return cls.from_json(s)
            if _WKT_ROOT_RE.match(s):
                return cls.from_wkt(s)
            m = _URN_RE.match(s)
            if m:
                return cls.from_authority(m.group("auth"), m.group("code"))
            m = _AUTH_CODE_RE.match(s)
            if m:
                return cls.from_authority(m.group("auth"), m.group("code"))
            if s.isdigit():
                return cls.from_epsg(int(s))
            if "+" in s or "proj=" in s:
                return cls.from_proj4(s)
        if hasattr(value, "to_wkt"):
            return cls.from_wkt(value.to_wkt())
        raise CRSError(f"cannot interpret CRS input {value!r}")

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
    def is_vertical(self) -> bool:
        return self.kind == "vertical"

    @property
    def is_compound(self) -> bool:
        return self.kind == "compound"

    @property
    def is_bound(self) -> bool:
        """True for a BoundCRS — a CRS carrying an EXPLICIT
        transformation to a hub datum (+towgs84/+nadgrids proj string,
        BOUNDCRS WKT, BoundCRS builder) — reference crs.py:1511-1520.
        A catalog datum's implied shift does not make a CRS bound."""
        return self.bound

    @property
    def is_derived(self) -> bool:
        """True for derived CRSs (projected, and rotated-pole derived
        geographic) — reference crs.py:1557-1566 /
        test_crs.py:1728-1732."""
        return (self.kind == "projected"
                and self.proj_params.get("proj") != "longlat") or \
            self.proj_params.get("proj") == "ob_tran"

    @property
    def is_deprecated(self) -> bool:
        """Catalog deprecation flag — reference crs.py:1569-1579."""
        return self.deprecated

    def get_non_deprecated(self) -> list:
        """Non-deprecated successors of a deprecated CRS — reference
        crs.py:1581-1605 (empty when not deprecated or no successor is
        recorded)."""
        if self.epsg_code is None:
            return []
        return [CRS.from_epsg(c)
                for c in catalog.DEPRECATED.get(self.epsg_code, [])]

    @property
    def source_crs(self):
        """The base CRS of a BoundCRS (reference crs.py:1179-1190),
        else None. BoundCRS-builder instances carry their own."""
        if not self.bound:
            return None
        rec = dict(kind=self.kind, name=self.name, code=None,
                   datum=self.datum_name, ellps=None,
                   ellipsoid=self.ellipsoid, towgs84=None,
                   axis=self.axis, proj_params=dict(self.proj_params),
                   to_meter=self.to_meter, pm=self.pm)
        return CRS._from_record(rec, self.srs)

    def list_authority(self, auth_name=None, min_confidence: int = 70
                       ) -> list:
        """All (auth_name, code, confidence) catalog matches at or above
        min_confidence, best first — reference crs.py:1379-1421. Only
        'EPSG' exists in the bundled catalog; bound CRSs match nothing
        (use .source_crs), mirroring the reference doctest."""
        from types import SimpleNamespace as NS
        if auth_name not in (None, "EPSG", "any"):
            return []
        if self.bound:
            return []
        if self.epsg_code is not None:
            return [NS(auth_name="EPSG", code=str(self.epsg_code),
                       confidence=100)]
        me, me_nt = self._key(), self._key(with_towgs84=False)
        out = []
        for code, cand in _catalog_crss():
            if cand._key() == me:
                conf = 100 if (cand.axis == self.axis
                               and cand.name == self.name) else 70
            elif cand._key(with_towgs84=False) == me_nt:
                conf = 25
            else:
                continue
            if conf >= min_confidence:
                out.append(NS(auth_name="EPSG", code=str(code),
                              confidence=conf))
        out.sort(key=lambda m: (-m.confidence, int(m.code)))
        return out

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
                   to_meter=None, pm=self.pm)
        # srs must stay machine-parseable (TransformSpec re-resolves it
        # on executors), so emit a proj string, not a display name
        e = self.ellipsoid
        srs = f"+proj=longlat +a={e.a!r} +f={e.f!r}"
        if self.pm:
            srs += f" +pm={self.pm!r}"
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
        h_ax = [NS(name="Ellipsoidal height", abbrev="h",
                   direction="up", unit_name="metre")] \
            if getattr(self, "n_dim", 2) == 3 else []
        if self.is_geographic:
            lat = NS(name="Geodetic latitude", abbrev="Lat",
                     direction="north", unit_name="degree")
            lon = NS(name="Geodetic longitude", abbrev="Lon",
                     direction="east", unit_name="degree")
            return ([lat, lon] if self.axis == "neu"
                    else [lon, lat]) + h_ax
        unit = ("metre" if (self.to_meter or 1.0) == 1.0
                else "US survey foot")
        e_ax = NS(name="Easting", abbrev="E", direction="east",
                  unit_name=unit)
        n_ax = NS(name="Northing", abbrev="N", direction="north",
                  unit_name=unit)
        return ([n_ax, e_ax] if self.axis == "neu"
                else [e_ax, n_ax]) + h_ax

    @property
    def datum(self):
        """Datum descriptor — reference pyproj/crs/crs.py:1122-1138."""
        from types import SimpleNamespace as NS
        return NS(name=self.datum_name or "unknown",
                  type_name="Geodetic Reference Frame",
                  ellipsoid=self.ellipsoid, towgs84=self.towgs84)

    @property
    def coordinate_system(self):
        """Coordinate-system descriptor (.name + .axis_list) — reference
        pyproj/crs/crs.py:1153-1161; names follow proj_create_cs
        conventions (ellipsoidal / cartesian / vertical)."""
        from types import SimpleNamespace as NS
        if self.is_geographic:
            cs_name = "ellipsoidal"
        elif self.is_vertical:
            cs_name = "vertical"
        else:
            cs_name = "cartesian"
        return NS(name=cs_name, axis_list=self.axis_info)

    @property
    def sub_crs_list(self) -> list:
        """Components of a compound CRS, else [] — reference
        pyproj/crs/crs.py:1038-1046. Catalog records are never
        compound; the CompoundCRS builder populates the backing
        field."""
        return getattr(self, "_sub_crs_list", [])

    @sub_crs_list.setter
    def sub_crs_list(self, comps):
        self._sub_crs_list = list(comps)

    @property
    def utm_zone(self):
        """UTM zone string like '33N', or None — reference
        pyproj/crs/crs.py:1049-1071 (Bound CRSs delegate to their
        source, compound CRSs to the first zoned component)."""
        if self.bound and self.source_crs is not None:
            return self.source_crs.utm_zone
        for sub in self.sub_crs_list:
            if sub.utm_zone:
                return sub.utm_zone
        p = self.proj_params
        if p.get("proj") == "utm" and "zone" in p:
            hemi = "S" if p.get("south") else "N"
            return f"{int(p['zone'])}{hemi}"
        m = re.search(r"UTM ZONE (\d{1,2}[NS])", self.name.upper())
        return m.group(1) if m else None

    #: 2D <-> 3D EPSG twins for the bundled geographic codes
    _DIM_TWINS = {4326: 4979, 4258: 4937}

    def to_3d(self, name: str | None = None) -> "CRS":
        """3D version of a geographic or projected CRS — ellipsoidal
        height axis added (reference pyproj/crs/crs.py:1775-1830;
        proj_crs_promote_to_3D). Known EPSG twins are remapped
        (4326 -> 4979, 4258 -> 4937); otherwise the code is cleared.
        Already-3D CRSs return self."""
        if getattr(self, "n_dim", 2) == 3 or self.is_geocentric:
            return self
        if not (self.is_geographic or self.is_projected):
            raise CRSError(f"cannot promote {self.kind} CRS to 3D")
        twin = self._DIM_TWINS.get(self.epsg_code)
        if twin is not None and name is None:
            return CRS.from_epsg(twin)
        import copy
        out = copy.copy(self)
        out.n_dim = 3
        out.epsg_code = None
        if name is not None:
            out.name = name
        return out

    def to_2d(self, name: str | None = None) -> "CRS":
        """2D version (height axis dropped) — reference
        pyproj/crs/crs.py:1832-1860 (proj_crs_demote_to_2D)."""
        if getattr(self, "n_dim", 2) == 2:
            return self
        rev = {v: k for k, v in self._DIM_TWINS.items()}
        twin = rev.get(self.epsg_code)
        if twin is not None and name is None:
            return CRS.from_epsg(twin)
        import copy
        out = copy.copy(self)
        out.n_dim = 2
        out.epsg_code = None
        if name is not None:
            out.name = name
        return out

    def get_geod(self):
        """Geod built from this CRS's ellipsoid — reference
        pyproj/crs/crs.py:504-518."""
        if self.ellipsoid is None:
            return None
        from pyproj_spark.kernels.geod import Geod
        return Geod(a=self.ellipsoid.a, f=self.ellipsoid.f)

    @property
    def prime_meridian(self):
        from types import SimpleNamespace as NS
        name = next((k.capitalize() for k, v
                     in catalog.PRIME_MERIDIANS.items()
                     if v == self.pm), "unknown") if self.pm \
            else "Greenwich"
        return NS(name=name, longitude=self.pm, unit_name="degree")

    @property
    def area_of_use(self):
        """Rough area of use from the datum table — reference
        pyproj/crs/crs.py:1140-1160 (AreaOfUse with .bounds)."""
        from pyproj_spark.aoi import AreaOfUse
        from pyproj_spark.catalog_api import _DATUM_AOU
        w, s, e, n = _DATUM_AOU.get(self.datum_name,
                                    (-180.0, -90.0, 180.0, 90.0))
        return AreaOfUse(
            west=w, south=s, east=e, north=n,
            name=f"{self.datum_name or 'world'} area of use")

    # ------------------------------------------------------------- exports
    def to_epsg(self, min_confidence: int = 70):
        """EPSG code of the best catalog match, or None — reference
        pyproj/crs/crs.py:1300-1340 confidence tiers: 100 = full match
        (params + axis order + name), 70 = parameters match but axis
        order or name differ (e.g. OGC:CRS84 -> 4326), 25 = parameters
        match only if the datum-shift leg is ignored."""
        if self.epsg_code is not None:
            return self.epsg_code
        hit = self._identify()
        if hit and hit[1] >= min_confidence:
            return hit[0]
        return None

    def to_authority(self, auth_name=None, min_confidence: int = 70):
        """(authority, code) of the best match — reference
        crs.py:1342-1377. Only 'EPSG' is in the bundled catalog."""
        if auth_name not in (None, "EPSG", "any"):
            return None
        code = self.to_epsg(min_confidence)
        return ("EPSG", str(code)) if code is not None else None

    def _identify(self):
        """(code, confidence) of the best catalog candidate, or None.
        Within a confidence tier a name match wins the tie — needed for
        parameter-identical twins (JGD2000 vs JGD2011 zones, ftUS
        restatements) where only the name distinguishes the codes."""
        me, me_nt = self._key(), self._key(with_towgs84=False)
        best = None  # (code, conf, name_match)
        for code, cand in _catalog_crss():
            if cand._key() == me:
                conf = 100 if (cand.axis == self.axis
                               and cand.name == self.name) else 70
            elif cand._key(with_towgs84=False) == me_nt:
                conf = 25
            else:
                continue
            nm = cand.name == self.name
            if best is None or (conf, nm) > (best[1], best[2]):
                best = (code, conf, nm)
                if conf == 100:
                    break
        return best and (best[0], best[1])

    def to_proj4(self) -> str:
        parts = []
        for k, v in self.proj_params.items():
            parts.append(f"+{k}" if v is True else f"+{k}={v}")
        e = self.ellipsoid
        if e.name != "unknown":
            parts.append(f"+ellps={e.name}")
        else:
            parts.append(f"+a={e.a} +f={e.f}")
        if self.pm:
            pm_name = next((k for k, v in catalog.PRIME_MERIDIANS.items()
                            if v == self.pm), None)
            parts.append(f"+pm={pm_name}" if pm_name
                         else f"+pm={self.pm!r}")
        if self.towgs84:
            parts.append("+towgs84=" + ",".join(str(v) for v in self.towgs84))
        if self.to_meter not in (None, 1.0):
            parts.append(f"+to_meter={self.to_meter}")
        parts.append("+no_defs")
        return " ".join(parts)

    def to_json_dict(self) -> dict:
        """PROJJSON dict (reference crs.py:1242-1274) — genuine schema
        shape (method/parameter objects with EPSG ids, coordinate_system
        axis list); parsed back by :meth:`from_json_dict`."""
        from pyproj_spark.crs.projjson import to_json_dict
        return to_json_dict(self)

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
        """WKT2:2019 export — reference pyproj/_crs.pyx:93-102; parsed
        back by :meth:`from_wkt` (round-trips over the full catalog,
        tests/test_wkt_parse.py)."""
        if not str(version).startswith("WKT2"):
            raise CRSError("only WKT2_2019 output is supported")
        from pyproj_spark.crs.wkt import to_wkt
        return to_wkt(self, pretty=pretty)

    # ------------------------------------------------------------ equality
    def _key(self, with_towgs84: bool = True):
        """Canonical comparison key: utm/etmerc expand to tmerc, k -> k_0,
        zero/unity defaults filled, values floated — so a WKT round trip
        (which always writes the expanded parameter set) compares equal
        to the compact catalog/proj-string form."""
        e = self.ellipsoid
        ndim = 3 if self.kind == "geocentric" \
            else getattr(self, "n_dim", 2)
        if e is None or self.kind == "compound":
            # vertical CRSs have no horizontal ellipsoid; compound
            # identity must include every component (two compounds
            # sharing a horizontal but differing in vertical datum /
            # geoid model are different CRSs)
            return (self.kind, ndim, self.datum_name,
                    getattr(self, "geoid_model", None),
                    tuple(c._key(with_towgs84) for c in
                          getattr(self, "sub_crs_list", [])) or None)
        return (self.kind, ndim, round(e.a, 9),
                round(e.f, 15),
                self.towgs84 if with_towgs84 else None,
                _canon_params(self.proj_params),
                self.to_meter if self.kind != "geographic" else None,
                round(getattr(self, "pm", 0.0), 12))

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

    def is_exact_same(self, other) -> bool:
        """Strict identity: parameters AND axis order AND name —
        reference pyproj/crs/crs.py:1455-1460 (stricter than ==)."""
        try:
            other = CRS.from_user_input(other)
        except Exception:
            return False
        return (self._key() == other._key() and self.axis == other.axis
                and self.name == other.name)

    @property
    def coordinate_operation(self):
        """The conversion of a projected CRS (reference
        crs.py:1162-1172) — method/param view over proj_params."""
        if not self.is_projected:
            return None
        from types import SimpleNamespace as NS
        from pyproj_spark.crs.wkt import _METHOD_NAMES, _PARAM_NAMES
        params = dict(self.proj_params)
        proj = params.pop("proj")
        if proj == "utm":
            zone = int(params.pop("zone"))
            south = bool(params.pop("south", False))
            params = {"lat_0": 0.0, "lon_0": zone * 6 - 183,
                      "k_0": 0.9996, "x_0": 500000.0,
                      "y_0": 10000000.0 if south else 0.0}
        method, mcode = _METHOD_NAMES.get(proj, (proj, 0))
        plist = [NS(name=_PARAM_NAMES[k][0], value=float(v),
                    unit_name=_PARAM_NAMES[k][2])
                 for k, v in params.items()
                 if k in _PARAM_NAMES and v is not True]
        return NS(name=method, method_name=method,
                  method_code=mcode or None, params=plist,
                  type_name="Conversion")

    def __repr__(self):
        return f"CRS({self.srs!r})"

    def __reduce__(self):
        # n_dim rides alongside: the srs string (proj-string shaped)
        # cannot express 3D promotion, so restore it explicitly
        return (_crs_from_srs, (self.srs, getattr(self, "n_dim", 2)))


@lru_cache(maxsize=512)
def _crs_from_srs(srs: str, n_dim: int = 2) -> CRS:
    crs = CRS.from_user_input(srs)
    if n_dim != getattr(crs, "n_dim", 2):
        import copy
        crs = copy.copy(crs)
        crs.n_dim = n_dim
    return crs


#: universal projection-parameter defaults (PROJ semantics) filled in
#: for comparison so "+proj=tmerc +lon_0=24" == its fully-written WKT
_PARAM_DEFAULTS = {"lat_0": 0.0, "lon_0": 0.0, "x_0": 0.0, "y_0": 0.0}


def _canon_params(proj_params: dict):
    p = dict(proj_params)
    proj = p.get("proj")
    if proj == "utm":
        zone = int(p.pop("zone"))
        south = bool(p.pop("south", False))
        p.update(proj="tmerc", lat_0=0.0, lon_0=float(zone * 6 - 183),
                 k_0=0.9996, x_0=500000.0,
                 y_0=10000000.0 if south else 0.0)
        proj = "tmerc"
    elif proj == "etmerc":
        p["proj"] = proj = "tmerc"
    elif proj in ("latlong", "lonlat"):
        p["proj"] = proj = "longlat"
    if "k" in p:
        p["k_0"] = p.pop("k")
    if proj not in ("longlat", "geocent", "cart"):
        for k, v in _PARAM_DEFAULTS.items():
            p.setdefault(k, v)
        p.setdefault("k_0", 1.0)
    out = []
    for k, v in p.items():
        if isinstance(v, bool):
            out.append((k, v))
        elif isinstance(v, (int, float)):
            out.append((k, float(v)))
        else:
            out.append((k, v))
    return tuple(sorted(out))


@lru_cache(maxsize=1)
def _catalog_crss():
    """All bundled catalog CRSs, built once — backs reverse lookup."""
    out = []
    for _auth, code, _kind, _name, _datum in catalog.all_codes():
        out.append((code, CRS.from_epsg(code)))
    return out


def _build(projparams, kwargs):
    if kwargs:
        if projparams is not None:
            if isinstance(projparams, dict):
                merged = {**projparams, **kwargs}
            else:
                raise CRSError("cannot mix positional CRS input and "
                                 "kwargs")
        else:
            merged = kwargs
        return CRS.from_dict(merged).__dict__
    if projparams is None:
        raise CRSError("CRS input required")
    return CRS.from_user_input(projparams).__dict__
