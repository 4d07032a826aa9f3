"""WKT input parsing — the reference's front door (`CRS.from_wkt`,
reference ``pyproj/crs/crs.py:417-452`` / PROJ's WKT importers).

Accepts both WKT2:2019 (the dialect this engine emits, plus PROJ's
output with datum ENSEMBLE nodes) and WKT1-GDAL/ESRI (GEOGCS/PROJCS
with PROJECTION/AUTHORITY/TOWGS84 nodes). The grammar is one shared
s-expression form::

    node  := KEYWORD '[' value (',' value)* ']'
    value := node | "quoted string" | number | bareword

so the tokenizer/parser below is dialect-agnostic; dialect differences
live entirely in the semantic extraction tables.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyproj_spark.exceptions import CRSError


# --------------------------------------------------------------- syntax

@dataclass
class Node:
    keyword: str
    values: list

    def find(self, *keywords) -> "Node | None":
        """First child node whose keyword matches (case-insensitive)."""
        want = {k.upper() for k in keywords}
        for v in self.values:
            if isinstance(v, Node) and v.keyword.upper() in want:
                return v
        return None

    def find_all(self, *keywords) -> list:
        want = {k.upper() for k in keywords}
        return [v for v in self.values
                if isinstance(v, Node) and v.keyword.upper() in want]

    @property
    def name(self):
        """First value if it is a string (the WKT object name)."""
        return self.values[0] if self.values and isinstance(
            self.values[0], str) else None


_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<str>"(?:[^"]|"")*")          # quoted string ("" escapes ")
    | (?P<num>[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<punc>[\[\](),])
    )""", re.VERBOSE)


def _tokenize(s: str):
    pos = 0
    out = []
    n = len(s)
    while pos < n:
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise CRSError(f"WKT syntax error at char {pos}: "
                             f"{s[pos:pos + 30]!r}")
        pos = m.end()
        if m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace('""', '"')))
        elif m.lastgroup == "num":
            out.append(("num", float(m.group("num"))))
        elif m.lastgroup == "word":
            out.append(("word", m.group("word")))
        else:
            out.append(("punc", m.group("punc")))
    return out


def parse_wkt(s: str) -> Node:
    """Parse a WKT string into a Node tree (any dialect)."""
    toks = _tokenize(s)
    pos = 0

    def node():
        nonlocal pos
        kind, kw = toks[pos]
        if kind != "word":
            raise CRSError(f"expected keyword, got {kw!r}")
        pos += 1
        kind, p = toks[pos]
        # both [ and ( are legal WKT brackets
        if not (kind == "punc" and p in "(["):
            raise CRSError(f"expected '[' after {kw}")
        close = "]" if p == "[" else ")"
        pos += 1
        vals = []
        while True:
            kind, t = toks[pos]
            if kind == "punc" and t == close:
                pos += 1
                break
            if kind == "punc" and t == ",":
                pos += 1
                continue
            if kind == "word" and pos + 1 < len(toks) \
                    and toks[pos + 1] == ("punc", "[") \
                    or kind == "word" and pos + 1 < len(toks) \
                    and toks[pos + 1] == ("punc", "("):
                vals.append(node())
            elif kind == "word":
                vals.append(t)  # bareword enum (north, east, ...)
                pos += 1
            else:
                vals.append(t)
                pos += 1
        return Node(kw, vals)

    try:
        root = node()
    except IndexError:
        # token exhaustion mid-node = truncated input; surface the typed
        # exception the CRS input contract promises, not an IndexError
        raise CRSError("unexpected end of WKT") from None
    if pos != len(toks):
        raise CRSError("trailing content after WKT root node")
    return root


# ------------------------------------------------------------- semantics

#: EPSG method code -> proj name (inverse of wkt.py _METHOD_NAMES)
_METHOD_BY_CODE = {
    9807: "tmerc", 9805: "merc", 1024: "webmerc", 9802: "lcc",
    9820: "laea", 9832: "aeqd", 9829: "stere", 9810: "stere",
    9809: "sterea", 1028: "eqc", 9804: "merc", 9801: "lcc", 9822: "aea",
    9835: "cea", 9815: "omerc", 9838: "nsper", 9840: "ortho",
    9818: "poly", 9806: "cass", 9819: "krovak", 1078: "eqearth",
}

#: normalized method name -> (proj, extra params). Normalization strips
#: non-alphanumerics and lowercases, so WKT1 "Transverse_Mercator" and
#: WKT2 "Transverse Mercator" coincide.
_METHOD_BY_NAME = {
    "transversemercator": ("tmerc", {}),
    "mercatorvarianta": ("merc", {}),
    "mercatorvariantb": ("merc", {}),
    "mercator1sp": ("merc", {}),
    "mercator2sp": ("merc", {}),
    "popularvisualisationpseudomercator": ("webmerc", {}),
    "lambertconicconformal2sp": ("lcc", {}),
    "lambertconicconformal1sp": ("lcc", {}),
    "lambertconformalconic2sp": ("lcc", {}),
    "lambertconformalconic1sp": ("lcc", {}),
    "lambertconformalconic": ("lcc", {}),
    "lambertazimuthalequalarea": ("laea", {}),
    "azimuthalequidistant": ("aeqd", {}),
    "modifiedazimuthalequidistant": ("aeqd", {}),
    "polarstereographic": ("stere", {}),
    "polarstereographicvarianta": ("stere", {}),
    "polarstereographicvariantb": ("stere", {}),
    "stereographic": ("stere", {}),
    # EPSG 9809 "Oblique Stereographic" is the double (conformal-
    # sphere) projection — PROJ sterea, not stere
    "obliquestereographic": ("sterea", {}),
    "doublestereographic": ("sterea", {}),
    "equidistantcylindrical": ("eqc", {}),
    "equirectangular": ("eqc", {}),
    "sinusoidal": ("sinu", {}),
    "geostationarysatellitesweepy": ("geos", {"sweep": "y"}),
    "geostationarysatellitesweepx": ("geos", {"sweep": "x"}),
    "albersconicequalarea": ("aea", {}),
    "albersequalarea": ("aea", {}),
    "lambertcylindricalequalarea": ("cea", {}),
    "cylindricalequalarea": ("cea", {}),
    "orthographic": ("ortho", {}),
    "verticalperspective": ("nsper", {}),
    "hotineobliquemercatorvariantb": ("omerc", {}),
    "hotineobliquemercatorazimuthcenter": ("omerc", {}),
    "americanpolyconic": ("poly", {}),
    "polyconic": ("poly", {}),
    "swissobliquemercator": ("somerc", {}),
    "somerc": ("somerc", {}),
    "mollweide": ("moll", {}),
    "millercylindrical": ("mill", {}),
    "gnomonic": ("gnom", {}),
    "cassinisoldner": ("cass", {}),
    "cassini": ("cass", {}),
    "krovak": ("krovak", {}),
    "krovakeastnorth": ("krovak", {}),
    "equalearth": ("eqearth", {}),
    "bonne": ("bonne", {}),
    "bonnesouthorientated": ("bonne", {}),
    "vandergrinten": ("vandg", {}),
    "vandergrinteni": ("vandg", {}),
    "winkeltripel": ("wintri", {}),
    "hammeraitoff": ("hammer", {}),
    "hammer": ("hammer", {}),
    "aitoff": ("aitoff", {}),
    "projobtranoprojlonglat": ("ob_tran", {}),
    "polerotationnetcdfcfconvention": ("ob_tran", {}),
}

#: EPSG parameter code -> proj param
_PARAM_BY_CODE = {
    8801: "lat_0", 8802: "lon_0", 8805: "k_0", 8806: "x_0", 8807: "y_0",
    8823: "lat_1", 8824: "lat_2", 8832: "lat_ts", 8833: "lon_0",
    8811: "lat_0", 8812: "lonc", 8815: "k_0", 8816: "x_0", 8817: "y_0",
    8813: "alpha", 8814: "gamma",
    8821: "lat_0", 8822: "lon_0", 8826: "x_0", 8827: "y_0",
}


def _fixup_params(proj: str, params: dict) -> dict:
    """EPSG's 'Latitude of 1st standard parallel' (8823) means lat_ts
    for single-parallel cylindricals (Mercator variant B, cylindrical
    equal area), not lcc's lat_1; lonc only exists for omerc."""
    if proj in ("merc", "cea") and "lat_1" in params:
        params["lat_ts"] = params.pop("lat_1")
    if proj != "omerc" and "lonc" in params:
        params["lon_0"] = params.pop("lonc")
    return params

#: normalized parameter name -> proj param (WKT1 + WKT2 EPSG names)
_PARAM_BY_NAME = {
    "latitudeofnaturalorigin": "lat_0",
    "latitudeoforigin": "lat_0",
    "latitudeofcenter": "lat_0",
    "latitudeofprojectioncentre": "lat_0",
    "longitudeofnaturalorigin": "lon_0",
    "centralmeridian": "lon_0",
    "longitudeofcenter": "lonc",
    "longitudeofprojectioncentre": "lonc",
    "longitudeoforigin": "lon_0",
    "scalefactoratnaturalorigin": "k_0",
    "scalefactor": "k_0",
    "scalefactoroninitialline": "k_0",
    "falseeasting": "x_0",
    "falsenorthing": "y_0",
    "eastingatprojectioncentre": "x_0",
    "northingatprojectioncentre": "y_0",
    "latitudeof1ststandardparallel": "lat_1",
    "standardparallel1": "lat_1",
    "latitudeof2ndstandardparallel": "lat_2",
    "standardparallel2": "lat_2",
    "latitudeofstandardparallel": "lat_ts",
    "standardparallel": "lat_ts",
    "latitudeoffalseorigin": "lat_0",
    "longitudeoffalseorigin": "lon_0",
    "eastingatfalseorigin": "x_0",
    "northingatfalseorigin": "y_0",
    "azimuthofinitialline": "alpha",
    "azimuthatprojectioncentre": "alpha",
    "anglefromrectifiedtoskewgrid": "gamma",
    "satelliteheight": "h",
    "viewpointheight": "h",
    "latitudeoftopocentricorigin": "lat_0",
    "longitudeoftopocentricorigin": "lon_0",
    "olatp": "o_lat_p",
    "olonp": "o_lon_p",
    "lon0": "lon_0",
}

#: datum name aliases -> catalog datum key (crs/catalog.py DATUMS)
_DATUM_ALIASES = {
    "wgs84": "WGS84", "worldgeodeticsystem1984": "WGS84",
    "worldgeodeticsystem1984ensemble": "WGS84", "dwgs1984": "WGS84",
    "wgs1984": "WGS84",
    "etrs89": "ETRS89", "europeanterrestrialreferencesystem1989": "ETRS89",
    "europeanterrestrialreferencesystem1989ensemble": "ETRS89",
    "nad83": "NAD83", "northamericandatum1983": "NAD83",
    "dnorthamerican1983": "NAD83",
    "nad27": "NAD27", "northamericandatum1927": "NAD27",
    "ggrs87": "GGRS87", "greekgeodeticreferencesystem1987": "GGRS87",
    "ed50": "ED50", "europeandatum1950": "ED50",
    "osgb36": "OSGB36", "ordnancesurveyofgreatbritain1936": "OSGB36",
    "osgb1936": "OSGB36",
    "nzgd2000": "NZGD2000", "newzealandgeodeticdatum2000": "NZGD2000",
    "itrf2014": "ITRF2014",
    "gdm2000": "GDM2000", "geodeticdatumofmalaysia2000": "GDM2000",
    "potsdam": "potsdam", "deutscheshauptdreiecksnetz": "potsdam",
    "montemario": "monte_mario",
}


def _norm(name: str) -> str:
    return re.sub(r"[^a-z0-9]", "", str(name).lower())


def _epsg_id(node: Node):
    """ID["EPSG",code] (WKT2) / AUTHORITY["EPSG","code"] (WKT1)."""
    idn = node.find("ID", "AUTHORITY")
    if idn and len(idn.values) >= 2 and _norm(idn.values[0]) == "epsg":
        try:
            return int(float(str(idn.values[1])))
        except (TypeError, ValueError):
            return None
    return None


def _ellipsoid_params(datum_node: Node) -> dict:
    ell = datum_node.find("ELLIPSOID", "SPHEROID")
    if ell is None:
        raise CRSError("WKT datum has no ELLIPSOID/SPHEROID")
    a = float(ell.values[1])
    rf = float(ell.values[2])
    out = {"a": a}
    if rf == 0.0:
        out["f"] = 0.0
    else:
        out["rf"] = rf
    return out, ell.name or "unknown"


def _datum_info(crs_node: Node):
    """(datum_name, ellipsoid params, towgs84 or None) from a geographic
    CRS node (WKT2 DATUM/ENSEMBLE or WKT1 DATUM with TOWGS84)."""
    from pyproj_spark.crs.catalog import DATUMS
    d = crs_node.find("DATUM", "TRF", "GEODETICDATUM", "ENSEMBLE")
    if d is None:
        raise CRSError("WKT CRS has no DATUM/ENSEMBLE node")
    ell_params, _ell_name = _ellipsoid_params(d)
    raw_name = d.name or "unknown"
    datum_name = _DATUM_ALIASES.get(_norm(raw_name))
    if datum_name is None and raw_name in DATUMS:
        datum_name = raw_name  # catalog datum key used verbatim
    towgs84 = None
    tw = d.find("TOWGS84") or crs_node.find("TOWGS84")
    if tw is not None:
        towgs84 = tuple(float(v) for v in tw.values)
    elif datum_name in DATUMS:
        towgs84 = DATUMS[datum_name][1]
    return datum_name or raw_name, ell_params, towgs84


def _axis_order(crs_node: Node, default: str = "enu") -> str:
    cs_axes = crs_node.find_all("AXIS")
    if not cs_axes:
        return default
    first = cs_axes[0]
    direction = None
    for v in first.values[1:]:
        if isinstance(v, str):
            direction = v
            break
    if direction is None:
        return default
    return "neu" if _norm(direction) in ("north", "south") else "enu"


def _prime_meridian_deg(crs_node: Node) -> float:
    """PRIMEM offset in decimal degrees; honors the node's ANGLEUNIT
    (PROJ writes e.g. Paris in grads: PRIMEM["Paris",2.5969213,
    ANGLEUNIT["grad",0.015707963...]])."""
    import math
    pm = crs_node.find("PRIMEM", "PRIMEMERIDIAN")
    if pm is None:
        return 0.0
    value = next((v for v in pm.values[1:] if isinstance(v, float)), 0.0)
    unit = pm.find("ANGLEUNIT", "UNIT")
    factor = math.radians(1.0)
    if unit is not None:
        factor = next((v for v in unit.values[1:]
                       if isinstance(v, float)), factor)
    return value * factor / math.radians(1.0)


def _unit_to_meter(crs_node: Node) -> float:
    u = crs_node.find("LENGTHUNIT", "UNIT")
    if u is None:
        return 1.0
    for v in u.values[1:]:
        if isinstance(v, float):
            return v
    return 1.0


def _cs_n_dim(crs_node: Node) -> int:
    """Coordinate-system dimensionality from the CS node's count or,
    failing that, an explicit up-direction AXIS (3D ellipsoidal /
    Cartesian CSs carry an ellipsoidal-height axis)."""
    cs = crs_node.find("CS")
    if cs is not None:
        for v in cs.values[1:]:
            if isinstance(v, float):
                return int(v)
    for ax in crs_node.find_all("AXIS"):
        if any(isinstance(v, str) and _norm(v) == "up"
               for v in ax.values[1:]):
            return 3
    return 2


def _geog_record(node: Node, kind: str = "geographic") -> dict:
    datum_name, ell_params, towgs84 = _datum_info(node)
    from pyproj_spark.kernels.ellipsoid import Ellipsoid
    ellipsoid = Ellipsoid.from_params(**ell_params)
    return dict(
        kind=kind, name=node.name or "unknown", code=_epsg_id(node),
        datum=datum_name, ellps=None, ellipsoid=ellipsoid,
        towgs84=towgs84,
        axis=_axis_order(node, default="enu"),
        n_dim=3 if kind == "geocentric" else _cs_n_dim(node),
        proj_params=dict(proj="longlat" if kind == "geographic"
                         else "geocent"),
        to_meter=None if kind == "geographic" else 1.0,
        pm=_prime_meridian_deg(node))


def _method_to_proj(method_node: Node) -> tuple:
    code = _epsg_id(method_node)
    extra: dict = {}
    if code in _METHOD_BY_CODE:
        proj = _METHOD_BY_CODE[code]
    else:
        key = _norm(method_node.name or "")
        if key not in _METHOD_BY_NAME:
            raise CRSError(
                f"unsupported projection method {method_node.name!r}")
        proj, extra = _METHOD_BY_NAME[key]
    if _norm(method_node.name or "").startswith(
            "geostationarysatellite"):
        extra = dict(extra)
        extra.setdefault(
            "sweep", "x" if "sweepx" in _norm(method_node.name) else "y")
    return proj, dict(extra)


def _proj_record(node: Node) -> dict:
    base = node.find("BASEGEOGCRS", "BASEGEODCRS", "GEOGCS")
    if base is None:
        raise CRSError("projected WKT CRS has no base geographic CRS")
    datum_name, ell_params, towgs84 = _datum_info(base)
    from pyproj_spark.kernels.ellipsoid import Ellipsoid
    ellipsoid = Ellipsoid.from_params(**ell_params)

    conv = node.find("CONVERSION")
    params: dict = {}
    if conv is not None:  # WKT2
        method = conv.find("METHOD", "PROJECTION")
        if method is None:
            raise CRSError("CONVERSION has no METHOD")
        proj, params_extra = _method_to_proj(method)
        params.update(params_extra)
        param_nodes = conv.find_all("PARAMETER")
    else:  # WKT1: PROJECTION + flat PARAMETERs
        method = node.find("PROJECTION")
        if method is None:
            raise CRSError("projected WKT CRS has no "
                             "CONVERSION/PROJECTION")
        proj, params_extra = _method_to_proj(method)
        params.update(params_extra)
        param_nodes = node.find_all("PARAMETER")
    for p in param_nodes:
        code = _epsg_id(p)
        key = _PARAM_BY_CODE.get(code) or _PARAM_BY_NAME.get(
            _norm(p.values[0]))
        if key is None:
            raise CRSError(f"unsupported projection parameter "
                             f"{p.values[0]!r}")
        val = next(v for v in p.values[1:] if isinstance(v, float))
        params[key] = val
    params = _fixup_params(proj, params)
    params["proj"] = proj
    return dict(
        kind="projected", name=node.name or "unknown", code=_epsg_id(node),
        datum=datum_name, ellps=None, ellipsoid=ellipsoid,
        towgs84=towgs84, axis=_axis_order(node, default="enu"),
        n_dim=_cs_n_dim(node),
        proj_params=params, to_meter=_unit_to_meter(node),
        pm=_prime_meridian_deg(base))


def crs_record_from_wkt(s: str) -> dict:
    """Parse WKT (1 or 2) into the engine's normalized CRS record."""
    node = parse_wkt(s)
    kw = node.keyword.upper()
    if kw == "BOUNDCRS":
        src = node.find("SOURCECRS")
        inner = next(v for v in src.values if isinstance(v, Node))
        rec = crs_record_from_node(inner)
        tr = node.find("ABRIDGEDTRANSFORMATION")
        if tr is not None:
            vals = [next(v for v in p.values[1:] if isinstance(v, float))
                    for p in tr.find_all("PARAMETER")]
            if len(vals) in (3, 7):
                rec["towgs84"] = tuple(vals)
        rec["bound"] = True
        return rec
    return crs_record_from_node(node)


def crs_record_from_node(node: Node) -> dict:
    kw = node.keyword.upper()
    if kw in ("GEOGCRS", "GEOGCS", "GEOGRAPHICCRS"):
        return _geog_record(node, "geographic")
    if kw in ("GEODCRS", "GEOCCS", "GEODETICCRS"):
        cs = node.find("CS")
        if cs is not None and _norm(str(cs.values[0])) == "ellipsoidal":
            return _geog_record(node, "geographic")
        return _geog_record(node, "geocentric")
    if kw in ("PROJCRS", "PROJCS", "PROJECTEDCRS"):
        return _proj_record(node)
    raise CRSError(f"unsupported WKT root {node.keyword!r} "
                     "(vertical/compound/temporal CRSs are not part of "
                     "the engine's transform surface)")
