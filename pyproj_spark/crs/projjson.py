"""PROJJSON export/import (reference ``pyproj/crs/crs.py:539-616``
from_json/from_json_dict and ``_crs.pyx`` to_json; schema at
https://proj.org/schemas/v0.7/projjson.schema.json).

The emitter produces genuine PROJJSON (method/parameter objects with
EPSG ids, coordinate_system with axis list); the reader accepts that
shape, PROJ's own output (datum_ensemble, BoundCRS), and the legacy
compact shape this engine emitted in round 1 (conversion.parameters as
a flat proj-param dict).
"""

from __future__ import annotations

from pyproj_spark.crs.wkt import _METHOD_NAMES, _PARAM_NAMES
from pyproj_spark.exceptions import CRSError
from pyproj_spark.crs.wkt_parse import (
    _DATUM_ALIASES,
    _METHOD_BY_CODE,
    _METHOD_BY_NAME,
    _PARAM_BY_CODE,
    _PARAM_BY_NAME,
    _norm,
)

_SCHEMA = "https://proj.org/schemas/v0.7/projjson.schema.json"

_UNIT_JSON = {"angleunit": "degree", "scaleunit": "unity",
              "lengthunit": "metre"}


def _axis_json(crs) -> list:
    to_m = getattr(crs, "to_meter", None)
    out = []
    for ax in crs.axis_info:
        unit = ax.unit_name
        if unit not in ("degree", "metre") and to_m not in (None, 1.0):
            unit = {"type": "LinearUnit", "name": ax.unit_name,
                    "conversion_factor": to_m}
        out.append({"name": ax.name, "abbreviation": ax.abbrev,
                    "direction": ax.direction, "unit": unit})
    return out


def _datum_json(crs) -> dict:
    e = crs.ellipsoid
    ell = {"name": e.name, "semi_major_axis": e.a,
           "inverse_flattening": e.rf if e.f else 0.0}
    out = {"type": "GeodeticReferenceFrame",
           "name": crs.datum_name or "unknown", "ellipsoid": ell}
    pm = getattr(crs, "pm", 0.0)
    if pm:
        from pyproj_spark.crs.catalog import PRIME_MERIDIANS
        name = next((k.capitalize() for k, v in PRIME_MERIDIANS.items()
                     if v == pm), "unknown")
        out["prime_meridian"] = {"name": name, "longitude": pm}
    return out


def _id_json(code):
    return {"authority": "EPSG", "code": int(code)} if code else None


def _strip_none(d: dict) -> dict:
    return {k: v for k, v in d.items() if v is not None}


def to_json_dict(crs) -> dict:
    """PROJJSON dict; a CRS whose towgs84 is not derivable from its
    datum name is wrapped in a BoundCRS carrying the shift (same rule
    as the WKT emitter — wkt.py to_wkt)."""
    from pyproj_spark.crs.catalog import DATUMS
    body = _crs_json_body(crs)
    tw = getattr(crs, "towgs84", None)
    derivable = (crs.datum_name in DATUMS
                 and tuple(DATUMS[crs.datum_name][1] or ())
                 == tuple(tw or ()))
    if tw is None or derivable:
        return body
    names = ["X-axis translation", "Y-axis translation",
             "Z-axis translation", "X-axis rotation", "Y-axis rotation",
             "Z-axis rotation", "Scale difference"][:len(tw)]
    method = ("Geocentric translations (geog2D domain)" if len(tw) == 3
              else "Position Vector transformation (geog2D domain)")
    return {
        "$schema": _SCHEMA, "type": "BoundCRS", "source_crs": body,
        "target_crs": {"type": "GeographicCRS", "name": "WGS 84",
                       "id": {"authority": "EPSG", "code": 4326}},
        "transformation": {
            "name": "Transformation to WGS84",
            "method": {"name": method,
                       "id": {"authority": "EPSG",
                              "code": 9603 if len(tw) == 3 else 9606}},
            "parameters": [{"name": n, "value": float(v)}
                           for n, v in zip(names, tw)]}}


def _crs_json_body(crs) -> dict:
    if crs.is_geographic:
        return _strip_none({
            "$schema": _SCHEMA, "type": "GeographicCRS", "name": crs.name,
            "datum": _datum_json(crs),
            "coordinate_system": {"subtype": "ellipsoidal",
                                  "axis": _axis_json(crs)},
            "id": _id_json(crs.epsg_code)})
    if crs.is_geocentric:
        return _strip_none({
            "$schema": _SCHEMA, "type": "GeodeticCRS", "name": crs.name,
            "datum": _datum_json(crs),
            "coordinate_system": {"subtype": "Cartesian",
                                  "axis": _axis_json(crs)},
            "id": _id_json(crs.epsg_code)})
    params = dict(crs.proj_params)
    proj = params.pop("proj")
    if proj == "utm":
        zone = int(params.pop("zone"))
        south = bool(params.pop("south", False))
        params = {"lat_0": 0.0, "lon_0": zone * 6 - 183, "k_0": 0.9996,
                  "x_0": 500000.0, "y_0": 10000000.0 if south else 0.0}
    method, mcode = _METHOD_NAMES.get(proj, (proj, 0))
    plist = []
    for k, v in params.items():
        if k not in _PARAM_NAMES or v is True:
            continue
        pname, pcode, unit = _PARAM_NAMES[k]
        plist.append(_strip_none({
            "name": pname, "value": float(v),
            "unit": _UNIT_JSON[unit], "id": _id_json(pcode)}))
    base = crs.geodetic_crs
    return _strip_none({
        "$schema": _SCHEMA, "type": "ProjectedCRS", "name": crs.name,
        "base_crs": _strip_none({
            "name": crs.datum_name or "unknown",
            "datum": _datum_json(crs),
            "coordinate_system": {"subtype": "ellipsoidal",
                                  "axis": _axis_json(base)}}),
        "conversion": {
            "name": method,
            "method": _strip_none({"name": method, "id": _id_json(mcode)}),
            "parameters": plist},
        "coordinate_system": {"subtype": "Cartesian",
                              "axis": _axis_json(crs)},
        "id": _id_json(crs.epsg_code)})


# --------------------------------------------------------------- reader

def _code_of(d) -> int | None:
    i = d.get("id")
    if isinstance(i, dict) and _norm(str(i.get("authority", ""))) == "epsg":
        try:
            return int(i["code"])
        except (KeyError, TypeError, ValueError):
            return None
    return None


def _ellipsoid_from_json(ell: dict):
    from pyproj_spark.kernels.ellipsoid import Ellipsoid
    a = float(ell.get("semi_major_axis", ell.get("radius", 0.0)))
    if "radius" in ell:
        return Ellipsoid.from_params(a=a, f=0.0, name=ell.get("name"))
    rf = ell.get("inverse_flattening")
    if rf:
        return Ellipsoid.from_params(a=a, rf=float(rf),
                                     name=ell.get("name"))
    if "semi_minor_axis" in ell:
        return Ellipsoid.from_params(a=a, b=float(ell["semi_minor_axis"]),
                                     name=ell.get("name"))
    return Ellipsoid.from_params(a=a, f=0.0, name=ell.get("name"))


def _datum_from_json(d: dict):
    """(datum_name, ellipsoid, towgs84, pm_deg) from datum /
    datum_ensemble; the prime meridian honors a unit object's
    conversion_factor (PROJ writes Paris in grads)."""
    import math
    from pyproj_spark.crs.catalog import DATUMS
    dd = d.get("datum") or d.get("datum_ensemble")
    if dd is None:
        raise CRSError("PROJJSON CRS has no datum/datum_ensemble")
    raw = dd.get("name", "unknown")
    name = _DATUM_ALIASES.get(_norm(raw), raw)
    ellipsoid = _ellipsoid_from_json(dd["ellipsoid"])
    towgs84 = DATUMS.get(name, (None, None))[1] if name in DATUMS else None
    pm = 0.0
    pmj = dd.get("prime_meridian") or d.get("prime_meridian")
    if pmj:
        pm = float(pmj.get("longitude", 0.0))
        unit = pmj.get("unit")
        if isinstance(unit, dict):
            pm = pm * float(unit.get("conversion_factor",
                                     math.radians(1.0))) \
                / math.radians(1.0)
    return name, ellipsoid, towgs84, pm


def _n_dim_from_json(d: dict) -> int:
    axes = (d.get("coordinate_system") or {}).get("axis") or []
    if len(axes) == 3 or any(
            _norm(str(a.get("direction", ""))) == "up" for a in axes):
        return 3
    return 2


def _axis_from_json(d: dict, default: str = "enu") -> str:
    cs = d.get("coordinate_system") or {}
    axes = cs.get("axis") or []
    if not axes:
        return default
    return "neu" if _norm(str(axes[0].get("direction", ""))) in (
        "north", "south") else "enu"


def _conversion_params(conv: dict) -> dict:
    method = conv.get("method") or {}
    mcode = _code_of(method)
    if mcode in _METHOD_BY_CODE:
        proj = _METHOD_BY_CODE[mcode]
        extra: dict = {}
    else:
        key = _norm(method.get("name", ""))
        if key not in _METHOD_BY_NAME:
            raise CRSError(f"unsupported conversion method "
                             f"{method.get('name')!r}")
        proj, extra = _METHOD_BY_NAME[key]
    params = dict(extra)
    raw = conv.get("parameters")
    if isinstance(raw, dict):  # legacy round-1 compact shape
        params.update(raw)
    else:
        for p in raw or []:
            key = _PARAM_BY_CODE.get(_code_of(p)) or _PARAM_BY_NAME.get(
                _norm(p.get("name", "")))
            if key is None:
                raise CRSError(f"unsupported conversion parameter "
                                 f"{p.get('name')!r}")
            params[key] = float(p["value"])
    from pyproj_spark.crs.wkt_parse import _fixup_params
    params = _fixup_params(proj, params)
    params["proj"] = proj
    return params


def crs_record_from_json_dict(d: dict) -> dict:
    t = d.get("type")
    if t == "BoundCRS":
        rec = crs_record_from_json_dict(d["source_crs"])
        tr = d.get("transformation") or {}
        vals = [float(p["value"]) for p in tr.get("parameters", [])]
        if len(vals) in (3, 7):
            rec["towgs84"] = tuple(vals)
        return rec
    if t in ("GeographicCRS", "Geographic2DCRS", "Geographic3DCRS"):
        name, ellipsoid, towgs84, pm = _datum_from_json(d)
        return dict(kind="geographic", name=d.get("name", "unknown"),
                    code=_code_of(d), datum=name, ellps=None,
                    ellipsoid=ellipsoid, towgs84=towgs84,
                    axis=_axis_from_json(d),
                    n_dim=3 if t == "Geographic3DCRS"
                    else _n_dim_from_json(d),
                    proj_params=dict(proj="longlat"), to_meter=None,
                    pm=pm)
    if t == "GeodeticCRS":
        cs = (d.get("coordinate_system") or {}).get("subtype", "Cartesian")
        name, ellipsoid, towgs84, pm = _datum_from_json(d)
        if _norm(str(cs)) == "ellipsoidal":
            return dict(kind="geographic", name=d.get("name", "unknown"),
                        code=_code_of(d), datum=name, ellps=None,
                        ellipsoid=ellipsoid, towgs84=towgs84,
                        axis=_axis_from_json(d),
                        proj_params=dict(proj="longlat"), to_meter=None,
                        pm=pm)
        return dict(kind="geocentric", name=d.get("name", "unknown"),
                    code=_code_of(d), datum=name, ellps=None,
                    ellipsoid=ellipsoid, towgs84=towgs84, axis="enu",
                    proj_params=dict(proj="geocent"), to_meter=1.0)
    if t == "ProjectedCRS":
        base = d.get("base_crs") or {}
        name, ellipsoid, towgs84, pm = _datum_from_json(base)
        params = _conversion_params(d["conversion"])
        cs = d.get("coordinate_system") or {}
        to_meter = 1.0
        for ax in cs.get("axis") or []:
            u = ax.get("unit")
            if isinstance(u, dict):
                to_meter = float(u.get("conversion_factor", 1.0))
            break
        return dict(kind="projected", name=d.get("name", "unknown"),
                    code=_code_of(d), datum=name, ellps=None,
                    ellipsoid=ellipsoid, towgs84=towgs84,
                    axis=_axis_from_json(d), proj_params=params,
                    to_meter=to_meter, pm=pm)
    raise CRSError(f"unsupported PROJJSON type {t!r}")
