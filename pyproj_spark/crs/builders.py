"""Typed CRS builder classes (reference ``pyproj/crs/crs.py:1798-2107``
GeographicCRS / GeocentricCRS / DerivedGeographicCRS / ProjectedCRS /
VerticalCRS / CompoundCRS / BoundCRS, plus the coordinate-system and
datum helpers they take). Builders compose PROJJSON and feed it through
``CRS.from_json_dict`` — the same architecture as the reference, which
composes PROJJSON and feeds it through PROJ.

Vertical and compound CRSs transform end-to-end: a compound CRS
transforms its horizontal component while z crosses the geoid surface
registered for its vertical datum/geoid model (kernels/grids.py::
GeoidGrid — PROJ's vgridshift; the bundled surface is a synthetic
closed-form stand-in, same container note as the horizontal shift
grids). With no registered surface, z passes through unchanged — the
reference's "ballpark vertical transformation".
"""

from __future__ import annotations

from pyproj_spark.crs import catalog
from pyproj_spark.crs.coordinate_operation import CoordinateOperation
from pyproj_spark.crs.crs import CRS
from pyproj_spark.crs.wkt_parse import _DATUM_ALIASES, _norm
from pyproj_spark.kernels.ellipsoid import Ellipsoid, get_ellipsoid

_SCHEMA = "https://proj.org/schemas/v0.7/projjson.schema.json"


# ------------------------------------------------------ datum / ellipsoid

class CustomEllipsoid(dict):
    """reference pyproj/crs/datum.py CustomEllipsoid — the PROJJSON
    ellipsoid dict, usable wherever a datum ellipsoid is expected."""

    def __init__(self, name: str = "undefined",
                 semi_major_axis: float | None = None,
                 inverse_flattening: float | None = None,
                 semi_minor_axis: float | None = None,
                 radius: float | None = None):
        if radius is not None and (semi_major_axis or inverse_flattening
                                   or semi_minor_axis):
            raise ValueError("radius is exclusive of other params")
        super().__init__(_custom_ellipsoid(
            name, semi_major_axis, inverse_flattening, semi_minor_axis,
            radius))


def _custom_ellipsoid(name="undefined", semi_major_axis=None,
                      inverse_flattening=None, semi_minor_axis=None,
                      radius=None) -> dict:
    if radius is not None:
        return {"name": name, "semi_major_axis": float(radius),
                "inverse_flattening": 0.0}
    d = {"name": name, "semi_major_axis": float(semi_major_axis)}
    if inverse_flattening:
        d["inverse_flattening"] = float(inverse_flattening)
    elif semi_minor_axis is not None:
        d["semi_minor_axis"] = float(semi_minor_axis)
    else:
        d["inverse_flattening"] = 0.0
    return d


def _ellipsoid_json(ell) -> dict:
    if isinstance(ell, dict):
        return ell
    if isinstance(ell, Ellipsoid):
        return {"name": ell.name, "semi_major_axis": ell.a,
                "inverse_flattening": ell.rf if ell.f else 0.0}
    e = get_ellipsoid(str(ell).replace(" ", ""))
    return _ellipsoid_json(e)


class Datum:
    """Geodetic reference frame wrapper (reference pyproj/crs/Datum)."""

    def __init__(self, name: str, ellipsoid_json: dict):
        self.name = name
        self._ellipsoid_json = ellipsoid_json

    @classmethod
    def from_user_input(cls, value) -> "Datum":
        if isinstance(value, Datum):
            return value
        if isinstance(value, dict):
            return cls(value.get("name", "unknown"), value["ellipsoid"])
        if isinstance(value, str):
            s = value
            # 'urn:ogc:def:datum:EPSG::6326' / ensemble urn -> WGS84
            if s.lower().startswith("urn:"):
                code = s.rsplit(":", 1)[-1]
                urn_map = {"6326": "WGS84", "6258": "ETRS89",
                           "6269": "NAD83", "6267": "NAD27"}
                if code not in urn_map:
                    raise ValueError(f"unknown datum urn {s!r}")
                s = urn_map[code]
            key = _DATUM_ALIASES.get(_norm(s), s)
            if key not in catalog.DATUMS:
                raise ValueError(f"unknown datum {value!r}")
            ellps = catalog.DATUMS[key][0]
            return cls(key, _ellipsoid_json(get_ellipsoid(ellps)))
        raise ValueError(f"cannot interpret datum input {value!r}")

    def to_json_dict(self) -> dict:
        return {"type": "GeodeticReferenceFrame", "name": self.name,
                "ellipsoid": self._ellipsoid_json}


class CustomDatum(Datum):
    """reference pyproj/crs/datum.py CustomDatum.of()."""

    def __init__(self, name: str = "undefined", ellipsoid="WGS84",
                 prime_meridian: str = "Greenwich"):
        if _norm(str(prime_meridian)) != "greenwich":
            raise ValueError("only the Greenwich prime meridian is "
                             "supported by this engine")
        super().__init__(name, _ellipsoid_json(ellipsoid))


# ------------------------------------------------------ coordinate systems

class Ellipsoidal2DCS:
    """reference pyproj/crs/coordinate_system.py — axis order holder."""

    def __init__(self, axis="LONGITUDE_LATITUDE"):
        self.axis = "neu" if "LATITUDE_LON" in str(axis).upper() \
            or str(axis) == "neu" else "enu"

    def to_json_dict(self) -> dict:
        lon = {"name": "Geodetic longitude", "abbreviation": "Lon",
               "direction": "east", "unit": "degree"}
        lat = {"name": "Geodetic latitude", "abbreviation": "Lat",
               "direction": "north", "unit": "degree"}
        axes = [lat, lon] if self.axis == "neu" else [lon, lat]
        return {"subtype": "ellipsoidal", "axis": axes}


class Cartesian2DCS:
    def __init__(self, axis="EASTING_NORTHING"):
        self.axis = "neu" if "NORTHING_EAST" in str(axis).upper() \
            or str(axis) == "neu" else "enu"

    def to_json_dict(self) -> dict:
        e = {"name": "Easting", "abbreviation": "E",
             "direction": "east", "unit": "metre"}
        n = {"name": "Northing", "abbreviation": "N",
             "direction": "north", "unit": "metre"}
        axes = [n, e] if self.axis == "neu" else [e, n]
        return {"subtype": "Cartesian", "axis": axes}


class Ellipsoidal3DCS(Ellipsoidal2DCS):
    """reference pyproj/crs/coordinate_system.py:127 — 2D axes plus
    ellipsoidal height."""

    def __init__(self, axis="LONGITUDE_LATITUDE_HEIGHT"):
        super().__init__(axis)

    def to_json_dict(self) -> dict:
        d = super().to_json_dict()
        d["axis"] = d["axis"] + [{
            "name": "Ellipsoidal height", "abbreviation": "h",
            "direction": "up", "unit": "metre"}]
        return d


class VerticalCS:
    def to_json_dict(self) -> dict:
        return {"subtype": "vertical",
                "axis": [{"name": "Gravity-related height",
                          "abbreviation": "H", "direction": "up",
                          "unit": "metre"}]}


def _cs_json(cs, default):
    if cs is None:
        return default().to_json_dict()
    if isinstance(cs, dict):
        return cs
    return cs.to_json_dict()


# -------------------------------------------------------------- CRS classes

class GeographicCRS(CRS):
    """reference crs.py:1798-1840."""

    def __init__(self, name: str = "undefined",
                 datum="urn:ogc:def:ensemble:EPSG::6326",
                 ellipsoidal_cs=None):
        d = Datum.from_user_input(datum)
        js = {"$schema": _SCHEMA, "type": "GeographicCRS", "name": name,
              "datum": d.to_json_dict(),
              "coordinate_system": _cs_json(ellipsoidal_cs,
                                            Ellipsoidal2DCS)}
        self.__dict__.update(CRS.from_json_dict(js).__dict__)


class GeocentricCRS(CRS):
    """reference crs.py:1893-1945."""

    def __init__(self, name: str = "undefined",
                 datum="urn:ogc:def:ensemble:EPSG::6326"):
        d = Datum.from_user_input(datum)
        js = {"$schema": _SCHEMA, "type": "GeodeticCRS", "name": name,
              "datum": d.to_json_dict(),
              "coordinate_system": {
                  "subtype": "Cartesian",
                  "axis": [{"name": f"Geocentric {a}", "abbreviation": a,
                            "direction": f"geocentric{a}",
                            "unit": "metre"} for a in "XYZ"]}}
        self.__dict__.update(CRS.from_json_dict(js).__dict__)


class DerivedGeographicCRS(CRS):
    """reference crs.py:1842-1891 — a rotated-pole (ob_tran) CRS. The
    kernel treats it as a projection whose outputs are degrees in the
    rotated frame (kernels/projections.py RotatedLatLon)."""

    def __init__(self, base_crs, conversion, name: str = "undefined",
                 ellipsoidal_cs=None):
        base = CRS.from_user_input(base_crs)
        conv = CoordinateOperation.from_user_input(conversion)
        from pyproj_spark.crs.projjson import _conversion_params
        params = _conversion_params(conv.to_json_dict())
        params.setdefault("proj", "ob_tran")
        e = base.ellipsoid
        params_str = " ".join(
            f"+{k}={v}" for k, v in sorted(params.items()))
        rec = dict(kind="projected", name=name, code=None,
                   datum=base.datum_name, ellps=None, ellipsoid=e,
                   towgs84=base.towgs84, axis="enu",
                   proj_params=params, to_meter=1.0)
        srs = f"{params_str} +a={e.a!r} +f={e.f!r}"
        self.__dict__.update(CRS._from_record(rec, srs).__dict__)


class ProjectedCRS(CRS):
    """reference crs.py:1948-1995."""

    def __init__(self, conversion, name: str = "undefined",
                 cartesian_cs=None, geodetic_crs=None):
        base = (CRS.from_user_input(geodetic_crs)
                if geodetic_crs is not None else GeographicCRS())
        conv = CoordinateOperation.from_user_input(conversion)
        js = {"$schema": _SCHEMA, "type": "ProjectedCRS", "name": name,
              "base_crs": base.to_json_dict(),
              "conversion": conv.to_json_dict(),
              "coordinate_system": _cs_json(cartesian_cs, Cartesian2DCS)}
        self.__dict__.update(CRS.from_json_dict(js).__dict__)


class VerticalCRS(CRS):
    """reference crs.py:1997-2043 — structural (no vertical transform
    surface is bundled; geoid_model is recorded, not applied)."""

    def __init__(self, name: str, datum: str, vertical_cs=None,
                 geoid_model: str | None = None):
        self.kind = "vertical"
        self.name = name
        self.epsg_code = None
        self.datum_name = str(datum)
        self.ellipsoid = None
        self.towgs84 = None
        self.axis = "up"
        self.proj_params = {"proj": "vertical"}
        self.to_meter = 1.0
        self.geoid_model = geoid_model
        # srs = canonical PROJJSON: round-trips through
        # CRS.from_user_input, which is what lets a TransformSpec
        # (keyed on srs strings) carry a vertical/compound CRS
        import json
        self.srs = json.dumps(self.to_json_dict())

    @property
    def axis_info(self):
        from types import SimpleNamespace as NS
        return [NS(name="Gravity-related height", abbrev="H",
                   direction="up", unit_name="metre")]

    def to_wkt(self, version: str = "WKT2_2019", pretty: bool = False):
        gm = (f',GEOIDMODEL["{self.geoid_model}"]'
              if self.geoid_model else "")
        return (f'VERTCRS["{self.name}",'
                f'VDATUM["{self.datum_name}"],CS[vertical,1],'
                f'AXIS["gravity-related height (H)",up],'
                f'LENGTHUNIT["metre",1]{gm}]')

    def to_json_dict(self) -> dict:
        d = {"$schema": _SCHEMA, "type": "VerticalCRS",
             "name": self.name,
             "datum": {"type": "VerticalReferenceFrame",
                       "name": self.datum_name},
             "coordinate_system": VerticalCS().to_json_dict()}
        if self.geoid_model:
            d["geoid_model"] = {"name": self.geoid_model}
        return d

    def __reduce__(self):
        return (VerticalCRS, (self.name, self.datum_name, None,
                              self.geoid_model))


class CompoundCRS(CRS):
    """reference crs.py:2045-2075 — horizontal + vertical components."""

    def __init__(self, name: str, components: list):
        comps = [c if isinstance(c, CRS) else CRS.from_user_input(c)
                 for c in components]
        self.kind = "compound"
        self.name = name
        self.epsg_code = None
        self.sub_crs_list = comps
        horiz = comps[0]
        self.datum_name = horiz.datum_name
        self.ellipsoid = horiz.ellipsoid
        self.towgs84 = horiz.towgs84
        self.axis = horiz.axis
        self.proj_params = {"proj": "compound"}
        self.to_meter = horiz.to_meter
        import json
        self.srs = json.dumps(self.to_json_dict())

    @property
    def axis_info(self):
        return [ax for c in self.sub_crs_list for ax in c.axis_info]

    def to_wkt(self, version: str = "WKT2_2019", pretty: bool = False):
        inner = ",".join(c.to_wkt() for c in self.sub_crs_list)
        return f'COMPOUNDCRS["{self.name}",{inner}]'

    def to_json_dict(self) -> dict:
        return {"$schema": _SCHEMA, "type": "CompoundCRS",
                "name": self.name,
                "components": [c.to_json_dict()
                               for c in self.sub_crs_list]}

    def __reduce__(self):
        return (CompoundCRS, (self.name, self.sub_crs_list))


class BoundCRS(CRS):
    """reference crs.py:2077-2107 — a CRS bound to WGS84 through an
    explicit transformation (the towgs84 leg)."""

    def __init__(self, source_crs, target_crs="WGS 84",
                 transformation=None):
        import json
        src = CRS.from_user_input(source_crs)
        if transformation is None:
            raise ValueError("transformation is required")
        tr = CoordinateOperation.from_user_input(transformation)
        vals = [float(p["value"]) for p in tr.params]
        if len(vals) not in (3, 7):
            raise ValueError("expected a 3- or 7-parameter "
                             "transformation")
        if target_crs in ("WGS 84", "WGS84"):
            target_crs = 4326
        tgt = CRS.from_user_input(target_crs)
        rec = dict(kind=src.kind, name=src.name, code=None,
                   datum=src.datum_name, ellps=None,
                   ellipsoid=src.ellipsoid, towgs84=tuple(vals),
                   axis=src.axis, proj_params=dict(src.proj_params),
                   to_meter=src.to_meter, bound=True)
        # srs stays machine-parseable (PROJJSON BoundCRS) — the
        # TransformSpec re-resolves it on executors
        srs = json.dumps({
            "$schema": _SCHEMA, "type": "BoundCRS",
            "source_crs": src.to_json_dict(),
            "target_crs": tgt.to_json_dict(),
            "transformation": tr.to_json_dict()})
        # NOTE: source_crs is a CRS class property (reconstructed from
        # the record for any bound CRS), so no instance attribute here
        self.__dict__.update(CRS._from_record(rec, srs).__dict__)
