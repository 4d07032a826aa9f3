"""Curated EPSG coordinate-operation catalog + operation transformer —
the ``Transformer.from_pipeline("EPSG:1671")`` input family (reference
``pyproj/transformer.py:754-803``; AUTH:CODE regex fast path
``pyproj/_transformer.pyx:35,702-734``).

The reference resolves operation codes against the full EPSG database
shipped with PROJ; this engine bundles a curated subset of the
operations its tests and docs exercise (helmert-family transformations
plus the UTM conversion series), each with its published parameters.
Unknown codes raise the typed CRSError the input contract promises.

Supported from_pipeline inputs beyond +proj=pipeline strings:
  * "EPSG:1671"                                  (AUTH:CODE)
  * "urn:ogc:def:coordinateOperation:EPSG::1671" (OGC URN)
  * COORDINATEOPERATION[...] / CONVERSION[...] WKT
  * PROJJSON {"type": "Transformation" | "Conversion", ...}
"""

from __future__ import annotations

import numpy as np

from pyproj_spark.crs.crs import CRS
from pyproj_spark.exceptions import CRSError
from pyproj_spark.kernels.datum import (
    Helmert, geocentric_to_geodetic, geodetic_to_geocentric,
)
from pyproj_spark.kernels.ellipsoid import get_ellipsoid

#: EPSG method code/name per rotation convention
_METHODS = {
    "geocentric_translation": (9603,
                               "Geocentric translations (geog2D domain)"),
    "position_vector": (9606,
                        "Position Vector transformation (geog2D domain)"),
    "coordinate_frame": (9607, "Coordinate Frame rotation (geog2D domain)"),
}
_METHOD_BY_CODE = {c: k for k, (c, _n) in _METHODS.items()}

_PARAM_CODES = (
    (8605, "X-axis translation", "m"),
    (8606, "Y-axis translation", "m"),
    (8607, "Z-axis translation", "m"),
    (8608, "X-axis rotation", "arc-second"),
    (8609, "Y-axis rotation", "arc-second"),
    (8610, "Z-axis rotation", "arc-second"),
    (8611, "Scale difference", "ppm"),
)

#: code -> (name, src_epsg, dst_epsg, method, 7 params in the method's
#: PUBLISHED convention, accuracy_m, (w, s, e, n) area of use).
#: Values are the EPSG-registry published parameters.
OPERATIONS: dict[int, tuple] = {
    1671: ("RGF93 v1 to WGS 84 (1)", 4171, 4326, "position_vector",
           (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), 1.0,
           (-9.86, 41.15, 10.38, 51.56)),
    1133: ("ED50 to WGS 84 (1)", 4230, 4326, "geocentric_translation",
           (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0), 10.0,
           (-16.1, 34.88, 32.88, 84.73)),
    1311: ("ED50 to WGS 84 (18)", 4230, 4326, "position_vector",
           (-82.981, -99.719, -110.709, -0.5076, 0.1503, 0.3898, -0.3143),
           1.0, (-10.56, 52.0, 3.4, 62.01)),
    8048: ("GDA94 to GDA2020 (1)", 4283, 7844, "coordinate_frame",
           (0.06155, -0.01087, -0.04019,
            -0.0394924, -0.0327221, -0.0328979, -0.009994), 0.01,
           (93.41, -60.55, 173.34, -8.47)),
    # null hub transformations (published zero-parameter identities)
    1188: ("NAD83 to WGS 84 (1)", 4269, 4326, "geocentric_translation",
           (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), 2.0,
           (167.65, 14.92, -47.74, 86.45)),
    1149: ("ETRS89 to WGS 84 (1)", 4258, 4326, "geocentric_translation",
           (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), 1.0,
           (-16.1, 32.88, 40.18, 84.73)),
}


def _operation_record(code: int) -> dict:
    if code in OPERATIONS:
        name, src, dst, method, p, acc, area = OPERATIONS[code]
        return dict(code=code, name=name, src=src, dst=dst, method=method,
                    params=tuple(p), accuracy=acc, area=area)
    # UTM conversion series: 16001-16060 = zones 1N-60N,
    # 17001-17060 = zones 1S-60S
    if 16001 <= code <= 16060:
        return dict(code=code, kind="conversion",
                    name=f"UTM zone {code - 16000}N",
                    zone=code - 16000, south=False)
    if 17001 <= code <= 17060:
        return dict(code=code, kind="conversion",
                    name=f"UTM zone {code - 17000}S",
                    zone=code - 17000, south=True)
    raise CRSError(f"coordinate operation EPSG:{code} is not in the "
                   "bundled operation catalog")


class CoordinateOperationTransformer:
    """Transformer facade for ONE explicit coordinate operation — unlike
    the CRS->CRS planner it applies exactly the cataloged operation (the
    reference delegates this to proj_create_from_database)."""

    def __init__(self, rec: dict, always_xy: bool = False):
        self._rec = rec
        self.always_xy = always_xy
        self.name = rec["name"]
        self.description = rec["name"]
        self.has_inverse = True
        if rec.get("kind") == "conversion":
            from pyproj_spark.kernels.projections import PROJECTIONS
            self.accuracy = 0.0
            self.source_crs = CRS.from_epsg(4326)
            self.target_crs = None
            self._proj = PROJECTIONS["utm"](
                get_ellipsoid("GRS80"), zone=rec["zone"],
                south=rec["south"])
            self._helm = None
        else:
            self.accuracy = rec["accuracy"]
            self.source_crs = CRS.from_epsg(rec["src"])
            self.target_crs = CRS.from_epsg(rec["dst"])
            p = list(rec["params"])
            if rec["method"] == "coordinate_frame":
                # canonical kernel convention is position-vector; the
                # coordinate-frame rotation is its inverse rotation
                p[3], p[4], p[5] = -p[3], -p[4], -p[5]
            ea, eb = self.source_crs.ellipsoid, self.target_crs.ellipsoid
            # null operation between realization-equivalent ellipsoids
            # (e.g. EPSG:1671, GRS80 vs WGS84 — df ~ 1.6e-11, sub-mm):
            # exact passthrough, not a cart->helmert->cart round trip
            self._ident = (all(v == 0.0 for v in p)
                           and abs(ea.a - eb.a) < 1e-6
                           and abs(ea.f - eb.f) < 1e-9)
            self._helm = Helmert(*p)
            self._proj = None

    @property
    def srs(self) -> str:
        return f"EPSG:{self._rec['code']}"

    def _swap(self, crs, x, y):
        if crs is not None and not self.always_xy and crs.axis == "neu":
            return y, x
        return x, y

    def transform(self, xx, yy, zz=None, radians: bool = False,
                  errcheck: bool = False, direction="FORWARD", **_kw):
        scalar = np.isscalar(xx) and np.isscalar(yy)
        x = np.atleast_1d(np.asarray(xx, dtype=np.float64))
        y = np.atleast_1d(np.asarray(yy, dtype=np.float64))
        z = (np.atleast_1d(np.asarray(zz, dtype=np.float64))
             if zz is not None else np.zeros_like(x))
        d = getattr(direction, "value", direction)
        if d == "IDENT":
            out = (x, y, z)
        elif self._proj is not None:
            if d == "INVERSE":
                lam, phi = self._proj.inverse(x, y)
                xo, yo = np.degrees(lam), np.degrees(phi)
                xo, yo = self._swap(self.source_crs, xo, yo)
                out = (xo, yo, z)
            else:
                x, y = self._swap(self.source_crs, x, y)
                if not radians:
                    x, y = np.radians(x), np.radians(y)
                xo, yo = self._proj.forward(x, y)
                out = (xo, yo, z)
        else:
            src, dst = self.source_crs, self.target_crs
            hfn = self._helm.forward
            if d == "INVERSE":
                src, dst = dst, src
                hfn = self._helm.inverse
            x, y = self._swap(src, x, y)
            if self._ident:
                xo, yo = self._swap(dst, x, y)
                out = (xo, yo, z)
                return self._finish(out, zz, scalar, errcheck)
            if not radians:
                lam, phi = np.radians(x), np.radians(y)
            else:
                lam, phi = x, y
            X, Y, Z = geodetic_to_geocentric(src.ellipsoid, lam, phi, z)
            X, Y, Z = hfn(X, Y, Z)
            lam, phi, h = geocentric_to_geodetic(dst.ellipsoid, X, Y, Z)
            xo, yo = (lam, phi) if radians else (np.degrees(lam),
                                                 np.degrees(phi))
            xo, yo = self._swap(dst, xo, yo)
            # 2D domain: input height rides along, restored on output
            out = (xo, yo, z if zz is not None else h)
        return self._finish(out, zz, scalar, errcheck)

    @staticmethod
    def _finish(out, zz, scalar, errcheck):
        xo, yo, zo = out
        if errcheck and (~np.isfinite(xo) | ~np.isfinite(yo)).any():
            from pyproj_spark.exceptions import ProjError
            raise ProjError("operation transform error")
        if scalar:
            return ((float(xo[0]), float(yo[0]), float(zo[0]))
                    if zz is not None else (float(xo[0]), float(yo[0])))
        return (xo, yo, zo) if zz is not None else (xo, yo)

    # ---------------------------------------------------------- exports
    def to_wkt(self, *_a, **_kw) -> str:
        rec = self._rec
        if rec.get("kind") == "conversion":
            z, south = rec["zone"], rec["south"]
            lat0, lon0 = 0.0, z * 6 - 183
            fn = 10000000.0 if south else 0.0
            return (
                f'CONVERSION["{rec["name"]}",'
                f'METHOD["Transverse Mercator",ID["EPSG",9807]],'
                f'PARAMETER["Latitude of natural origin",{lat0},'
                f'ID["EPSG",8801]],'
                f'PARAMETER["Longitude of natural origin",{lon0},'
                f'ID["EPSG",8802]],'
                f'PARAMETER["Scale factor at natural origin",0.9996,'
                f'ID["EPSG",8805]],'
                f'PARAMETER["False easting",500000,ID["EPSG",8806]],'
                f'PARAMETER["False northing",{fn},ID["EPSG",8807]],'
                f'ID["EPSG",{rec["code"]}]]')
        mcode, mname = _METHODS[rec["method"]]
        params = []
        for (pcode, pname, _unit), val in zip(_PARAM_CODES, rec["params"]):
            params.append(f'PARAMETER["{pname}",{val!r},'
                          f'ID["EPSG",{pcode}]]')
        return (
            f'COORDINATEOPERATION["{rec["name"]}",'
            f'SOURCECRS[{self.source_crs.to_wkt()}],'
            f'TARGETCRS[{self.target_crs.to_wkt()}],'
            f'METHOD["{mname}",ID["EPSG",{mcode}]],'
            + ",".join(params) +
            f',OPERATIONACCURACY[{rec["accuracy"]!r}],'
            f'ID["EPSG",{rec["code"]}]]')

    def to_json_dict(self) -> dict:
        rec = self._rec
        if rec.get("kind") == "conversion":
            return {"$schema": "https://proj.org/schemas/v0.7/projjson"
                               ".schema.json",
                    "type": "Conversion", "name": rec["name"],
                    "id": {"authority": "EPSG", "code": rec["code"]}}
        mcode, mname = _METHODS[rec["method"]]
        return {
            "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
            "type": "Transformation",
            "name": rec["name"],
            "source_crs": self.source_crs.to_json_dict(),
            "target_crs": self.target_crs.to_json_dict(),
            "method": {"name": mname,
                       "id": {"authority": "EPSG", "code": mcode}},
            "parameters": [
                {"name": pname, "value": val, "unit": unit,
                 "id": {"authority": "EPSG", "code": pcode}}
                for (pcode, pname, unit), val
                in zip(_PARAM_CODES, rec["params"])],
            "accuracy": str(rec["accuracy"]),
            "id": {"authority": "EPSG", "code": rec["code"]},
        }

    def to_json(self) -> str:
        import json
        return json.dumps(self.to_json_dict())

    def __repr__(self):
        return (f"CoordinateOperationTransformer(EPSG:{self._rec['code']} "
                f"{self.name!r})")


class ConcatenatedOperationTransformer:
    """Chain of cataloged operations — the OGC concatenated-operation
    URN input family (reference ``pyproj/transformer.py:780-782``,
    step list exposed via ``.operations`` like
    ``_get_concatenated_operations``, _crs.pyx:177-199).

    Each listed operation is used forward or inverted, whichever links
    the chain (PROJ resolves orientation the same way when assembling
    a concatenated operation from the database); an unlinkable list
    raises CRSError.
    """

    def __init__(self, steps, always_xy: bool = False):
        if len(steps) < 2:
            raise CRSError("a concatenated operation needs >= 2 steps")
        for op in steps:
            if op.target_crs is None:
                raise CRSError(
                    "conversions cannot participate in a concatenated "
                    f"operation URN: {op.name!r}")
        self.always_xy = always_xy
        self._steps = self._link(steps)
        self.operations = tuple(op for op, _inv in self._steps)
        op0, inv0 = self._steps[0]
        opn, invn = self._steps[-1]
        self.source_crs = op0.target_crs if inv0 else op0.source_crs
        self.target_crs = opn.source_crs if invn else opn.target_crs
        self.name = " + ".join(
            (f"Inverse of {op.name}" if inv else op.name)
            for op, inv in self._steps)
        self.description = self.name
        self.has_inverse = True
        accs = [op.accuracy for op, _ in self._steps]
        self.accuracy = -1.0 if any(a < 0 for a in accs) else sum(accs)

    @staticmethod
    def _link(steps):
        """Pick a forward/inverted orientation per step so consecutive
        CRSs match; the first step prefers forward."""
        first = steps[0]
        for inv0 in (False, True):
            chain = [(first, inv0)]
            end = first.source_crs if inv0 else first.target_crs
            ok = True
            for op in steps[1:]:
                if op.source_crs == end:
                    chain.append((op, False))
                    end = op.target_crs
                elif op.target_crs == end:
                    chain.append((op, True))
                    end = op.source_crs
                else:
                    ok = False
                    break
            if ok:
                return chain
        names = [op.name for op in steps]
        raise CRSError(
            f"operations do not form a linkable chain: {names}")

    @property
    def srs(self) -> str:
        return ",".join(op.srs for op in self.operations)

    def transform(self, xx, yy, zz=None, radians: bool = False,
                  errcheck: bool = False, direction="FORWARD", **_kw):
        d = getattr(direction, "value", direction)
        if d == "IDENT":
            return self.operations[0].transform(
                xx, yy, zz, radians=radians, errcheck=errcheck,
                direction="IDENT")
        steps = self._steps if d == "FORWARD" else [
            (op, not inv) for op, inv in reversed(self._steps)]
        x, y, z = xx, yy, zz
        for op, inv in steps:
            res = op.transform(
                x, y, z, radians=radians, errcheck=errcheck,
                direction="INVERSE" if inv else "FORWARD")
            if z is not None:
                x, y, z = res
            else:
                x, y = res
        return res

    def itransform(self, points, switch: bool = False, **kw):
        for pt in points:
            x, y = (pt[1], pt[0]) if switch else (pt[0], pt[1])
            yield self.transform(x, y, **kw)

    def __repr__(self):
        return f"ConcatenatedOperationTransformer({self.name!r})"


def operation_from_concat_urn(s: str, always_xy: bool = False
                              ) -> ConcatenatedOperationTransformer:
    """Parse ``urn:ogc:def:coordinateOperation,coordinateOperation:
    EPSG::3895,coordinateOperation:EPSG::1618``-style URNs (reference
    transformer.py:780-782)."""
    import re
    body = s.split(",", 1)[1]
    steps = []
    for part in body.split(","):
        m = re.match(r"^\s*coordinateOperation:(\w+):+(\w+)\s*$", part)
        if not m:
            raise CRSError(f"malformed concatenated-operation URN "
                           f"component {part!r}")
        steps.append(operation_from_code(m.group(1), m.group(2),
                                         always_xy=always_xy))
    return ConcatenatedOperationTransformer(steps, always_xy=always_xy)


def operation_from_code(auth: str, code,
                        always_xy: bool = False
                        ) -> CoordinateOperationTransformer:
    if str(auth).upper() != "EPSG":
        raise CRSError(f"unsupported operation authority {auth!r}")
    try:
        icode = int(code)
    except (TypeError, ValueError):
        raise CRSError(f"invalid operation code {code!r}") from None
    return CoordinateOperationTransformer(_operation_record(icode),
                                          always_xy=always_xy)


def _node_epsg(node) -> int | None:
    from pyproj_spark.crs.wkt_parse import _epsg_id
    return _epsg_id(node)


def operation_from_wkt(s: str, always_xy: bool = False
                       ) -> CoordinateOperationTransformer:
    """Parse COORDINATEOPERATION/CONVERSION WKT. Cataloged codes (by
    trailing ID node) resolve exactly; un-cataloged helmert-method
    operations are built generically from METHOD + PARAMETERs."""
    from pyproj_spark.crs.wkt_parse import parse_wkt
    node = parse_wkt(s)
    kw = node.keyword.upper()
    if kw not in ("COORDINATEOPERATION", "CONVERSION"):
        raise CRSError(f"not an operation WKT root: {node.keyword}")
    code = _node_epsg(node)
    if code is not None:
        try:
            return CoordinateOperationTransformer(_operation_record(code),
                                                  always_xy=always_xy)
        except CRSError:
            pass  # un-cataloged id: fall through to generic parse
    if kw == "CONVERSION":
        raise CRSError("un-cataloged CONVERSION WKT is not supported; "
                       "use a +proj pipeline string")
    method = node.find("METHOD")
    if method is None:
        raise CRSError("COORDINATEOPERATION has no METHOD")
    mkey = _METHOD_BY_CODE.get(_node_epsg(method))
    if mkey is None:
        low = (method.name or "").lower()
        for k, (_c, n) in _METHODS.items():
            if n.lower().split(" (")[0] in low:
                mkey = k
                break
    if mkey is None:
        raise CRSError(f"unsupported operation method {method.name!r}")
    by_code = {c: i for i, (c, _n, _u) in enumerate(_PARAM_CODES)}
    by_name = {n.lower(): i for i, (_c, n, _u) in enumerate(_PARAM_CODES)}
    params = [0.0] * 7
    for p in node.find_all("PARAMETER"):
        i = by_code.get(_node_epsg(p))
        if i is None:
            i = by_name.get(str(p.values[0]).lower())
        if i is None:
            raise CRSError(f"unsupported operation parameter "
                           f"{p.values[0]!r}")
        params[i] = next(v for v in p.values[1:] if isinstance(v, float))
    src_node = node.find("SOURCECRS")
    dst_node = node.find("TARGETCRS")
    if src_node is None or dst_node is None:
        raise CRSError("COORDINATEOPERATION needs SOURCECRS and TARGETCRS")
    src = _node_epsg(src_node.values[0]) if src_node.values else None
    dst = _node_epsg(dst_node.values[0]) if dst_node.values else None
    if src is None or dst is None:
        raise CRSError("SOURCECRS/TARGETCRS must carry an EPSG ID")
    acc_node = node.find("OPERATIONACCURACY")
    acc = float(acc_node.values[0]) if acc_node and acc_node.values else -1.0
    rec = dict(code=code or 0, name=node.name or "unnamed operation",
               src=src, dst=dst, method=mkey, params=tuple(params),
               accuracy=acc, area=(-180.0, -90.0, 180.0, 90.0))
    return CoordinateOperationTransformer(rec, always_xy=always_xy)


def operation_from_name(name: str, always_xy: bool = False
                        ) -> CoordinateOperationTransformer:
    """Resolve an operation by its NAME (reference from_pipeline accepts
    object names, transformer.py:780-782, "uniqueness is not
    guaranteed ... heuristics are applied"). Resolution order over the
    bundled catalog (incl. the UTM conversion series): exact
    case-insensitive match -> punctuation/space-insensitive match ->
    unique substring match; an ambiguous substring raises CRSError
    naming the candidates."""
    import re

    def _squash(s: str) -> str:
        return re.sub(r"[^a-z0-9]", "", s.lower())

    want = name.strip().lower()
    for code, (opname, *_rest) in OPERATIONS.items():
        if opname.lower() == want:
            return CoordinateOperationTransformer(_operation_record(code),
                                                  always_xy=always_xy)
    m = re.match(r"^utm zone (\d{1,2})\s*([ns])$", want)
    if m:
        z = int(m.group(1))
        if 1 <= z <= 60:
            code = (16000 if m.group(2) == "n" else 17000) + z
            return CoordinateOperationTransformer(
                _operation_record(code), always_xy=always_xy)
    # heuristic tiers (reference applies best-match heuristics here)
    sq = _squash(want)
    if sq:
        exact_sq = [c for c, (n, *_r) in OPERATIONS.items()
                    if _squash(n) == sq]
        if len(exact_sq) == 1:
            return CoordinateOperationTransformer(
                _operation_record(exact_sq[0]), always_xy=always_xy)
        subs = [c for c, (n, *_r) in OPERATIONS.items()
                if sq in _squash(n)]
        if len(subs) == 1:
            return CoordinateOperationTransformer(
                _operation_record(subs[0]), always_xy=always_xy)
        if len(subs) > 1:
            names = sorted(OPERATIONS[c][0] for c in subs)
            raise CRSError(
                f"operation name {name!r} is ambiguous: {names}")
    raise CRSError(f"no cataloged coordinate operation named {name!r}")


def operation_from_json(obj, always_xy: bool = False
                        ) -> CoordinateOperationTransformer:
    import json
    if isinstance(obj, str):
        obj = json.loads(obj)
    if obj.get("type") not in ("Transformation", "Conversion"):
        raise CRSError(f"not an operation PROJJSON: {obj.get('type')!r}")
    code = (obj.get("id") or {}).get("code")
    if code is not None:
        return CoordinateOperationTransformer(
            _operation_record(int(code)), always_xy=always_xy)
    raise CRSError("operation PROJJSON without an EPSG id is not in the "
                   "bundled catalog")
