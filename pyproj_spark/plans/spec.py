"""TransformSpec + Transformer — the engine's query planner.

The Spark analogue of ``pyproj.Transformer`` (reference
``pyproj/transformer.py:667-752`` from_crs planning,
``pyproj/_transformer.pyx:620-680`` option packing):

* planning happens ONCE on the driver: resolve both CRSs, decide the
  step chain (inverse projection -> datum shift via geocentric Helmert
  -> forward projection), apply the noop elision rule
  (``pyproj/_transformer.pyx:772-773``);
* the resulting :class:`TransformSpec` is a small picklable object that
  is broadcast to executors;
* each python worker materializes the numpy kernel lazily, memoized by
  spec key — the Spark analogue of the reference's per-thread
  ``TransformerLocal`` (``pyproj/transformer.py:416-474``).

Executing a transform is one numpy pass per Arrow batch; errors are
in-band (NaN/inf), matching ``pyproj/_transformer.pyx:828-837``, with an
``errcheck=True`` raise option.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Optional

import numpy as np

from pyproj_spark.crs.crs import CRS
from pyproj_spark.kernels.datum import (
    Helmert, geocentric_to_geodetic, geodetic_to_geocentric,
)
from pyproj_spark.kernels.projections import PROJECTIONS


class TransformDirection(str, Enum):
    FORWARD = "FORWARD"
    INVERSE = "INVERSE"
    IDENT = "IDENT"


#: per-row operation codes (get_last_used_operation / op_id column —
#: reference ``pyproj/transformer.py:559-574``; per-row because grid
#: coverage makes the chosen operation point-dependent)
OP_NOOP = 0
OP_CONVERSION = 1
OP_HELMERT3 = 2
OP_HELMERT7 = 3
OP_BALLPARK = 4
OP_GRID = 5

OP_NAMES = {
    OP_NOOP: "Null transformation",
    OP_CONVERSION: "Conversion (same datum)",
    OP_HELMERT3: "Helmert geocentric translation (3-parameter)",
    OP_HELMERT7: "Helmert 7-parameter transformation",
    OP_BALLPARK: "Ballpark geographic offset",
    OP_GRID: "Gridded datum shift (hgridshift)",
}


@dataclass(frozen=True)
class TransformSpec:
    """Picklable plan: everything a worker needs to build the kernel."""

    src_srs: str
    dst_srs: str
    always_xy: bool = False

    @property
    def key(self) -> tuple:
        return (self.src_srs, self.dst_srs, self.always_xy)


class _Kernel:
    """Compiled transform: callable on numpy arrays (x, y, z, t)."""

    def __init__(self, spec: TransformSpec):
        self.spec = spec
        self.src = CRS.from_user_input(spec.src_srs)
        self.dst = CRS.from_user_input(spec.dst_srs)
        self.noop = self.src == self.dst
        if self.noop:
            return
        E_s, E_d = self.src.ellipsoid, self.dst.ellipsoid
        self.proj_src = self._make_proj(self.src)
        self.proj_dst = self._make_proj(self.dst)
        # datum legs: only when both sides define a shift and they differ
        # (or the ellipsoids differ). Missing towgs84 on either side =>
        # ballpark transform (reinterpret coordinates), like PROJ's
        # ballpark when no path exists.
        same_ell = (abs(E_s.a - E_d.a) < 1e-9 and abs(E_s.f - E_d.f) < 1e-15)
        h_s = self.src.towgs84
        h_d = self.dst.towgs84
        self.datum_shift = not (
            h_s is None or h_d is None or (tuple(h_s) == tuple(h_d)
                                           and same_ell))
        if self.datum_shift:
            self.helm_src = Helmert.from_towgs84(h_s)
            self.helm_dst = Helmert.from_towgs84(h_d)
        # gridded datum shift: registered per datum pair; in-coverage
        # points take the grid (horizontal-only, NADCON semantics),
        # out-of-coverage points fall back to the Helmert/ballpark leg
        from pyproj_spark.kernels.grids import grid_for
        self.grid = self.grid_inverse = None
        if self.src.datum_name != self.dst.datum_name:
            g, inv = grid_for(self.src.datum_name, self.dst.datum_name)
            if g is not None:
                self.grid, self.grid_inverse = g, inv
        # plan-level op classification for the non-grid leg
        if not self.datum_shift:
            # datum_shift False means equal towgs84 + same ellipsoid
            # (conversion) OR a missing shift on either side (ballpark
            # unless the datum names provably match)
            same_datum = (h_s is not None and h_d is not None) or (
                self.src.datum_name is not None
                and self.src.datum_name == self.dst.datum_name)
            self.base_op = OP_CONVERSION if same_datum else OP_BALLPARK
        else:
            pure3 = (len(tuple(h_s)) == 3 or tuple(h_s)[3:] == (0,) * 4) \
                and (len(tuple(h_d)) == 3 or tuple(h_d)[3:] == (0,) * 4)
            self.base_op = OP_HELMERT3 if pure3 else OP_HELMERT7

    @staticmethod
    def _make_proj(crs: CRS):
        if crs.is_geographic or crs.is_geocentric:
            return None
        params = dict(crs.proj_params)
        name = params.pop("proj")
        if name in ("geocent", "cart"):
            return None
        try:
            cls = PROJECTIONS[name]
        except KeyError:
            raise ValueError(f"projection {name!r} not implemented") from None
        if name == "utm":
            zone = int(params.pop("zone"))
            south = bool(params.pop("south", False))
            params.pop("k_0", None)
            return cls(crs.ellipsoid, zone=zone, south=south)
        if "k" in params and "k_0" not in params:
            params["k_0"] = params.pop("k")
        params.pop("units", None)
        return cls(crs.ellipsoid, **params)

    # -- one side: native units -> geodetic radians (+h meters), in the
    # GREENWICH frame: a non-Greenwich prime meridian (+pm=paris etc.)
    # shifts every longitude by its offset on the way in/out (PROJ's
    # +pm semantics; geocentric XYZ is frame-absolute and unaffected)
    def _to_geodetic(self, crs: CRS, proj, x, y, z):
        if crs.is_geocentric:
            lam, phi, h = geocentric_to_geodetic(crs.ellipsoid, x, y, z)
            return lam, phi, h
        pm = np.radians(getattr(crs, "pm", 0.0))
        if crs.is_geographic:
            return np.radians(x) + pm, np.radians(y), z
        u = crs.to_meter or 1.0
        lam, phi = proj.inverse(x * u, y * u)
        return lam + pm, phi, z

    def _from_geodetic(self, crs: CRS, proj, lam, phi, h):
        if crs.is_geocentric:
            return geodetic_to_geocentric(crs.ellipsoid, lam, phi, h)
        pm = np.radians(getattr(crs, "pm", 0.0))
        if crs.is_geographic:
            return np.degrees(lam - pm), np.degrees(phi), h
        u = crs.to_meter or 1.0
        x, y = proj.forward(lam - pm, phi)
        return x / u, y / u, h

    def __call__(self, x, y, z=None, t=None, direction="FORWARD"):
        xo, yo, zo, _ = self.call_with_ops(x, y, z, t=t,
                                           direction=direction)
        return xo, yo, zo

    def call_with_ops(self, x, y, z=None, t=None, direction="FORWARD"):
        """Like __call__ but also returns the per-point op-id array.

        STATELESS by design: kernels are memoized by spec key and shared
        across Transformer facades (and across FORWARD/INVERSE calls),
        so per-call state stored here would alias between transformers —
        the reference keeps last-used-operation state per Transformer
        (pyproj/transformer.py:559-574), and so do we (on the facade).
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        has_z = z is not None
        z = (np.asarray(z, dtype=np.float64) if has_z
             else np.zeros_like(x))
        if self.noop or direction == TransformDirection.IDENT or \
                direction == "IDENT":
            ops = np.full(x.shape, OP_NOOP, dtype=np.int8)
            return ((x, y, z) if has_z else (x, y, None)) + (ops,)
        if direction in (TransformDirection.INVERSE, "INVERSE"):
            src, dst = self.dst, self.src
            proj_s, proj_d = self.proj_dst, self.proj_src
            helm_s = getattr(self, "helm_dst", None)
            helm_d = getattr(self, "helm_src", None)
        else:
            src, dst = self.src, self.dst
            proj_s, proj_d = self.proj_src, self.proj_dst
            helm_s = getattr(self, "helm_src", None)
            helm_d = getattr(self, "helm_dst", None)

        ops = np.full(x.shape, self.base_op, dtype=np.int8)
        with np.errstate(all="ignore"):
            lam, phi, h = self._to_geodetic(src, proj_s, x, y, z)
            if self.datum_shift:
                X, Y, Z = geodetic_to_geocentric(src.ellipsoid, lam, phi, h)
                X, Y, Z = helm_s.forward(X, Y, Z, t=t)
                X, Y, Z = helm_d.inverse(X, Y, Z, t=t)
                lam2, phi2, h2 = geocentric_to_geodetic(dst.ellipsoid,
                                                        X, Y, Z)
            elif (abs(src.ellipsoid.a - dst.ellipsoid.a) > 1e-9
                  or abs(src.ellipsoid.f - dst.ellipsoid.f) > 1e-15) and \
                    not (src.towgs84 is None or dst.towgs84 is None):
                X, Y, Z = geodetic_to_geocentric(src.ellipsoid, lam, phi, h)
                lam2, phi2, h2 = geocentric_to_geodetic(dst.ellipsoid,
                                                        X, Y, Z)
            else:
                lam2, phi2, h2 = lam, phi, h
            if self.grid is not None:
                # in-coverage points take the grid shift INSTEAD of the
                # Helmert leg (NADCON semantics: the grid encodes the
                # full horizontal datum change; heights pass through)
                inv = self.grid_inverse
                if direction in (TransformDirection.INVERSE, "INVERSE"):
                    inv = not inv
                lon_d, lat_d = np.degrees(lam), np.degrees(phi)
                inside = self.grid.contains(lon_d, lat_d)
                if inside.any():
                    if inv:
                        glon, glat = self.grid.apply_inverse(lon_d, lat_d)
                    else:
                        glon, glat = self.grid.apply(lon_d, lat_d)
                    lam2 = np.where(inside, np.radians(glon), lam2)
                    phi2 = np.where(inside, np.radians(glat), phi2)
                    h2 = np.where(inside, h, h2)
                    ops = np.where(inside, np.int8(OP_GRID), ops)
            xo, yo, zo = self._from_geodetic(dst, proj_d, lam2, phi2, h2)
        return ((xo, yo, zo) if has_z else (xo, yo, None)) + (ops,)


_KERNEL_CACHE: dict[tuple, _Kernel] = {}


def get_kernel(spec: TransformSpec) -> _Kernel:
    """Per-worker memoized kernel table (the Spark analogue of the
    reference's per-thread transformer, pyproj/transformer.py:416-426)."""
    k = _KERNEL_CACHE.get(spec.key)
    if k is None:
        k = _Kernel(spec)
        _KERNEL_CACHE[spec.key] = k
    return k


class Transformer:
    """pyproj.Transformer-compatible facade over TransformSpec."""

    def __init__(self, spec: TransformSpec):
        self.spec = spec
        self._kernel = get_kernel(spec)

    @classmethod
    def from_crs(cls, crs_from, crs_to, always_xy: bool = False,
                 **_ignored) -> "Transformer":
        src = CRS.from_user_input(crs_from)
        dst = CRS.from_user_input(crs_to)
        return cls(TransformSpec(src.srs, dst.srs, always_xy=always_xy))

    @classmethod
    def from_pipeline(cls, proj_pipeline: str, always_xy: bool = False,
                      **_ignored):
        """Build a transformer from any operation input — reference
        ``pyproj/transformer.py:754-803``: a +proj=pipeline string,
        "AUTH:CODE" / OGC URN operation codes (regex fast path,
        _transformer.pyx:35,702-734) resolved against the bundled
        curated operation catalog (crs/operations.py),
        COORDINATEOPERATION/CONVERSION WKT, or operation PROJJSON.
        Unknown codes raise CRSError."""
        import re as _re

        from pyproj_spark.crs import operations as _ops
        s = str(proj_pipeline).strip()
        m = _re.match(r"^\+?init=([A-Za-z0-9]+):([A-Za-z0-9]+)$", s)
        if m and m.group(1).upper().startswith("ITRF"):
            from pyproj_spark.kernels.itrf import ITRFTransformer
            return ITRFTransformer(m.group(1), m.group(2))
        if _re.match(r"^urn:ogc:def:coordinateOperation\s*,", s, _re.I):
            return _ops.operation_from_concat_urn(s, always_xy=always_xy)
        m = _re.match(
            r"^urn:ogc:def:coordinateOperation:(\w+)::?(\w+)$", s, _re.I)
        if m:
            return _ops.operation_from_code(m.group(1), m.group(2),
                                            always_xy=always_xy)
        m = _re.match(r"^(\w+):(\w+)$", s)
        if m:
            return _ops.operation_from_code(m.group(1), m.group(2),
                                            always_xy=always_xy)
        if s.startswith("{"):
            return _ops.operation_from_json(s, always_xy=always_xy)
        if _re.match(r"^(COORDINATEOPERATION|CONVERSION)\s*[\[(]", s,
                     _re.I):
            return _ops.operation_from_wkt(s, always_xy=always_xy)
        if "proj=" not in s:
            # bare operation NAME (reference transformer.py:780-782)
            return _ops.operation_from_name(s, always_xy=always_xy)
        from pyproj_spark.plans.pipeline import PipelineTransformer
        return PipelineTransformer(proj_pipeline)

    # -- axis handling ------------------------------------------------------
    def _axis_in(self, crs: CRS, xx, yy):
        if not self.spec.always_xy and crs.axis == "neu":
            return yy, xx
        return xx, yy

    def _axis_out(self, crs: CRS, xx, yy):
        if not self.spec.always_xy and crs.axis == "neu":
            return yy, xx
        return xx, yy

    def transform(self, xx, yy, zz=None, tt=None, radians: bool = False,
                  errcheck: bool = False, direction="FORWARD",
                  inplace: bool = False):
        """Batch transform — semantics of pyproj/transformer.py:841-985.

        Containers round-trip like the reference (utils.py
        _copytobuffer/_convertback): scalar/0-d -> scalar,
        list -> list, tuple -> tuple, array-likes -> numpy arrays.
        """
        from pyproj_spark.utils import _convertback, _copytobuffer
        x, x_dt = _copytobuffer(xx)
        y, y_dt = _copytobuffer(yy)
        if zz is not None:
            z, z_dt = _copytobuffer(zz)
        else:
            z = None
        t = (np.atleast_1d(np.asarray(tt, dtype=np.float64))
             if tt is not None else None)
        fwd = direction in ("FORWARD", TransformDirection.FORWARD)
        src = self._kernel.src if fwd else self._kernel.dst
        dst = self._kernel.dst if fwd else self._kernel.src
        x, y = self._axis_in(src, x, y)
        if radians and src.is_geographic:
            x, y = np.degrees(x), np.degrees(y)
        xo, yo, zo, self._last_ops = self._kernel.call_with_ops(
            x, y, z, t=t, direction=direction)
        self._transformed = True
        # 2D<->2D semantics: PROJ brackets the pipeline in push/pop v_3,
        # so the input z rides along the datum leg but is RESTORED on
        # output (tested by reference test/test_datum_shift.py:38-70).
        src3d = src.is_geocentric or src.epsg_code == 4979
        dst3d = dst.is_geocentric or dst.epsg_code == 4979
        if z is not None and not (src3d or dst3d):
            zo = z
        if radians and dst.is_geographic:
            xo, yo = np.radians(xo), np.radians(yo)
        xo, yo = self._axis_out(dst, xo, yo)
        if errcheck:
            bad = ~np.isfinite(xo) | ~np.isfinite(yo)
            if bad.any():
                from pyproj_spark.exceptions import ProjError
                raise ProjError(f"transform error on {int(bad.sum())} "
                                f"point(s)")
        else:
            xo = np.where(np.isfinite(xo), xo, np.inf)
            yo = np.where(np.isfinite(yo), yo, np.inf)
        if zz is not None:
            return (_convertback(x_dt, xo), _convertback(y_dt, yo),
                    _convertback(z_dt, zo))
        return _convertback(x_dt, xo), _convertback(y_dt, yo)

    def itransform(self, points, switch: bool = False, **kw):
        """Iterator facade (reference transformer.py:987-1113) — batches
        the whole iterable at once (Spark is always batched)."""
        pts = list(points)
        if not pts:
            return
        arr = np.asarray(pts, dtype=np.float64)
        if switch:
            x, y = arr[:, 1], arr[:, 0]
        else:
            x, y = arr[:, 0], arr[:, 1]
        rest = arr[:, 2:] if arr.shape[1] > 2 else None
        xo, yo = self.transform(x, y, **kw)
        for i in range(len(pts)):
            head = (yo[i], xo[i]) if switch else (xo[i], yo[i])
            if rest is not None:
                yield (*head, *rest[i])
            else:
                yield head

    def transform_bounds(self, left, bottom, right, top,
                         densify_pts: int = 21, radians: bool = False,
                         direction="FORWARD"):
        """Transform a bbox by densifying its edges — reference
        ``pyproj/transformer.py:1115-1195``. Inputs/outputs follow the
        CRS axis order (or x/y when always_xy). Returns
        (left, bottom, right, top). Golden-tested against
        test/test_transformer.py:1449-1502."""
        if densify_pts < 0:
            raise RuntimeError("densify_pts must be >= 0")
        fwd = direction in ("FORWARD", TransformDirection.FORWARD)
        src = self._kernel.src if fwd else self._kernel.dst
        dst = self._kernel.dst if fwd else self._kernel.src
        n = densify_pts + 1
        # to x/y frame of the source
        if not self.spec.always_xy and src.axis == "neu":
            left, bottom, right, top = bottom, left, top, right
        f = np.arange(n, dtype=np.float64) / n
        xs = np.concatenate([
            left + (right - left) * f,            # bottom edge
            np.full(n, right),                    # right edge
            right - (right - left) * f,           # top edge
            np.full(n, left),                     # left edge
        ])
        ys = np.concatenate([
            np.full(n, bottom),
            bottom + (top - bottom) * f,
            np.full(n, top),
            top - (top - bottom) * f,
        ])
        if radians and src.is_geographic:
            xs, ys = np.degrees(xs), np.degrees(ys)
        xo, yo, _ = self._kernel(xs, ys, direction=direction)
        ok = np.isfinite(xo) & np.isfinite(yo)
        xo, yo = xo[ok], yo[ok]
        out_l, out_r = float(np.min(xo)), float(np.max(xo))
        out_b, out_t = float(np.min(yo)), float(np.max(yo))
        if dst.is_geographic and (out_r - out_l) > 180.0:
            # antimeridian crossing: envelope in the wrapped frame
            pos = xo[xo >= 0]
            neg = xo[xo < 0]
            if pos.size and neg.size:
                out_l, out_r = float(np.min(pos)), float(np.max(neg))
        if radians and dst.is_geographic:
            out_l, out_b, out_r, out_t = (np.radians(out_l),
                                          np.radians(out_b),
                                          np.radians(out_r),
                                          np.radians(out_t))
        if not self.spec.always_xy and dst.axis == "neu":
            return out_b, out_l, out_t, out_r
        return out_l, out_b, out_r, out_t

    def get_last_used_operation(self):
        """Operation used for the LAST point of the last transform call
        — reference ``pyproj/transformer.py:559-574`` (there the PROJ
        pipeline can switch operations per point when grids only cover
        part of the data; here likewise: grid vs Helmert fallback).
        For the per-row view over a DataFrame use
        ``functions.transform.transform_xy(..., with_op_id=True)``."""
        ops = getattr(self, "_last_ops", None)
        if ops is None or not getattr(self, "_transformed", False):
            raise RuntimeError(
                "The transform method must be called before"
                " get_last_used_operation.")
        from types import SimpleNamespace
        op_id = int(ops[-1])
        return SimpleNamespace(op_id=op_id, name=OP_NAMES[op_id],
                               method_name=OP_NAMES[op_id])

    @property
    def source_crs(self) -> CRS:
        return self._kernel.src

    @property
    def target_crs(self) -> CRS:
        return self._kernel.dst

    @property
    def name(self) -> str:
        return f"{self.spec.src_srs} -> {self.spec.dst_srs}"

    # -- metadata props (reference transformer.py:484-558) ------------------
    @property
    def description(self) -> str:
        k = self._kernel
        if k.noop:
            return OP_NAMES[OP_NOOP]
        parts = [OP_NAMES[k.base_op]]
        if k.grid is not None:
            parts.insert(0, f"{OP_NAMES[OP_GRID]} [{k.grid.name}]"
                            " where covered")
        return " + ".join(parts)

    @property
    def definition(self) -> str:
        """proj-pipeline-shaped definition of the planned transform."""
        k = self._kernel
        if k.noop:
            return "+proj=noop"
        steps = [f"+step +inv {k.src.to_proj4()}"]
        if k.grid is not None:
            steps.append(f"+step +proj=hgridshift +grids={k.grid.name}")
        elif k.datum_shift:
            steps.append("+step +proj=helmert")
        steps.append(f"+step {k.dst.to_proj4()}")
        return "+proj=pipeline " + " ".join(steps)

    @property
    def has_inverse(self) -> bool:
        return True  # every planned kernel is bidirectional

    @property
    def is_network_enabled(self) -> bool:
        """Reference transformer.py:476-482 — reflects the module
        network toggle (pyproj_spark.network.set_network_enabled /
        PROJ_NETWORK env var)."""
        from pyproj_spark.network import is_network_enabled
        return is_network_enabled()

    @property
    def accuracy(self) -> float:
        """Expected accuracy in metres; -1 if unknown (ballpark)."""
        k = self._kernel
        if k.noop:
            return 0.0
        if k.grid is not None:
            return 0.15
        return {OP_CONVERSION: 0.0, OP_HELMERT3: 2.0, OP_HELMERT7: 1.0,
                OP_BALLPARK: -1.0}.get(k.base_op, -1.0)

    @property
    def area_of_use(self):
        """Intersection of the two CRS areas of use (reference
        transformer.py:524-534 returns the operation's area)."""
        from pyproj_spark.aoi import AreaOfUse
        a = self._kernel.src.area_of_use
        b = self._kernel.dst.area_of_use
        w, s = max(a.west, b.west), max(a.south, b.south)
        e, n = min(a.east, b.east), min(a.north, b.north)
        return AreaOfUse(west=w, south=s, east=e, north=n,
                         name=f"{a.name} n {b.name}")

    @property
    def scope(self) -> str:
        return "Coordinate transformation (engine-planned)"

    @property
    def remarks(self) -> str:
        k = self._kernel
        if getattr(k, "grid", None) is not None:
            return (f"gridded datum shift via {k.grid.name}; Helmert "
                    "fallback outside grid coverage")
        return ""

    @property
    def operations(self) -> tuple:
        """The step chain of the planned pipeline as named operations."""
        from types import SimpleNamespace as NS
        k = self._kernel
        if k.noop:
            return (NS(name=OP_NAMES[OP_NOOP], method_name="noop"),)
        ops = []
        if not k.src.is_geographic:
            ops.append(NS(name=f"Inverse of {k.src.name}",
                          method_name=k.src.proj_params.get("proj")))
        if k.grid is not None:
            ops.append(NS(name=OP_NAMES[OP_GRID],
                          method_name="hgridshift"))
        elif k.datum_shift:
            ops.append(NS(name=OP_NAMES[k.base_op],
                          method_name="helmert"))
        if not k.dst.is_geographic:
            ops.append(NS(name=k.dst.name,
                          method_name=k.dst.proj_params.get("proj")))
        return tuple(ops)

    # -- exports (reference transformer.py:1197-1286) -----------------------
    def to_proj4(self) -> str:
        """The planned operation as a +proj=pipeline string (reference
        Transformer.to_proj4 emits the operation's PROJ definition)."""
        return self.definition

    def to_wkt(self, version: str = "WKT2_2019",
               pretty: bool = False) -> str:
        """COORDINATEOPERATION WKT2 of the planned transform: name,
        nested source/target CRS WKTs, the step chain as the METHOD
        name, and OPERATIONACCURACY when known."""
        k = self._kernel
        parts = [
            f'COORDINATEOPERATION["{self.name}"',
            f"SOURCECRS[{k.src.to_wkt(version)}]",
            f"TARGETCRS[{k.dst.to_wkt(version)}]",
            f'METHOD["{self.description}"]',
        ]
        if self.accuracy >= 0:
            parts.append(f"OPERATIONACCURACY[{self.accuracy}]")
        sep = ",\n    " if pretty else ","
        return sep.join(parts) + "]"

    def to_json_dict(self) -> dict:
        """PROJJSON-shaped dict of the planned transform (reference
        transformer.py:1252-1286)."""
        d = {
            "$schema": ("https://proj.org/schemas/v0.7/"
                        "projjson.schema.json"),
            "type": ("Conversion" if self.accuracy == 0.0
                     else "Transformation"),
            "name": self.name,
            "source_crs": self._kernel.src.to_json_dict(),
            "target_crs": self._kernel.dst.to_json_dict(),
            "method": {"name": self.description},
        }
        if self.accuracy > 0:
            d["accuracy"] = str(self.accuracy)
        return d

    def to_json(self, pretty: bool = False) -> str:
        import json
        return json.dumps(self.to_json_dict(),
                          indent=2 if pretty else None)

    def __repr__(self):
        return f"Transformer({self.name}, always_xy={self.spec.always_xy})"
