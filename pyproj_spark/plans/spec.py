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
OP_VGRID = 6

OP_NAMES = {
    OP_NOOP: "Null transformation",
    OP_CONVERSION: "Conversion (same datum)",
    OP_HELMERT3: "Helmert geocentric translation (3-parameter)",
    OP_HELMERT7: "Helmert 7-parameter transformation",
    OP_BALLPARK: "Ballpark geographic offset",
    OP_GRID: "Gridded datum shift (hgridshift)",
    OP_VGRID: "Vertical geoid-grid shift (vgridshift)",
}


@dataclass(frozen=True)
class TransformSpec:
    """Picklable plan: everything a worker needs to build the kernel.

    The option fields mirror reference ``transformer.py:667-752``:
    ``accuracy`` (minimum metres; construction fails if the planned
    operation cannot meet it or has unknown accuracy), ``allow_
    ballpark`` (False refuses a ballpark plan at construction),
    ``force_over`` (+over: disable longitude wrapping in the
    projection legs), ``only_best`` (error at transform time when the
    best known operation's grid is not available instead of falling
    back — reference test_transformer.py:856-863 semantics)."""

    src_srs: str
    dst_srs: str
    always_xy: bool = False
    accuracy: Optional[float] = None
    allow_ballpark: Optional[bool] = None
    force_over: bool = False
    only_best: Optional[bool] = None

    @property
    def key(self) -> tuple:
        return (self.src_srs, self.dst_srs, self.always_xy,
                self.accuracy, self.allow_ballpark, self.force_over,
                self.only_best)


class _Kernel:
    """Compiled transform: callable on numpy arrays (x, y, z, t)."""

    def __init__(self, spec: TransformSpec):
        self.spec = spec
        self.src = CRS.from_user_input(spec.src_srs)
        self.dst = CRS.from_user_input(spec.dst_srs)
        # compound/vertical CRSs carry a real third dimension: the
        # facade's push/pop-v_3 z-restore must NOT apply to them
        self.src_is_3d = self.src.is_compound or self.src.is_vertical
        self.dst_is_3d = self.dst.is_compound or self.dst.is_vertical
        self.noop = self.src == self.dst
        if self.noop:
            return
        # vertical legs (reference transformer.py:841-985 z semantics):
        # a compound CRS transforms its HORIZONTAL component while z
        # crosses the geoid surface of its vertical component
        # (ellipsoidal h = gravity-related H + N(lon, lat), PROJ's
        # vgridshift); with no geoid surface registered for the
        # vertical datum, z passes through unchanged — the reference's
        # "ballpark vertical transformation".
        from pyproj_spark.kernels.grids import geoid_for

        def _vert(crs):
            if crs.is_compound:
                for c in crs.sub_crs_list:
                    if c.is_vertical:
                        return c
            return crs if crs.is_vertical else None

        def _geoid(crs):
            v = _vert(crs)
            if v is None:
                return None
            return geoid_for(getattr(v, "geoid_model", None)
                             or v.datum_name)

        self.src_geoid = _geoid(self.src)
        self.dst_geoid = _geoid(self.dst)
        self.vertical_only = self.src.is_vertical and self.dst.is_vertical
        if self.vertical_only:
            return
        if self.src.is_vertical or self.dst.is_vertical:
            from pyproj_spark.exceptions import CRSError
            raise CRSError(
                "cannot transform between a vertical-only CRS and a "
                "non-vertical CRS (no horizontal component)")
        if self.src.is_compound:
            self.src = next(c for c in self.src.sub_crs_list
                            if not c.is_vertical)
        if self.dst.is_compound:
            self.dst = next(c for c in self.dst.sub_crs_list
                            if not c.is_vertical)
        E_s, E_d = self.src.ellipsoid, self.dst.ellipsoid
        self.proj_src = self._make_proj(self.src, over=spec.force_over)
        self.proj_dst = self._make_proj(self.dst, over=spec.force_over)
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
        self._apply_plan_options(spec)

    def _apply_plan_options(self, spec: TransformSpec) -> None:
        """Enforce the from_crs option kwargs (reference
        transformer.py:667-752) against the planned operation.

        Accuracy model (engine policy, documented): noop and same-datum
        conversions are exact (0 m); a registered grid shift reports
        its inventory accuracy; a towgs84 Helmert leg is taken as 1 m
        (the typical published accuracy of towgs84 sets); ballpark and
        cross-datum conversions without a shift are UNKNOWN (-1) and
        never satisfy an accuracy filter — which reproduces the ported
        reference tests (4326->3857 passes any filter; 4326->4258
        raises, test_transformer.py:1372-1375)."""
        from pyproj_spark.exceptions import ProjError
        self.only_best_missing_grid = None
        if self.grid is not None:
            self.op_accuracy = self._inventory_accuracy(self.grid.name)
        elif self.base_op == OP_CONVERSION and (
                self.src.datum_name is not None
                and self.src.datum_name == self.dst.datum_name):
            self.op_accuracy = 0.0
        elif self.base_op in (OP_HELMERT3, OP_HELMERT7):
            self.op_accuracy = 1.0
        else:
            self.op_accuracy = -1.0
        if spec.allow_ballpark is False and self.base_op == OP_BALLPARK \
                and self.grid is None:
            raise ProjError(
                "Transformer creation failed: only a ballpark "
                "transformation is available and allow_ballpark=False")
        if spec.accuracy is not None and (
                self.op_accuracy < 0
                or self.op_accuracy > float(spec.accuracy)):
            raise ProjError(
                f"Transformer creation failed: no operation with "
                f"accuracy {spec.accuracy} m (planned operation "
                f"accuracy: {self.op_accuracy})")
        if spec.only_best:
            best = self._best_inventory_grid()
            if best is not None:
                from pyproj_spark.kernels.grids import _GRIDS
                if best not in _GRIDS:
                    self.only_best_missing_grid = best

    def _best_inventory_grid(self):
        """Filename of the best (lowest-accuracy, non-superseded)
        inventory grid for this datum pair, or None."""
        from pyproj_spark.catalog_api import _PAIR_GRIDS
        from pyproj_spark.kernels.grids import _GRIDS
        pair = _PAIR_GRIDS.get((self.src.datum_name,
                                self.dst.datum_name)) \
            or _PAIR_GRIDS.get((self.dst.datum_name,
                                self.src.datum_name)) or ()
        # best = lowest accuracy; accuracy ties prefer an AVAILABLE
        # grid (equally-accurate candidates are interchangeable, so an
        # available one IS a best operation)
        live = [(acc, fname not in _GRIDS, fname)
                for fname, acc, sup in pair if not sup]
        return min(live)[2] if live else None

    @staticmethod
    def _inventory_accuracy(grid_name: str) -> float:
        from pyproj_spark.catalog_api import _PAIR_GRIDS
        for entries in _PAIR_GRIDS.values():
            for fname, acc, _sup in entries:
                if fname == grid_name:
                    return float(acc)
        return 0.15  # registered synthetic grids: NADCON-class


    @staticmethod
    def _make_proj(crs: CRS, over: bool = False):
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
            return cls(crs.ellipsoid, zone=zone, south=south, over=over)
        if "k" in params and "k_0" not in params:
            params["k_0"] = params.pop("k")
        params.pop("units", None)
        return cls(crs.ellipsoid, over=over, **params)

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
        if getattr(self, "only_best_missing_grid", None):
            # only_best=True and the best known operation's grid is not
            # available: fail the points instead of falling back
            # (reference test_transformer.py:856-863)
            bad = np.full(x.shape, np.inf)
            ops = np.full(x.shape, OP_BALLPARK, dtype=np.int8)
            return (bad, bad.copy(), bad.copy() if has_z else None, ops)
        inverse = direction in (TransformDirection.INVERSE, "INVERSE")
        if getattr(self, "vertical_only", False):
            # vertical datum A -> B at horizontal position (x, y) =
            # (lon, lat) degrees: H_b = H_a + N_a - N_b
            g_s, g_d = ((self.dst_geoid, self.src_geoid) if inverse
                        else (self.src_geoid, self.dst_geoid))
            zo = z.copy()
            applied = False
            if g_s is not None:
                zo = zo + g_s.interpolate(x, y)
                applied = True
            if g_d is not None:
                zo = zo - g_d.interpolate(x, y)
                applied = True
            ops = np.full(x.shape,
                          OP_VGRID if applied else OP_BALLPARK,
                          dtype=np.int8)
            return (x, y, zo if has_z else None, ops)
        if inverse:
            src, dst = self.dst, self.src
            proj_s, proj_d = self.proj_dst, self.proj_src
            helm_s = getattr(self, "helm_dst", None)
            helm_d = getattr(self, "helm_src", None)
            geoid_s = getattr(self, "dst_geoid", None)
            geoid_d = getattr(self, "src_geoid", None)
        else:
            src, dst = self.src, self.dst
            proj_s, proj_d = self.proj_src, self.proj_dst
            helm_s = getattr(self, "helm_src", None)
            helm_d = getattr(self, "helm_dst", None)
            geoid_s = getattr(self, "src_geoid", None)
            geoid_d = getattr(self, "dst_geoid", None)

        ops = np.full(x.shape, self.base_op, dtype=np.int8)
        with np.errstate(all="ignore"):
            lam, phi, h = self._to_geodetic(src, proj_s, x, y, z)
            if geoid_s is not None:
                # gravity-related -> ellipsoidal height on the source
                # geoid surface (vgridshift forward)
                h = h + geoid_s.interpolate(np.degrees(lam),
                                            np.degrees(phi))
                ops = np.full(x.shape, OP_VGRID, dtype=np.int8)
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
            if geoid_d is not None:
                # ellipsoidal -> gravity-related on the target geoid
                h2 = h2 - geoid_d.interpolate(np.degrees(lam2),
                                              np.degrees(phi2))
                ops = np.full(x.shape, OP_VGRID, dtype=np.int8)
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
                 area_of_interest=None, authority: str | None = None,
                 accuracy: float | None = None,
                 allow_ballpark: bool | None = None,
                 force_over: bool = False,
                 only_best: bool | None = None,
                 **_ignored) -> "Transformer":
        """Reference transformer.py:667-752 contract. ``authority`` and
        ``area_of_interest`` select among candidate operations in the
        reference; this engine plans a single operation per pair, so
        they are accepted (and AOI-aware candidate pruning lives on
        TransformerGroup, catalog_api.py); the four semantic kwargs —
        accuracy / allow_ballpark / force_over / only_best — are
        enforced (see TransformSpec)."""
        src = CRS.from_user_input(crs_from)
        dst = CRS.from_user_input(crs_to)
        return cls(TransformSpec(
            src.srs, dst.srs, always_xy=always_xy,
            accuracy=None if accuracy is None else float(accuracy),
            allow_ballpark=allow_ballpark, force_over=bool(force_over),
            only_best=only_best))

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
        src3d = (src.is_geocentric or src.epsg_code == 4979
                 or (self._kernel.src_is_3d if fwd
                     else self._kernel.dst_is_3d))
        dst3d = (dst.is_geocentric or dst.epsg_code == 4979
                 or (self._kernel.dst_is_3d if fwd
                     else self._kernel.src_is_3d))
        if z is not None and not (src3d or dst3d):
            zo = z
        if radians and dst.is_geographic:
            xo, yo = np.radians(xo), np.radians(yo)
        xo, yo = self._axis_out(dst, xo, yo)
        if errcheck:
            bad = ~np.isfinite(xo) | ~np.isfinite(yo)
            if bad.any():
                from pyproj_spark.exceptions import ProjError
                missing = getattr(self._kernel,
                                  "only_best_missing_grid", None)
                if missing:
                    raise ProjError(
                        f"Grid {missing} is not available.")
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
