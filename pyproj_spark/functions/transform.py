"""Spark column functions for CRS transforms — scalar pandas/Arrow UDFs.

One Arrow batch in -> one out, never per-row Python (the engine-wide
rule from BASELINE.json input_hint). The TransformSpec is resolved on
the driver (plan once — reference ``docs/advanced_examples.rst:269-291``
shows why) and captured in the UDF closure; each python worker
materializes the numpy kernel once per spec via the module-level cache
in ``pyproj_spark.plans.spec`` (the Spark analogue of the reference's
per-thread ``TransformerLocal``, ``pyproj/transformer.py:416-474``).

Noop elision: if src == dst CRS the returned Column is built from the
input columns directly — no UDF enters the plan at all
(``pyproj/_transformer.pyx:772-773`` semantics, §4 of SURVEY.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — kept for callers' type hints
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf

from pyproj_spark.crs.crs import CRS
from pyproj_spark.plans.spec import TransformSpec, get_kernel


def transform_xy(crs_from, crs_to, x: Column, y: Column,
                 always_xy: bool = True, with_op_id: bool = False
                 ) -> Column:
    """struct<x:double, y:double> column transforming (x, y) between CRSs.

    ``always_xy=True`` by default: engine-internal coordinate columns are
    always (lon/easting, lat/northing); authority axis order only matters
    at the user-facing Transformer API.

    ``with_op_id=True`` adds an ``op_id:int`` field — the per-row
    operation actually used (the DataFrame form of the reference's
    ``get_last_used_operation``, ``pyproj/transformer.py:559-574``;
    per-row because grid coverage makes the operation point-dependent:
    in-grid rows report OP_GRID, the rest the Helmert/ballpark fallback).
    """
    src = CRS.from_user_input(crs_from)
    dst = CRS.from_user_input(crs_to)
    spec = TransformSpec(src.srs, dst.srs, always_xy=always_xy)
    if src == dst:
        # noop elision: identity projection, no Python boundary
        if with_op_id:
            return F.struct(x.cast("double").alias("x"),
                            y.cast("double").alias("y"),
                            F.lit(0).cast("int").alias("op_id"))
        return F.struct(x.cast("double").alias("x"),
                        y.cast("double").alias("y"))

    if with_op_id:
        @arrow_udf("struct<x:double,y:double,op_id:int>")
        def _xf_op(xs: pa.Array, ys: pa.Array) -> pa.Array:
            k = get_kernel(spec)
            xo, yo, _, ops = k.call_with_ops(
                xs.to_numpy(zero_copy_only=False),
                ys.to_numpy(zero_copy_only=False))
            return pa.StructArray.from_arrays(
                [pa.array(xo), pa.array(yo),
                 pa.array(ops.astype("int32"))],
                names=["x", "y", "op_id"])

        return _xf_op(x, y)

    @arrow_udf("struct<x:double,y:double>")
    def _xf(xs: pa.Array, ys: pa.Array) -> pa.Array:
        k = get_kernel(spec)
        xo, yo, _ = k(xs.to_numpy(zero_copy_only=False),
                      ys.to_numpy(zero_copy_only=False))
        return pa.StructArray.from_arrays(
            [pa.array(xo), pa.array(yo)], names=["x", "y"])

    return _xf(x, y)


def transform_xy_keyed(crs_from, crs_by_key: dict, key: Column,
                       x: Column, y: Column,
                       always_xy: bool = True) -> Column:
    """Per-row destination CRS chosen by an integer ``key`` column —
    one scan, one Arrow batch, one Python boundary for a whole zone
    family (UTM zones, SPCS83 state planes). The reference makes one
    ``Transformer`` per pair (pyproj/transformer.py:184-230) and loops;
    at 100 TB a per-zone branch-and-union would rescan the source once
    per zone, so the zone dispatch moves inside the kernel: rows are
    masked per key in numpy and each sub-batch goes through the planned
    per-worker cached kernel. Rows whose key is absent from the map
    come back NaN (like errcheck=False out-of-domain points).
    """
    src_srs = CRS.from_user_input(crs_from).srs
    specs = {int(k): TransformSpec(src_srs,
                                   CRS.from_user_input(v).srs,
                                   always_xy=always_xy)
             for k, v in crs_by_key.items()}

    @arrow_udf("struct<x:double,y:double>")
    def _xfk(keys: pa.Array, xs: pa.Array, ys: pa.Array) -> pa.Array:
        kn = keys.to_numpy(zero_copy_only=False)
        xn = np.asarray(xs.to_numpy(zero_copy_only=False),
                        dtype="float64")
        yn = np.asarray(ys.to_numpy(zero_copy_only=False),
                        dtype="float64")
        xo = np.full(len(xn), np.nan)
        yo = np.full(len(yn), np.nan)
        for kv, spec in specs.items():
            m = kn == kv
            if m.any():
                kern = get_kernel(spec)
                xm, ym, _ = kern(xn[m], yn[m])
                xo[m], yo[m] = xm, ym
        return pa.StructArray.from_arrays(
            [pa.array(xo), pa.array(yo)], names=["x", "y"])

    return _xfk(key, x, y)


def transform_xyz(crs_from, crs_to, x: Column, y: Column, z: Column,
                  always_xy: bool = True) -> Column:
    """3D variant -> struct<x,y,z>."""
    src = CRS.from_user_input(crs_from)
    dst = CRS.from_user_input(crs_to)
    spec = TransformSpec(src.srs, dst.srs, always_xy=always_xy)
    if src == dst:
        return F.struct(x.cast("double").alias("x"),
                        y.cast("double").alias("y"),
                        z.cast("double").alias("z"))

    @arrow_udf("struct<x:double,y:double,z:double>")
    def _xf(xs: pa.Array, ys: pa.Array, zs: pa.Array) -> pa.Array:
        k = get_kernel(spec)
        xo, yo, zo = k(xs.to_numpy(zero_copy_only=False),
                       ys.to_numpy(zero_copy_only=False),
                       zs.to_numpy(zero_copy_only=False))
        return pa.StructArray.from_arrays(
            [pa.array(xo), pa.array(yo), pa.array(zo)],
            names=["x", "y", "z"])

    return _xf(x, y, z)


_PIPELINE_CACHE: dict = {}


def transform_pipeline(pipeline: str, x: Column, y: Column,
                       z: Column | None = None) -> Column:
    """Run a ``+proj=pipeline`` string over coordinate columns ->
    struct<x,y,z>. The DataFrame form of the reference's
    ``Transformer.from_pipeline(...).transform(...)``
    (``pyproj/transformer.py:270-330``): the string is validated on the
    driver, each python worker parses it once (module cache keyed by
    the string — the kernel holds only step closures), and whole Arrow
    batches cross in one call."""
    from pyproj_spark.plans.pipeline import PipelineKernel
    PipelineKernel(pipeline)  # driver-side validation: raise HERE

    @arrow_udf("struct<x:double,y:double,z:double>")
    def _pl(xs: pa.Array, ys: pa.Array, zs: pa.Array) -> pa.Array:
        k = _PIPELINE_CACHE.get(pipeline)
        if k is None:
            from pyproj_spark.plans.pipeline import PipelineKernel as PK
            k = _PIPELINE_CACHE[pipeline] = PK(pipeline)
        xo, yo, zo = k(
            np.asarray(xs.to_numpy(zero_copy_only=False), dtype="float64"),
            np.asarray(ys.to_numpy(zero_copy_only=False), dtype="float64"),
            np.asarray(zs.to_numpy(zero_copy_only=False), dtype="float64"))
        return pa.StructArray.from_arrays(
            [pa.array(xo), pa.array(yo), pa.array(zo)],
            names=["x", "y", "z"])

    zc = F.lit(0.0) if z is None else z.cast("double")
    return _pl(x, y, zc)


_ITRF_CACHE: dict = {}


def transform_itrf(frame_from: str, frame_to: str, x: Column, y: Column,
                   z: Column, t: Column) -> Column:
    """struct<x,y,z> — the 4D time-dependent ITRF frame transform with
    a PER-ROW epoch column (the DataFrame form of the reference's
    ``Transformer.from_pipeline("+init=A:B").transform(xx,yy,zz,tt)``,
    golden at reference test/test_transformer.py:87-102): the
    published IERS rates are evaluated at each row's decimal year
    before the 14-parameter Helmert applies. Frames are validated on
    the driver; workers cache one kernel per frame pair."""
    from pyproj_spark.kernels.itrf import ITRFTransformer
    ITRFTransformer(frame_from, frame_to)  # driver-side validation
    key = (frame_from, frame_to)

    @arrow_udf("struct<x:double,y:double,z:double>")
    def _itrf(xs: pa.Array, ys: pa.Array, zs: pa.Array,
              ts: pa.Array) -> pa.Array:
        tr = _ITRF_CACHE.get(key)
        if tr is None:
            from pyproj_spark.kernels.itrf import ITRFTransformer as IT
            tr = _ITRF_CACHE[key] = IT(*key)
        xo, yo, zo, _ = tr.transform(
            np.asarray(xs.to_numpy(zero_copy_only=False), dtype="float64"),
            np.asarray(ys.to_numpy(zero_copy_only=False), dtype="float64"),
            zz=np.asarray(zs.to_numpy(zero_copy_only=False),
                          dtype="float64"),
            tt=np.asarray(ts.to_numpy(zero_copy_only=False),
                          dtype="float64"))
        return pa.StructArray.from_arrays(
            [pa.array(xo), pa.array(yo), pa.array(zo)],
            names=["x", "y", "z"])

    return _itrf(x.cast("double"), y.cast("double"),
                 z.cast("double"), t.cast("double"))


def geod_inverse(ellps: str, lon1: Column, lat1: Column, lon2: Column,
                 lat2: Column) -> Column:
    """struct<az12,az21,dist> — Karney inverse as a pandas UDF.
    az21 is the back azimuth (pyproj default convention,
    ``pyproj/_geod.pyx:294-295``)."""

    @arrow_udf("struct<az12:double,az21:double,dist:double>")
    def _inv(a: pa.Array, b: pa.Array, c: pa.Array,
             d: pa.Array) -> pa.Array:
        g = _geod_cache(ellps)
        az12, az21, dist = g.inv(a.to_numpy(zero_copy_only=False),
                                 b.to_numpy(zero_copy_only=False),
                                 c.to_numpy(zero_copy_only=False),
                                 d.to_numpy(zero_copy_only=False))
        return pa.StructArray.from_arrays(
            [pa.array(np.asarray(az12, dtype="float64")),
             pa.array(np.asarray(az21, dtype="float64")),
             pa.array(np.asarray(dist, dtype="float64"))],
            names=["az12", "az21", "dist"])

    return _inv(lon1, lat1, lon2, lat2)


def geod_forward(ellps: str, lon: Column, lat: Column, az: Column,
                 dist: Column) -> Column:
    """struct<lon,lat,backaz> — Karney direct as a pandas UDF."""

    @arrow_udf("struct<lon:double,lat:double,backaz:double>")
    def _fwd(a: pa.Array, b: pa.Array, c: pa.Array,
             d: pa.Array) -> pa.Array:
        g = _geod_cache(ellps)
        lo, la, baz = g.fwd(a.to_numpy(zero_copy_only=False),
                            b.to_numpy(zero_copy_only=False),
                            c.to_numpy(zero_copy_only=False),
                            d.to_numpy(zero_copy_only=False))
        return pa.StructArray.from_arrays(
            [pa.array(np.asarray(lo, dtype="float64")),
             pa.array(np.asarray(la, dtype="float64")),
             pa.array(np.asarray(baz, dtype="float64"))],
            names=["lon", "lat", "backaz"])

    return _fwd(lon, lat, az, dist)


def proj_factors(crs, lon: Column, lat: Column) -> Column:
    """struct<h,k,areal> — Proj.get_factors (T8) as a pandas UDF:
    meridional scale, parallel scale, areal scale per point (reference
    ``pyproj/proj.py:204-278``)."""

    @arrow_udf("struct<h:double,k:double,areal:double>")
    def _fac(lo: pa.Array, la: pa.Array) -> pa.Array:
        from pyproj_spark.proj import Proj
        f = Proj(crs).get_factors(lo.to_numpy(zero_copy_only=False),
                                  la.to_numpy(zero_copy_only=False))
        return pa.StructArray.from_arrays(
            [pa.array(np.asarray(f.meridional_scale, dtype="float64")),
             pa.array(np.asarray(f.parallel_scale, dtype="float64")),
             pa.array(np.asarray(f.areal_scale, dtype="float64"))],
            names=["h", "k", "areal"])

    return _fac(lon, lat)


_GEODS: dict = {}


def _geod_cache(ellps: str):
    g = _GEODS.get(ellps)
    if g is None:
        from pyproj_spark.kernels.geod import Geod
        g = Geod(ellps=ellps)
        _GEODS[ellps] = g
    return g


def reverse_azimuth(az: Column) -> Column:
    """Native Catalyst version of pyproj.Geod reverse_azimuth
    (``pyproj/_geod.pyx:70-85``) — no UDF needed (SURVEY.md §2.2 G10)."""
    return F.when(az > 0, az - 180.0).otherwise(az + 180.0)


def spherical_ring_area_m2(ring: Column,
                           radius: float = 6371008.8) -> Column:
    """Unsigned spherical shoelace area (m²) of a ring column
    (array<struct<lon,lat>>) — pure Catalyst HOFs, no UDF: the discrete
    Green's-theorem sum R²/2·|Σ Δλ·(sin φ₁ + sin φ₂)| over consecutive
    vertices (wrap-around closure). The spherical analogue of the exact
    ellipsoidal kernel in ``kernels/area.py`` (which is golden-tested);
    use this form for cheap in-plan area predicates at scale."""
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 1)

    import math as _math

    def term(i: Column) -> Column:
        p1 = F.element_at(ring, (i + 1).cast("int"))
        p2 = F.element_at(ring, (F.pmod(i + 1, n) + 1).cast("int"))
        # normalize each edge's Δλ to (-π, π]: a ring crossing the
        # antimeridian otherwise picks up a spurious ~2π jump term
        # (the exact kernel in kernels/area.py does the same wrap)
        dl = F.pmod(F.radians(p2["lon"]) - F.radians(p1["lon"])
                    + _math.pi, F.lit(2 * _math.pi)) - _math.pi
        return dl * (F.sin(F.radians(p1["lat"]))
                     + F.sin(F.radians(p2["lat"])))

    s = F.aggregate(F.transform(idx, term), F.lit(0.0),
                    lambda acc, v: acc + v)
    return F.abs(s) * (radius * radius / 2.0)


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column,
                radius: float = 6371008.8) -> Column:
    """Great-circle distance in metres — pure Catalyst (codegen-friendly).
    Used as the cheap pre-rank in kNN before the exact Karney re-rank."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = rl2 - rl1
    dlon = F.radians(lon2) - F.radians(lon1)
    h = (F.pow(F.sin(dlat / 2), 2)
         + F.cos(rl1) * F.cos(rl2) * F.pow(F.sin(dlon / 2), 2))
    return 2.0 * F.lit(radius) * F.asin(F.sqrt(h))
