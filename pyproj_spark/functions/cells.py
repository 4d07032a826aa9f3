"""geocell — a deterministic S2-style hierarchical cell index, from scratch.

The graft's join/partition key (SURVEY.md §2.6). We use a quadtree over
the equirectangular plane rather than H3 hexagons or S2 cube faces: it
covers the full lat range (web-mercator quadkeys clip at ±85°), neighbor
arithmetic is two integer adds, and — crucially for a 10^12-row table —
encode/decode/k-ring are all **pure Catalyst bit-math**, so cell
assignment never leaves WholeStageCodegen and never crosses the Python
boundary.

Layout of the 64-bit cell id (non-negative; fits Spark LongType)::

    bits 58..62  resolution r   (0..28)
    bits 29..57  x  = lon index in [0, 2^(r+1))   (cell width 180/2^r deg)
    bits  0..28  y  = lat index in [0, 2^r)

At res r the grid is 2^(r+1) x 2^r square-degree cells; r=9 ≈ 0.35° ≈
39 km at the equator (city-scale, the default for web-data joins).
Parent(cell) = (r-1, x>>1, y>>1) — strict hierarchy, so coarse-res
pruning works like H3's ``h3_to_parent``.

Both a numpy implementation (used by tests / brute-force oracles and by
driver-side zone covering) and Column builders are provided; they are
bit-identical by construction and tested as such.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

RES_BITS = 5
XY_BITS = 29
MAX_RES = 28
DEFAULT_RES = 9


def cell_size_deg(res: int) -> float:
    return 180.0 / (1 << res)


# ---------------------------------------------------------------- numpy side

def encode_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized cell id. lon is wrapped mod 360; lat clamped to [-90, 90]."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    size = cell_size_deg(res)
    nx = 1 << (res + 1)
    ny = 1 << res
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / size).astype(np.int64) % nx
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / size).astype(np.int64)
    y = np.clip(y, 0, ny - 1)
    return (np.int64(res) << 58) | (x << XY_BITS) | y


def decode_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (res, x, y)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> 58
    x = (cell >> XY_BITS) & ((1 << XY_BITS) - 1)
    y = cell & ((1 << XY_BITS) - 1)
    return res, x, y


def cell_center_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    res, x, y = decode_np(cell)
    size = 180.0 / np.power(2.0, res.astype(np.float64))
    lon = x.astype(np.float64) * size - 180.0 + size / 2.0
    lat = y.astype(np.float64) * size - 90.0 + size / 2.0
    return lon, lat


def parent_np(cell: np.ndarray) -> np.ndarray:
    res, x, y = decode_np(cell)
    return ((res - 1) << 58) | ((x >> 1) << XY_BITS) | (y >> 1)


def k_ring_np(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (incl. self); lon wraps, lat clips."""
    res, x, y = decode_np(np.int64(cell))
    res, x, y = int(res), int(x), int(y)
    nx, ny = 1 << (res + 1), 1 << res
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (x + dx.ravel()) % nx
    ys = y + dy.ravel()
    ok = (ys >= 0) & (ys < ny)
    return (np.int64(res) << 58) | (xs[ok].astype(np.int64) << XY_BITS) | ys[ok].astype(np.int64)


def covering_np(lons: np.ndarray, lats: np.ndarray, res: int, pad: int = 0) -> np.ndarray:
    """Cell covering of a ring's bbox (superset covering — exact test follows).

    Handles antimeridian-crossing rings: if the longitudinal extent taken
    the short way round crosses ±180, cover the two split lon ranges.
    Used driver-side for the small ``zones`` dimension table.
    """
    size = cell_size_deg(res)
    nx, ny = 1 << (res + 1), 1 << res
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    y0 = max(int((lats.min() + 90.0) // size) - pad, 0)
    y1 = min(int((lats.max() + 90.0) // size) + pad, ny - 1)
    # detect antimeridian crossing: consecutive lon jumps > 180
    dl = np.abs(np.diff(lons))
    crosses = bool((dl > 180.0).any())
    if not crosses:
        x0 = int((lons.min() + 180.0) // size) - pad
        x1 = int((lons.max() + 180.0) // size) + pad
        xs = np.arange(x0, x1 + 1, dtype=np.int64) % nx
    else:
        # split: lons >= 0 side up to 180, and lons < 0 side from -180
        east = lons[lons >= 0.0]
        west = lons[lons < 0.0]
        xs_e = np.arange(int((east.min() + 180.0) // size) - pad, nx + pad, dtype=np.int64)
        xs_w = np.arange(0 - pad, int((west.max() + 180.0) // size) + 1 + pad, dtype=np.int64)
        xs = np.unique(np.concatenate([xs_e, xs_w]) % nx)
    xs = np.unique(xs)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return (np.int64(res) << 58) | (gx.ravel() << XY_BITS) | gy.ravel()


# --------------------------------------------------------------- Spark side

def cell_of(lon: Column, lat: Column, res: int) -> Column:
    """Cell id as a native Catalyst expression (stays in codegen)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    size = cell_size_deg(res)
    nx = 1 << (res + 1)
    ny = 1 << res
    x = F.pmod(F.floor((lon + F.lit(180.0)) / F.lit(size)).cast("long"), F.lit(nx))
    y = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(size)).cast("long"), F.lit(0)),
        F.lit(ny - 1),
    )
    return (
        F.shiftleft(F.lit(res).cast("long"), 58)
        .bitwiseOR(F.shiftleft(x, XY_BITS))
        .bitwiseOR(y)
    )


def cell_res(cell: Column) -> Column:
    return F.shiftright(cell, 58)


def cell_x(cell: Column) -> Column:
    return F.shiftright(cell, XY_BITS).bitwiseAND(F.lit((1 << XY_BITS) - 1))


def cell_y(cell: Column) -> Column:
    return cell.bitwiseAND(F.lit((1 << XY_BITS) - 1))


def cell_parent(cell: Column) -> Column:
    return (
        F.shiftleft(cell_res(cell) - 1, 58)
        .bitwiseOR(F.shiftleft(F.shiftright(cell_x(cell), 1), XY_BITS))
        .bitwiseOR(F.shiftright(cell_y(cell), 1))
    )


def k_ring(cell: Column, k: int, res: int) -> Column:
    """array<long> of cells within Chebyshev distance k — native Catalyst.

    ``res`` is passed statically (the engine uses one join resolution per
    query) so nx/ny fold to constants. Uses sequence/transform/flatten/
    filter higher-order functions; no Python boundary.
    """
    nx, ny = 1 << (res + 1), 1 << res
    x, y = cell_x(cell), cell_y(cell)
    rbits = F.shiftleft(F.lit(res).cast("long"), 58)

    def pack(xx: Column, yy: Column) -> Column:
        return rbits.bitwiseOR(F.shiftleft(xx, XY_BITS)).bitwiseOR(yy)

    grid = F.flatten(
        F.transform(
            F.sequence(F.lit(-k), F.lit(k)),
            lambda dx: F.transform(
                F.sequence(F.lit(-k), F.lit(k)),
                lambda dy: F.when(
                    (y + dy >= 0) & (y + dy < ny),
                    pack(F.pmod(x + dx, F.lit(nx)).cast("long"), (y + dy).cast("long")),
                ),
            ),
        )
    )
    return F.filter(grid, lambda c: c.isNotNull())
