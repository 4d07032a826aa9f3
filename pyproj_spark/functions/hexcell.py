"""hexcell — an H3-style hexagonal cell index, from scratch, pure
Catalyst (third cell family next to the S2-style quadtree in cells.py
and geohash.py).

Hexagons are what H3 actually buys you over square grids: every
neighbor shares a full edge at the SAME center distance, so k-ring
expansion (kNN, PIP prefilters, skew-spreading) has no diagonal
anisotropy. We build a pointy-top axial-coordinate hex grid on the
web-mercator plane (the same plane the tiling operators use) instead
of H3's icosahedral gnomonic faces: no pentagon exceptions, no face
crossings, and encode stays inside WholeStageCodegen — the projection
is ln/tan, the axial transform is two multiplies, and cube rounding is
three floors plus one CASE. Area distortion follows mercator's sec²φ
like every slippy-tile system; for join/partition keys that is
irrelevant (equality is what matters), and the uniform-neighbor
property survives because the distortion is locally conformal.

Math (public, standard hex-grid geometry):
  axial coords of point (x, y) for circumradius s:
      q = (sqrt(3)/3 * x - 1/3 * y) / s
      r = (2/3 * y) / s
  cube rounding: round q, -q-r, r half-up; repair the axis with the
  largest rounding error so the three still sum to zero.
  resolution r_n halves s each level: s(n) = S0 / 2^n.

Cell id layout (non-negative, Spark LongType):
    bits 58..62  res (0..20)
    bits 29..57  q + 2^28
    bits  0..28  r + 2^28
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

R = 6378137.0
S0 = 1000000.0  # res-0 circumradius, metres on the mercator plane
MAX_RES = 20
OFF = 1 << 28
MAX_LAT = 85.05112877980659
SQ3 = math.sqrt(3.0)


def hex_size(res: int) -> float:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    return S0 / (1 << res)


# --------------------------------------------------------------- numpy

def _rnd_np(v):
    # half-up toward +inf — the ONE rounding convention shared with the
    # Column and SQL builders (np.round would be banker's)
    return np.floor(v + 0.5)


def encode_np(lon, lat, res: int) -> np.ndarray:
    s = hex_size(res)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = R * np.radians(np.asarray(lon, dtype=np.float64))
    y = R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    q = (SQ3 / 3.0 * x - y / 3.0) / s
    r = (2.0 / 3.0 * y) / s
    rx, rz = _rnd_np(q), _rnd_np(r)
    ry = _rnd_np(-q - r)
    dx = np.abs(rx - q)
    dy = np.abs(ry - (-q - r))
    dz = np.abs(rz - r)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    qi = rx.astype(np.int64)
    ri = rz.astype(np.int64)
    return (np.int64(res) << 58) | ((qi + OFF) << 29) | (ri + OFF)


def decode_np(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> 58
    q = ((cell >> 29) & ((1 << 29) - 1)) - OFF
    r = (cell & ((1 << 29) - 1)) - OFF
    return res, q, r


def center_np(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell center back to (lon, lat)."""
    res, q, r = decode_np(cell)
    s = S0 / (1 << res).astype(np.float64)
    x = s * SQ3 * (q + r / 2.0)
    y = s * 1.5 * r
    lon = np.degrees(x / R)
    lat = np.degrees(2 * np.arctan(np.exp(y / R)) - np.pi / 2)
    return lon, lat


def k_ring_np(cell: int, k: int) -> np.ndarray:
    """All cells with hex distance <= k — (3k²+3k+1) cells, every one
    an edge-or-chain neighbor (no square-grid diagonal anisotropy)."""
    res, q, r = decode_np(np.array([cell]))
    res, q, r = int(res[0]), int(q[0]), int(r[0])
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((res << 58) | ((q + dq + OFF) << 29)
                       | (r + dr + OFF))
    return np.array(sorted(out), dtype=np.int64)


def hex_distance_np(cell_a: int, cell_b: int) -> int:
    _, qa, ra = decode_np(np.array([cell_a]))
    _, qb, rb = decode_np(np.array([cell_b]))
    dq = int(qa[0] - qb[0])
    dr = int(ra[0] - rb[0])
    return (abs(dq) + abs(dr) + abs(dq + dr)) // 2


# ------------------------------------------------------------- Columns

def _rnd(c: Column) -> Column:
    return F.floor(c + F.lit(0.5))


def hex_of(lon: Column, lat: Column, res: int) -> Column:
    """Pure-Catalyst hex cell id (bit-identical to encode_np).

    Expression shape (r6): the axial coords q/r are bound ONCE as HOF
    lambda variables instead of being re-inlined as subtrees — the
    cube-rounding repair references q/r ~20 times, and with lon/lat
    themselves derived expressions the flat form ballooned to a
    multi-thousand-node tree that cost ~2 s of driver-side
    optimization PER ACTION on every hexcell query (and re-evaluated
    the ln/tan chain per reference wherever eval fell back to
    interpreted mode). Same arithmetic, same rounding convention —
    only the binding structure changes."""
    s = F.lit(hex_size(res))
    latc = F.least(F.greatest(lat, F.lit(-MAX_LAT)), F.lit(MAX_LAT))
    x = F.lit(R) * F.radians(lon)
    y = F.lit(R) * F.log(F.tan(F.lit(math.pi / 4) + F.radians(latc) / 2))
    q0 = (F.lit(SQ3 / 3.0) * x - y / F.lit(3.0)) / s
    r0 = (F.lit(2.0 / 3.0) * y) / s

    def _cell(p):
        q, r = p["q"], p["r"]
        rx, rz = _rnd(q), _rnd(r)
        ry = _rnd(-q - r)
        dx = F.abs(rx - q)
        dy = F.abs(ry - (-q - r))
        dz = F.abs(rz - r)
        qi = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
        ri = F.when(~((dx > dy) & (dx > dz)) & (dz > dy), -qi - ry) \
            .otherwise(rz)
        return (F.shiftleft(F.lit(res).cast("long"), 58)
                .bitwiseOR(F.shiftleft(qi.cast("long") + F.lit(OFF), 29))
                .bitwiseOR(ri.cast("long") + F.lit(OFF)))

    return F.element_at(
        F.transform(F.array(F.struct(q0.alias("q"), r0.alias("r"))),
                    _cell), 1)


def hex_sql(res: int, lon_expr: str = "lon", lat_expr: str = "lat"
            ) -> str:
    """The SAME arithmetic as DuckDB SQL (oracle builder)."""
    s = repr(hex_size(res))
    lat = (f"least(greatest({lat_expr}, {-MAX_LAT!r}), {MAX_LAT!r})")
    x = f"({R!r} * radians({lon_expr}))"
    y = f"({R!r} * ln(tan(pi()/4 + radians({lat})/2)))"
    q = f"(({SQ3 / 3.0!r} * {x} - {y} / 3.0) / {s})"
    r = f"((2.0 / 3.0 * {y}) / {s})"
    return _hex_sql_body(q, r, res)


def _hex_sql_body(q: str, r: str, res: int) -> str:
    # rx/ry/rz and the repair CASE, fully inlined (no lateral needed)
    rx = f"floor({q} + 0.5)"
    ry = f"floor(-({q}) - ({r}) + 0.5)"
    rz = f"floor({r} + 0.5)"
    dx = f"abs({rx} - ({q}))"
    dy = f"abs({ry} - (-({q}) - ({r})))"
    dz = f"abs({rz} - ({r}))"
    fixx = f"({dx} > {dy} AND {dx} > {dz})"
    qi = f"(CASE WHEN {fixx} THEN -({ry}) - ({rz}) ELSE {rx} END)"
    ri = (f"(CASE WHEN NOT {fixx} AND {dz} > {dy} "
          f"THEN -({qi}) - ({ry}) ELSE {rz} END)")
    return (f"((CAST({res} AS BIGINT) << 58) "
            f"| ((CAST({qi} AS BIGINT) + {OFF}) << 29) "
            f"| (CAST({ri} AS BIGINT) + {OFF}))")


def hex_ring(cell: Column, k: int, res: int) -> Column:
    """array<long> of all cells within hex distance k — native
    Catalyst (sequence/transform/flatten/filter HOFs, no Python).
    Emits exactly 3k²+3k+1 ids; pair with explode + equi-join for
    kNN candidate generation, where the hexagonal ring's uniform
    neighbor distance removes the square grid's diagonal bias."""
    q = ((F.shiftright(cell, 29).bitwiseAND(F.lit((1 << 29) - 1)))
         - F.lit(OFF))
    r = (cell.bitwiseAND(F.lit((1 << 29) - 1))) - F.lit(OFF)
    rbits = F.shiftleft(F.lit(res).cast("long"), 58)

    def pack(qq: Column, rr: Column) -> Column:
        return rbits.bitwiseOR(
            F.shiftleft(qq + F.lit(OFF), 29)).bitwiseOR(rr + F.lit(OFF))

    grid = F.flatten(F.transform(
        F.sequence(F.lit(-k), F.lit(k)),
        lambda dq: F.transform(
            F.sequence(F.lit(-k), F.lit(k)),
            lambda dr: F.when(
                (F.greatest(F.abs(dq), F.abs(dr), F.abs(dq + dr))
                 <= F.lit(k)),
                pack(q + dq.cast("long"), r + dr.cast("long"))))))
    return F.array_sort(F.filter(grid, lambda c: c.isNotNull()))
