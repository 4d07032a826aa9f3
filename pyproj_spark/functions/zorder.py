"""Z-order (Morton) locality keys — data-layout clustering for the
write path, the technique behind Delta/Iceberg ``OPTIMIZE ZORDER``.

Range-partitioning a 10^12-row table by a Morton interleave of
(lon, lat) makes every written file cover a compact spatial patch, so
later bbox/cell queries prune most files from min/max column stats —
the layout complement to the read-side cell indexes (cells.py /
geohash.py / hexcell.py). Hilbert curves have marginally better
locality (no Z-jumps) but need per-bit state; Morton is five
shift-mask steps, stays in WholeStageCodegen, and its jumps are
irrelevant once keys are only used for RANGE partitioning.

Usage at scale::

    df.repartitionByRange(n_files, zorder_of(F.col("lon"),
                                             F.col("lat"), 16)) \\
      .write.parquet(...)

All three implementations (Column, numpy, SQL) share the exact
integer arithmetic, so the oracle gate checks the bit-spreading
magic-constant chain itself.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_BITS = 21  # 2x21 interleaved bits fit a positive int64

#: the standard 64-bit 2-D bit-spreading ladder: after the chain,
#: bit i of the input sits at bit 2i of the output
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _grid(lon, lat, bits):
    n = 1 << bits
    x = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n)
    y = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * n)
    return (np.clip(x, 0, n - 1).astype(np.int64),
            np.clip(y, 0, n - 1).astype(np.int64))


def _spread_np(v):
    v = v & 0x1FFFFF
    for sh, mask in _SPREAD:
        v = (v | (v << sh)) & mask
    return v


def zorder_np(lon, lat, bits: int = 16) -> np.ndarray:
    """Morton key of the (lon, lat) grid cell at 2^bits per axis."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")
    x, y = _grid(lon, lat, bits)
    return _spread_np(x) | (_spread_np(y) << 1)


def _spread_col(v: Column) -> Column:
    v = v.bitwiseAND(F.lit(0x1FFFFF))
    for sh, mask in _SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, sh))).bitwiseAND(F.lit(mask))
    return v


def zorder_of(lon: Column, lat: Column, bits: int = 16) -> Column:
    """Pure-Catalyst Morton key (bit-identical to zorder_np)."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")
    n = 1 << bits
    x = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                                   * F.lit(float(n))).cast("long"),
                           F.lit(0)), F.lit(n - 1))
    y = F.least(F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                                   * F.lit(float(n))).cast("long"),
                           F.lit(0)), F.lit(n - 1))
    return _spread_col(x).bitwiseOR(F.shiftleft(_spread_col(y), 1))


def _spread_sql(v: str) -> str:
    e = f"({v} & 2097151)"
    for sh, mask in _SPREAD:
        e = f"(({e} | ({e} << {sh})) & {mask})"
    return e


def zorder_sql(bits: int = 16, lon_expr: str = "lon",
               lat_expr: str = "lat") -> str:
    """The same arithmetic as a DuckDB SQL expression."""
    n = 1 << bits
    x = (f"least(greatest(CAST(floor(({lon_expr} + 180.0) / 360.0 "
         f"* {n}) AS BIGINT), 0), {n - 1})")
    y = (f"least(greatest(CAST(floor(({lat_expr} + 90.0) / 180.0 "
         f"* {n}) AS BIGINT), 0), {n - 1})")
    return f"({_spread_sql(x)} | ({_spread_sql(y)} << 1))"
