"""Hilbert-curve locality keys — the stronger-locality complement to
the Morton keys in zorder.py (same write-path role: cluster a 10^12-row
table so written files cover compact spatial patches and min/max stats
prune reads).

Morton is five shift-mask steps but jumps across the plane at power-of-
two boundaries; the Hilbert curve visits grid cells in a path whose
EVERY step is a unit move, so range buckets have strictly tighter
bounding boxes (the property test locks unit adjacency, and the gated
query's per-bucket extents are directly comparable with zorder's).

The per-bit rotation state makes Hilbert look iterative, but the
classic xy2d loop is a 4-state automaton over 2-bit quadrant digits.
Both 4x4 tables (output digit, next state) are DERIVED at import time
from the loop's own reflect-and-swap rule (no hand-copied magic
tables) and packed into one 32-bit constant each, so every engine —
numpy, Catalyst columns, DuckDB SQL — evaluates the identical
``(CONST >> 2*(state*4 + quadrant)) & 3`` arithmetic. The Column form
threads the state through one withColumn per bit level (linear plan;
a single nested expression would double per level), all inside
WholeStageCodegen.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_BITS = 15  # 2*15 key bits; state threading caps useful depth


def _derive_tables() -> tuple[list[int], list[int]]:
    """Enumerate the automaton of the standard xy2d loop.

    A state is the coordinate transform accumulated so far, acting on a
    quadrant bit pair — represented extensionally as a 4-tuple: entry
    q = (xb << 1) | yb holds the transformed pair. Per step the loop
    computes (rx, ry) from the TRANSFORMED bits, emits digit
    (3*rx) ^ ry, and post-composes: ry=0, rx=0 -> swap axes;
    ry=0, rx=1 -> invert both then swap; ry=1 -> identity.
    """
    ident = (0b00, 0b01, 0b10, 0b11)
    swap = tuple(((q & 1) << 1) | (q >> 1) for q in range(4))
    invswap = tuple(((q & 1 ^ 1) << 1) | ((q >> 1) ^ 1) for q in range(4))

    def compose(t2, t1):  # apply t1 then t2
        return tuple(t2[t1[q]] for q in range(4))

    states = [ident]
    digit_t: list[int] = []
    next_t: list[int] = []
    i = 0
    while i < len(states):
        t = states[i]
        for q in range(4):
            tq = t[q]
            rx, ry = tq >> 1, tq & 1
            digit_t.append((3 * rx) ^ ry)
            step = (invswap if rx else swap) if ry == 0 else ident
            nxt = compose(step, t)
            if nxt not in states:
                states.append(nxt)
            next_t.append(states.index(nxt))
        i += 1
    assert len(states) == 4, states
    return digit_t, next_t


_DIGIT_T, _NEXT_T = _derive_tables()
#: both 16-entry 2-bit tables packed LSB-first into one constant
DIGITS = sum(d << (2 * i) for i, d in enumerate(_DIGIT_T))
STATES = sum(s << (2 * i) for i, s in enumerate(_NEXT_T))


def _grid(lon, lat, bits):
    n = 1 << bits
    x = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n)
    y = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * n)
    return (np.clip(x, 0, n - 1).astype(np.int64),
            np.clip(y, 0, n - 1).astype(np.int64))


def hilbert_d_np(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert distance of integer grid cells, MSB-first automaton."""
    st = np.zeros_like(x)
    d = np.zeros_like(x)
    for lvl in range(bits - 1, -1, -1):
        q = (((x >> lvl) & 1) << 1) | ((y >> lvl) & 1)
        idx = 2 * ((st << 2) | q)
        d = (d << 2) | ((DIGITS >> idx) & 3)
        st = (STATES >> idx) & 3
    return d


def hilbert_np(lon, lat, bits: int = 10) -> np.ndarray:
    """Hilbert key of the (lon, lat) grid cell at 2^bits per axis."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")
    x, y = _grid(lon, lat, bits)
    return hilbert_d_np(x, y, bits)


def with_hilbert(df: DataFrame, lon: Column, lat: Column,
                 bits: int = 10, out: str = "hkey") -> DataFrame:
    """Append a pure-Catalyst Hilbert key column (bit-identical to
    hilbert_np). DataFrame-level because the automaton state must be
    THREADED — one named intermediate per bit level keeps the plan
    linear where a single nested expression would double in size per
    level (state feeds both the digit and the next state)."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")
    n = 1 << bits
    xg = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                                    * F.lit(float(n))).cast("long"),
                            F.lit(0)), F.lit(n - 1))
    yg = F.least(F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                                    * F.lit(float(n))).cast("long"),
                            F.lit(0)), F.lit(n - 1))
    xc, yc, sc, dc = f"_hx_{out}", f"_hy_{out}", f"_hs_{out}", out
    df = (df.withColumn(xc, xg).withColumn(yc, yg)
          .withColumn(sc, F.lit(0).cast("long"))
          .withColumn(dc, F.lit(0).cast("long")))
    for lvl in range(bits - 1, -1, -1):
        q = (F.shiftrightunsigned(F.col(xc), lvl).bitwiseAND(F.lit(1)) * 2
             + F.shiftrightunsigned(F.col(yc), lvl).bitwiseAND(F.lit(1)))
        idx = (F.shiftleft(F.col(sc), 2).bitwiseOR(q)) * 2
        ic = f"_hi_{out}"
        # variable-distance shifts need F.expr: the python wrapper of
        # shiftrightunsigned only accepts a literal int distance
        df = df.withColumn(ic, idx.cast("int")).withColumn(
            dc, F.shiftleft(F.col(dc), 2).bitwiseOR(
                F.expr(f"shiftrightunsigned({DIGITS}L, {ic}) & 3"))
        ).withColumn(
            sc, F.expr(f"shiftrightunsigned({STATES}L, {ic}) & 3"))
    return df.drop(xc, yc, sc, f"_hi_{out}")


def hilbert_sql(bits: int = 10, lon_expr: str = "lon",
                lat_expr: str = "lat", doc_cols: str = "doc_id") -> str:
    """The identical arithmetic as a chain of DuckDB CTE levels.
    Returns a CTE body ``hil`` exposing (doc_cols..., hkey); embed as
    ``WITH pts AS (...), {hilbert_sql(...)} SELECT ... FROM hil``."""
    n = 1 << bits
    x = (f"least(greatest(CAST(floor(({lon_expr} + 180.0) / 360.0 "
         f"* {n}) AS BIGINT), 0), {n - 1})")
    y = (f"least(greatest(CAST(floor(({lat_expr} + 90.0) / 180.0 "
         f"* {n}) AS BIGINT), 0), {n - 1})")
    parts = [f"h{bits} AS (SELECT {doc_cols}, {x} AS hx, {y} AS hy, "
             f"CAST(0 AS BIGINT) AS st, CAST(0 AS BIGINT) AS d "
             "FROM pts)"]
    prev = f"h{bits}"
    for lvl in range(bits - 1, -1, -1):
        q = f"((((hx >> {lvl}) & 1) << 1) | ((hy >> {lvl}) & 1))"
        idx = f"(2 * ((st << 2) | {q}))"
        parts.append(
            f"h{lvl} AS (SELECT {doc_cols}, hx, hy, "
            f"({STATES} >> {idx}) & 3 AS st, "
            f"(d << 2) | (({DIGITS} >> {idx}) & 3) AS d FROM {prev})")
        prev = f"h{lvl}"
    parts.append(f"hil AS (SELECT {doc_cols}, d AS hkey FROM {prev})")
    return ",\n".join(parts)
