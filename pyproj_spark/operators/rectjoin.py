"""PBSM rectangle-intersection spatial join.

The classic partition-based spatial-merge join (Patel & DeWitt 1996)
re-expressed as DataFrame ops: each rectangle explodes into the fixed
grid cells its bbox covers, the two sides hash-equi-join on the cell
key, a cheap exact bbox test filters survivors, and the duplicate
reports a pair produces in every shared cell collapse WITHOUT a
distinct shuffle through the *responsibility-cell* rule — a pair is
emitted only from the one cell that contains the intersection's
min corner. (The reference engine exposes no spatial join; this is
graft surface mandated alongside the pip/knn family, same shape as
operators/pip.py's cell prefilter.)

Scale shape: the explode factor is ceil(w/cell)*ceil(h/cell) per
rectangle (bounded by choosing the cell size near the median rect
size), the only shuffle is the equi-join on (cx, cy), and the dedup
is a per-row predicate — no post-join distinct, no skew beyond cell
density. All coordinates here are integer pixel units so the
responsibility predicate is exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cover(df: DataFrame, cell: int, prefix: str) -> DataFrame:
    """Explode a rect table (id, x_lo, x_hi, y_lo, y_hi — inclusive
    integer pixel bounds) into one row per covered grid cell."""
    cx = F.explode(F.sequence(F.floor(F.col("x_lo") / cell),
                              F.floor(F.col("x_hi") / cell))).alias("cx")
    out = df.select(*[F.col(c).alias(prefix + c) for c in df.columns], cx)
    cy = F.explode(F.sequence(F.floor(F.col(prefix + "y_lo") / cell),
                              F.floor(F.col(prefix + "y_hi") / cell)))
    return out.withColumn("cy", cy)


def rect_join(a: DataFrame, b: DataFrame, cell: int = 32) -> DataFrame:
    """All intersecting (a, b) rectangle pairs, each exactly once.

    Inputs both carry (id, x_lo, x_hi, y_lo, y_hi) with INCLUSIVE
    integer bounds; touching rectangles (shared edge pixel) intersect.
    Output adds the exact intersection pixel area ``ix_area``.
    """
    ca = _cover(a, cell, "a_")
    cb = _cover(b, cell, "b_")
    j = ca.join(cb, ["cx", "cy"])
    ix_lo = F.greatest("a_x_lo", "b_x_lo")
    iy_lo = F.greatest("a_y_lo", "b_y_lo")
    ix_hi = F.least("a_x_hi", "b_x_hi")
    iy_hi = F.least("a_y_hi", "b_y_hi")
    keep = ((ix_lo <= ix_hi) & (iy_lo <= iy_hi)
            # responsibility cell: only the cell holding the
            # intersection's min corner reports the pair
            & (F.col("cx") == F.floor(ix_lo / cell))
            & (F.col("cy") == F.floor(iy_lo / cell)))
    return (j.filter(keep)
            .select("a_id", "b_id",
                    ((ix_hi - ix_lo + 1) * (iy_hi - iy_lo + 1))
                    .cast("long").alias("ix_area")))
