"""Spatiotemporal co-location (contact) detection: which pairs of
users were within radius r during the same time window — the
co-movement / contact-tracing / carpool-detection primitive.

Distributed shape (what must survive 100 TB): the naive formulation
is a corpus x corpus distance join. Here one side EXPLODES into its
3x3 neighbor cells (cell size = r, so any pair within r shares an
expanded/home cell pair exactly once) and the join is a hash
equi-join on (cell_x, cell_y, window) — work is bounded by per-bucket
density, never by corpus size. Hot buckets (stadiums) are the salting
candidates; the per-pair aggregation is keyed by user pairs and
skew-free.

The gate's oracle is covering-BLIND (a raw same-window pair join on
coordinates alone), so hash equality proves the cell decomposition is
both sound and complete. Planar degree distance keeps both engines
trivially bit-identical; the corpus-scale variant swaps in wrapped
cells + haversine (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def colocate(pts: DataFrame, radius_deg: float = 1.0,
             window_s: int = 3600, user_col: str = "user_id",
             ts_col: str = "ts", lon_col: str = "lon",
             lat_col: str = "lat") -> DataFrame:
    """(u1, u2, n_contacts, first_wnd): event pairs of distinct users
    within ``radius_deg`` in the same ``window_s`` tumbling window.
    u1 < u2; n_contacts counts event pairs; first_wnd is the earliest
    shared window."""
    r = float(radius_deg)
    wnd = F.floor(F.unix_timestamp(ts_col) / window_s).alias("wnd")
    base = pts.select(
        F.col(user_col).alias("u"), wnd,
        F.col(lon_col).alias("x"), F.col(lat_col).alias("y"),
        F.floor(F.col(lon_col) / r).cast("long").alias("cx"),
        F.floor(F.col(lat_col) / r).cast("long").alias("cy"))
    nbr = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("d")
    a = (base.select("*", nbr)
         .select(F.col("u").alias("u1"), F.col("wnd"),
                 F.col("x").alias("x1"), F.col("y").alias("y1"),
                 (F.col("cx") + F.col("d.dx")).alias("jx"),
                 (F.col("cy") + F.col("d.dy")).alias("jy")))
    b = base.select(F.col("u").alias("u2"), F.col("wnd"),
                    F.col("x").alias("x2"), F.col("y").alias("y2"),
                    F.col("cx").alias("jx"), F.col("cy").alias("jy"))
    d2 = ((F.col("x1") - F.col("x2")) * (F.col("x1") - F.col("x2"))
          + (F.col("y1") - F.col("y2")) * (F.col("y1") - F.col("y2")))
    # SHUFFLE_HASH with the UN-exploded side as build (guide §3.1):
    # the planner's size estimates don't account for the 9x explode,
    # so it picked a broadcast hash join BUILDING the exploded side —
    # a single-threaded 9n-row hash build on the blocking broadcast
    # path. Per-partition hash join on the cell keys is both faster
    # here (1.57 -> 1.06s) and the only shape that survives
    # corpus-scale inputs, where neither side broadcasts.
    pairs = (a.join(b.hint("shuffle_hash"), ["jx", "jy", "wnd"])
             .filter((F.col("u1") < F.col("u2")) & (d2 < F.lit(r * r))))
    return (pairs.groupBy("u1", "u2")
            .agg(F.count(F.lit(1)).alias("n_contacts"),
                 F.min("wnd").alias("first_wnd")))
