"""Spatial hot-spot statistics over tile/cell lattices — pure Catalyst.

Getis-Ord Gi* (Getis & Ord 1992, "The Analysis of Spatial Association
by Use of Distance Statistics") and global Moran's I over the OCCUPIED
tile set with queen contiguity (the 8-neighbor ring; Gi* additionally
includes self — the starred variant). These are the standard "where are
the hot tiles" statistics a tiling engine is asked for right after the
per-tile rollup (reference scope: the graft's raster<->vector tiling
surface; pyproj itself stops at coordinates, so this is engine-new).

Determinism contract (the repo-wide oracle convention): every
aggregation is an exact integer sum (tile counts are longs; Moran's
cross-products are scaled integers), so the float z-scores are computed
from EXACTLY the same integers on both engines with identical
expression trees — bit-identical doubles, no output rounding needed.

Scale: the tile table is bounded by 4^z rows regardless of corpus size
(z is fixed by the analysis), so the neighbor probe broadcasts the tile
table — the points->tiles rollup is the only corpus-sized stage and it
is a single partial+final hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: queen contiguity: 8 neighbors; Gi* adds self (0,0)
_QUEEN = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
_QUEEN_NOSELF = [d for d in _QUEEN if d != (0, 0)]


def _neighbor_sums(tiles: DataFrame, deltas: list[tuple[int, int]]
                   ) -> DataFrame:
    """(tx, ty, n, gsum, wsum): sum/count of occupied-neighbor values.

    The probe explodes each tile into its |deltas| neighbor slots and
    equi-joins back against the (broadcast) tile table — never a
    range/theta join.
    """
    d = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx, dy in deltas])
    probes = (tiles
              .select("tx", "ty", "n", F.explode(d).alias("d"))
              .select("tx", "ty", "n",
                      (F.col("tx") + F.col("d.dx")).alias("ntx"),
                      (F.col("ty") + F.col("d.dy")).alias("nty")))
    nbr = F.broadcast(tiles.select(F.col("tx").alias("ntx"),
                                   F.col("ty").alias("nty"),
                                   F.col("n").alias("nn")))
    return (probes.join(nbr, ["ntx", "nty"])
            .groupBy("tx", "ty", "n")
            .agg(F.sum("nn").alias("gsum"),
                 F.count(F.lit(1)).alias("wsum")))


def getis_ord_gi(tiles: DataFrame, x: str = "tx", y: str = "ty",
                 value: str = "cnt") -> DataFrame:
    """Per-tile Gi* z-score over the occupied-tile lattice.

    Input: one row per occupied tile with an integer value column.
    Output columns: tx, ty, n, gsum, wsum, gi_z (double; NULL when the
    variance or neighborhood term degenerates), hot (1 / -1 / 0 at the
    two-sided 1% level, |z| > 2.5758).
    """
    t = tiles.select(F.col(x).alias("tx"), F.col(y).alias("ty"),
                     F.col(value).cast("long").alias("n"))
    glob = t.agg(F.count(F.lit(1)).alias("nt"),
                 F.sum("n").alias("s1"),
                 F.sum(F.col("n") * F.col("n")).alias("s2"))
    nb = _neighbor_sums(t, _QUEEN)  # queen + self: the starred statistic
    out = nb.crossJoin(F.broadcast(glob))
    ntd = F.col("nt").cast("double")
    mean = F.col("s1").cast("double") / ntd
    var_ = F.col("s2").cast("double") / ntd - mean * mean
    wd = F.col("wsum").cast("double")
    u = (ntd * wd - wd * wd) / (ntd - F.lit(1.0))
    den = F.sqrt(var_) * F.sqrt(u)
    num = F.col("gsum").cast("double") - mean * wd
    z = F.when(den > 0, num / den)
    hot = (F.when(z > 2.575829303549, 1).when(z < -2.575829303549, -1)
           .otherwise(0))
    return out.select("tx", "ty", "n", "gsum", "wsum", z.alias("gi_z"),
                      hot.alias("hot"))


def morans_i(tiles: DataFrame, x: str = "tx", y: str = "ty",
             value: str = "cnt") -> DataFrame:
    """Global Moran's I over the occupied-tile lattice (binary queen
    weights, no self), with the analytic z-score under the
    normality-assumption null (Cliff & Ord 1981 moments).

    Exactness: with v_i = N*x_i - S1 (integers), the cross-product term
    SUM_ij w_ij v_i v_j and the self term SUM v_i^2 are EXACT integer
    sums (deviation scaling by N clears the rational mean), so
    I = N/S0 * SUM_w(v_i v_j) / SUM(v_i^2) divides two exact integers
    once — aggregation-order-independent on both engines. The integer
    products stay within int64 for N*max(x) < ~3e9 (tile counts at any
    fixed zoom satisfy this by orders of magnitude at 100 TB: N <= 4^z).

    Returns ONE row: n_tiles, s0 (edge count), i_obs, e_i, z_i.
    """
    t = tiles.select(F.col(x).alias("tx"), F.col(y).alias("ty"),
                     F.col(value).cast("long").alias("n"))
    glob = t.agg(F.count(F.lit(1)).alias("nt"), F.sum("n").alias("s1"))
    tv = (t.crossJoin(F.broadcast(glob))
          .select("tx", "ty", "nt",
                  (F.col("nt") * F.col("n") - F.col("s1")).alias("v")))
    d = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx, dy in _QUEEN_NOSELF])
    probes = (tv.select("tx", "ty", "v", F.explode(d).alias("d"))
              .select("tx", "ty", "v",
                      (F.col("tx") + F.col("d.dx")).alias("ntx"),
                      (F.col("ty") + F.col("d.dy")).alias("nty")))
    nbr = F.broadcast(tv.select(F.col("tx").alias("ntx"),
                                F.col("ty").alias("nty"),
                                F.col("v").alias("nv")))
    joined = probes.join(nbr, ["ntx", "nty"])  # one row per directed edge
    pair = joined.agg(F.sum(F.col("v") * F.col("nv")).alias("num"),
                      F.count(F.lit(1)).alias("s0"))
    self_ = tv.agg(F.sum(F.col("v") * F.col("v")).alias("den"),
                   F.first("nt").alias("nt"))
    out = pair.crossJoin(F.broadcast(self_))
    ntd = F.col("nt").cast("double")
    i_obs = (ntd / F.col("s0").cast("double")
             * F.col("num").cast("double") / F.col("den").cast("double"))
    e_i = F.lit(-1.0) / (ntd - F.lit(1.0))
    # normality-null variance: (N^2*S1w - N*S2w + 3*S0^2) /
    # (S0^2*(N^2-1)) - E[I]^2, with binary symmetric queen weights:
    # S1w = 2*S0, S2w = sum_i (2*deg_i)^2 = 4*sum deg_i^2 (deg over
    # OCCUPIED neighbors only, i.e. counted after the join)
    deg = (joined.groupBy("tx", "ty").agg(F.count(F.lit(1)).alias("deg"))
           .agg(F.sum(F.col("deg") * F.col("deg")).alias("sumdeg2")))
    out = out.crossJoin(F.broadcast(deg))
    s0d = F.col("s0").cast("double")
    s1w = F.lit(2.0) * s0d
    s2w = F.lit(4.0) * F.col("sumdeg2").cast("double")
    var_i = ((ntd * ntd * s1w - ntd * s2w + F.lit(3.0) * s0d * s0d)
             / (s0d * s0d * (ntd * ntd - F.lit(1.0))) - e_i * e_i)
    z_i = F.when(var_i > 0, (i_obs - e_i) / F.sqrt(var_i))
    return out.select(F.col("nt").alias("n_tiles"), "s0",
                      i_obs.alias("i_obs"), e_i.alias("e_i"),
                      z_i.alias("z_i"))


def gearys_c(tiles: DataFrame, x: str = "tx", y: str = "ty",
             value: str = "cnt") -> DataFrame:
    """Global Geary's C over the occupied-tile lattice (binary queen
    weights, no self) with the analytic z-score under the
    normality-assumption null (Cliff & Ord 1981) — the local-contrast
    complement to Moran's I: C ~ 1 no autocorrelation, C < 1 positive
    (neighbors alike), C > 1 negative.

    Exactness (same deviation trick as morans_i): with
    v_i = N*x_i - S1, (x_i - x_j)^2 = (v_i - v_j)^2 / N^2 and
    SUM(x_i - xbar)^2 = SUM v_i^2 / N^2, so
    C = (N-1) * SUM_w (v_i - v_j)^2 / (2*S0*SUM v_i^2) divides exact
    integer sums once. The numerator is all-positive (no cancellation),
    so the int64 bound is S0 * max(v_i - v_j)^2 < 2^63 — at any fixed
    zoom N <= 4^z and neighbor deltas are local counts, comfortably
    inside; rescale the value column (e.g. per-mille) if a pathological
    lattice approaches it.

    Returns ONE row: n_tiles, s0, c_obs, e_c (=1), z_c
    (z_c = (c_obs - 1)/sd; negative z = significant clustering).
    """
    t = tiles.select(F.col(x).alias("tx"), F.col(y).alias("ty"),
                     F.col(value).cast("long").alias("n"))
    glob = t.agg(F.count(F.lit(1)).alias("nt"), F.sum("n").alias("s1"))
    tv = (t.crossJoin(F.broadcast(glob))
          .select("tx", "ty", "nt",
                  (F.col("nt") * F.col("n") - F.col("s1")).alias("v")))
    d = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx, dy in _QUEEN_NOSELF])
    probes = (tv.select("tx", "ty", "v", F.explode(d).alias("d"))
              .select("tx", "ty", "v",
                      (F.col("tx") + F.col("d.dx")).alias("ntx"),
                      (F.col("ty") + F.col("d.dy")).alias("nty")))
    nbr = F.broadcast(tv.select(F.col("tx").alias("ntx"),
                                F.col("ty").alias("nty"),
                                F.col("v").alias("nv")))
    joined = probes.join(nbr, ["ntx", "nty"])
    dv = F.col("v") - F.col("nv")
    pair = joined.agg(F.sum(dv * dv).alias("num"),
                      F.count(F.lit(1)).alias("s0"))
    self_ = tv.agg(F.sum(F.col("v") * F.col("v")).alias("den"),
                   F.first("nt").alias("nt"))
    deg = (joined.groupBy("tx", "ty").agg(F.count(F.lit(1)).alias("deg"))
           .agg(F.sum(F.col("deg") * F.col("deg")).alias("sumdeg2")))
    out = pair.crossJoin(F.broadcast(self_)).crossJoin(F.broadcast(deg))
    ntd = F.col("nt").cast("double")
    s0d = F.col("s0").cast("double")
    c_obs = ((ntd - F.lit(1.0)) * F.col("num").cast("double")
             / (F.lit(2.0) * s0d * F.col("den").cast("double")))
    # normality-null variance (Cliff & Ord):
    # Var(C) = ((2*S1w + S2w)*(n-1) - 4*W^2) / (2*(n+1)*W^2),
    # binary symmetric queen weights: S1w = 2*S0, S2w = 4*sum deg^2
    s1w = F.lit(2.0) * s0d
    s2w = F.lit(4.0) * F.col("sumdeg2").cast("double")
    var_c = (((F.lit(2.0) * s1w + s2w) * (ntd - F.lit(1.0))
              - F.lit(4.0) * s0d * s0d)
             / (F.lit(2.0) * (ntd + F.lit(1.0)) * s0d * s0d))
    z_c = F.when(var_c > 0, (c_obs - F.lit(1.0)) / F.sqrt(var_c))
    return out.select(F.col("nt").alias("n_tiles"), "s0",
                      c_obs.alias("c_obs"), F.lit(1.0).alias("e_c"),
                      z_c.alias("z_c"))


def ripley_k(pts: DataFrame, radii: list[float],
             lon_col: str = "lon", lat_col: str = "lat",
             area: float = 360.0 * 170.0) -> DataFrame:
    """Ripley's K-function (Ripley 1977) for a planar point pattern at
    the given radii (lattice-plane degree units, matching the repo's
    deterministic doc-point derivation), plus the variance-stabilized
    L(r) - r statistic (Besag): K(r) = A/(n(n-1)) * #{ordered pairs
    with d <= r}; clustered patterns push L - r above 0.

    Scale shape: pair counting is CELL-BOUNDED, never all-pairs — each
    point probes the 3x3 neighborhood of its r_max-sized cell and
    equi-joins back on the cell key (the hotspot-module convention),
    so cost is n * local density, and the only wide exchange is one
    hash aggregation over the bounded radius list.

    Exactness: coordinates are exact integer MILLI-degrees by
    construction, so the squared pair distance and every per-radius
    count are exact integers; K/L are computed from those integers
    with identical expression trees on both engines.
    """
    rmax = max(radii)
    mlon = F.round(F.col(lon_col) * 1000).cast("long")
    mlat = F.round(F.col(lat_col) * 1000).cast("long")
    cell = int(round(rmax * 1000))
    p = pts.select(F.col("doc_id").alias("pid"),
                   mlon.alias("mx"), mlat.alias("my"),
                   F.floor(mlon / cell).alias("cx"),
                   F.floor(mlat / cell).alias("cy"))
    d = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx, dy in _QUEEN])
    probes = (p.select("pid", "mx", "my", F.explode(d).alias("d"),
                       (F.col("cx") + F.col("d.dx")).alias("ncx"),
                       (F.col("cy") + F.col("d.dy")).alias("ncy"))
              .select("pid", "mx", "my", "ncx", "ncy"))
    other = p.select(F.col("pid").alias("qid"),
                     F.col("mx").alias("qx"), F.col("my").alias("qy"),
                     F.col("cx").alias("ncx"), F.col("cy").alias("ncy"))
    dx = F.col("mx") - F.col("qx")
    dy = F.col("my") - F.col("qy")
    d2 = dx * dx + dy * dy
    pairs = (probes.join(other, ["ncx", "ncy"])
             .filter(F.col("pid") != F.col("qid"))
             .select(d2.alias("d2")))
    rows = pairs.agg(
        *[F.sum(F.when(F.col("d2") <= int(round(r * 1000)) ** 2, 1)
                .otherwise(0)).alias(f"c{i}")
          for i, r in enumerate(radii)])
    npts = p.agg(F.count(F.lit(1)).alias("n_pts"))
    spark = pts.sparkSession
    rlist = spark.createDataFrame(
        [(i, float(r)) for i, r in enumerate(radii)], "i int, r double")
    cnt = None
    for i in range(len(radii)):
        term = F.when(F.col("i") == i, F.col(f"c{i}"))
        cnt = term if cnt is None else F.coalesce(cnt, term)
    nd = F.col("n_pts").cast("double")
    k_hat = F.lit(area) * F.col("npairs").cast("double") \
        / (nd * (nd - F.lit(1.0)))
    import math
    l_stat = F.sqrt(F.col("k_hat") / F.lit(math.pi)) - F.col("r")
    return (rlist.crossJoin(F.broadcast(rows))
            .crossJoin(F.broadcast(npts))
            .withColumn("npairs", cnt)
            .withColumn("k_hat", k_hat)
            .select("r", "npairs", "k_hat",
                    l_stat.alias("l_minus_r"))
            .orderBy("r"))


def spherical_centroids(df, group_col: str, lon_col: str = "lon",
                        lat_col: str = "lat"):
    """Per-group mean position ON THE SPHERE: points map to unit
    3-vectors, components sum, and the mean vector converts back to
    (lon, lat) via atan2 — the antimeridian-correct average that naive
    lon/lat means get wrong (two points at +179/-179 average to 180,
    not 0). Also returns the mean resultant length R_bar in [0, 1]
    (Fisher dispersion: 1 = all points coincide, 0 = spread evenly).

    Determinism contract: each trig component rounds to exact integer
    NANO units per row BEFORE the distributed sum (order-independent
    long adds); the only floats after the shuffle are the closing
    atan2/sqrt on identical exact integers — bit-identical
    cross-engine. One hash aggregation; partial aggregation map-side."""
    rlon = F.radians(F.col(lon_col))
    rlat = F.radians(F.col(lat_col))
    nano = F.lit(1_000_000_000.0)

    def q(c):
        return F.round(c * nano).cast("long")

    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q(F.cos(rlat) * F.cos(rlon))).alias("sx"),
        F.sum(q(F.cos(rlat) * F.sin(rlon))).alias("sy"),
        F.sum(q(F.sin(rlat))).alias("sz"))
    x = F.col("sx").cast("double")
    y = F.col("sy").cast("double")
    z = F.col("sz").cast("double")
    norm = F.sqrt(x * x + y * y + z * z)
    return agg.select(
        group_col, "n",
        F.degrees(F.atan2(y, x)).alias("lon_c"),
        F.degrees(F.atan2(z, F.sqrt(x * x + y * y))).alias("lat_c"),
        (norm / (F.col("n").cast("double") * F.lit(1e9)))
        .alias("r_bar"))
