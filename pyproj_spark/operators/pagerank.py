"""PageRank — the canonical web-graph analysis (Common Crawl
publishes host-level PageRank over exactly the kind of link graph
this engine ingests). Pregel-style iterations as pure DataFrame ops:

  contribution pass: ranks ⋈ edges on src (shuffle on src), partial-
  aggregated sum per dst; rank update r' = (1-d)/N + d·(in + dangling
  share). Dangling mass is one scalar aggregate per iteration —
  ignoring it (the common shortcut) makes ranks leak out of the
  simplex and is measurable on any real crawl where a large fraction
  of pages have no outlinks.

Determinism contract (same as operators/kmeans.py): ranks are ROUNDED
after every iteration, so distributed float-sum order cannot leak
into the next pass and a SQL oracle can replay the unrolled
iterations bit-for-bit. The iteration count is fixed by the caller —
convergence-based stopping belongs to the driver loop, exactly like
kmeans_fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             round_to: int = 9) -> DataFrame:
    """(node, rank) after ``iters`` iterations over the directed edge
    list. Nodes = union of srcs and dsts; parallel edges count once
    (dedup), uniform init 1/N."""
    e = edges.select(src, dst).distinct().cache()
    nodes = (e.select(F.col(src).alias("node"))
             .unionByName(e.select(F.col(dst).alias("node")))
             .distinct().cache())
    n = nodes.count()
    outdeg = e.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    src_nodes = outdeg.select(F.col(src).alias("node"))
    ranks = nodes.select("node",
                         F.lit(round(1.0 / n, round_to)).alias("rank"))
    for _ in range(iters):
        w = (ranks.withColumnRenamed("node", src).join(outdeg, src)
             .select(src, (F.col("rank") / F.col("deg")).alias("w")))
        contrib = e.join(w, src).select(F.col(dst).alias("node"),
                                        F.col("w").alias("c"))
        in_sum = contrib.groupBy("node").agg(F.sum("c").alias("in_c"))
        # dangling nodes (no outlinks) spread their rank uniformly
        dang = (ranks.join(src_nodes, "node", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0])
        # rounded so distributed sum order can't perturb the scalar
        # that feeds every node's next rank (mirrored in the oracle)
        dang = round(dang, 12)
        base = (1.0 - damping) / n + damping * dang / n
        ranks = (nodes.join(in_sum, "node", "left")
                 .select("node",
                         F.round(F.lit(base) + F.lit(damping)
                                 * F.coalesce("in_c", F.lit(0.0)),
                                 round_to).alias("rank"))
                 # truncate lineage: each iteration's dangling .first()
                 # would otherwise recompute ALL previous iterations
                 # (exponential replan growth — same fix as the CC loop)
                 .localCheckpoint(eager=False))
    return ranks


def hits(edges: DataFrame, iters: int = 2, src: str = "src",
         dst: str = "dst", round_to: int = 9) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, "Authoritative sources in a
    hyperlinked environment", JACM 1999 — public): the OTHER classic
    web-graph score, mutually reinforcing — a page is a good authority
    if good hubs link to it, a good hub if it links to good
    authorities. Complements PageRank on the same host graph (HITS
    separates directories/link pages from destination pages, which
    PageRank's single score conflates).

    Determinism is STRICTER than the pagerank loop: each propagation
    sums CAST(round(score * 1e12) AS BIGINT) contributions — exact
    longs, associative, so distributed aggregation order cannot leak —
    and L1 normalization divides the two exact longs (score_sum /
    norm_sum as one double division) before the per-iteration
    rounding. Returns (node, hub, auth)."""
    e = edges.select(src, dst).distinct().cache()
    nodes = (e.select(F.col(src).alias("node"))
             .unionByName(e.select(F.col(dst).alias("node")))
             .distinct().cache())
    h = nodes.select("node", F.lit(1.0).alias("hub"))
    a = None

    def propagate(scores, score_col, key_in, key_out, out_col):
        cm = (e.join(scores.withColumnRenamed("node", key_in), key_in)
              .select(F.col(key_out).alias("node"),
                      F.round(F.col(score_col) * 1e12).cast("long")
                      .alias("cm"))
              .groupBy("node").agg(F.sum("cm").alias("sm")))
        norm = cm.agg(F.sum("sm")).first()[0]
        return (nodes.join(cm, "node", "left")
                .select("node",
                        F.round(F.coalesce(F.col("sm"), F.lit(0))
                                .cast("double") / F.lit(float(norm)),
                                round_to).alias(out_col))
                .localCheckpoint(eager=False))

    for _ in range(iters):
        a = propagate(h, "hub", src, dst, "auth")
        h = propagate(a, "auth", dst, src, "hub")
    return h.join(a, "node").select("node", "hub", "auth")
