"""Iterative frontier graph traversals: multi-source BFS hop distance
and synchronous label propagation.

Web-graph distance-from-seeds is the classic crawl-quality signal
(TrustRank-style: hop distance from a curated seed whitelist bounds
how much spam mass a page can inherit), and label propagation is the
cheap community detector for host-level grouping. Both are bounded
iterative joins:

* BFS expands one frontier per round — the frontier is the ONLY
  distributed state that moves; visited nodes are excluded with a
  broadcast-able left_anti against the (much smaller) distance table,
  and each round's result is lazily checkpointed so lineage stays
  O(1) instead of O(rounds).
* LPA re-labels every node each round from the mode of its
  neighbors' labels (tie -> smallest label), so updates are one
  groupBy + one max_by struct trick per round — deterministic by
  construction, which is what makes it oracle-replayable (plain LPA
  with random tie-breaks cannot be cross-engine-gated).

At 100 TB the frontier pattern holds: each round shuffles only
frontier x out-edges, the anti-join prunes map-side against the
aggregated distance table, and rounds are bounded by the graph
diameter (small-world web graphs: ~6-8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hop_distance(edges: DataFrame, seeds, max_hops: int = 6,
                 src: str = "src", dst: str = "dst") -> DataFrame:
    """Minimum hop count from any seed along directed edges.

    Returns (node, hop) for every node reachable within ``max_hops``
    (seeds themselves at hop 0). BFS gives min-distance by
    construction: a node enters the table the first round it is
    reached and the anti-join keeps later (longer) discoveries out.
    """
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(s), 0) for s in seeds], "node long, hop int")
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(
                   edges.select(F.col(src).alias("node"),
                                F.col(dst).alias("nbr")), "node")
               .select(F.col("nbr").alias("node")).distinct()
               .join(dist, "node", "left_anti")
               .withColumn("hop", F.lit(h)))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return dist


def label_propagation(edges: DataFrame, rounds: int = 3,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Deterministic synchronous LPA over the undirected version of
    ``edges``: every node starts labeled with its own id; each round
    every node takes the most frequent label among its neighbors,
    breaking count ties toward the SMALLEST label. Returns
    (node, label) after ``rounds`` rounds.

    Sync + min-tie-break makes the result a pure function of the edge
    set (no ordering or RNG dependence) — the property the DuckDB
    oracle relies on to replay the identical rounds.
    """
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .filter(F.col("a") != F.col("b"))
           .distinct())
    lab = (und.select(F.col("a").alias("node")).distinct()
           .withColumn("label", F.col("node")))
    for _ in range(rounds):
        cnt = (und.join(lab.withColumnRenamed("node", "b"), "b")
               .groupBy(F.col("a").alias("node"), "label")
               .agg(F.count(F.lit(1)).alias("c")))
        # mode with min-label tie-break, shuffle-free on top of the
        # count agg: one max_by over a (c, -label) ordering struct
        lab = (cnt.groupBy("node")
               .agg(F.max(F.struct(F.col("c"),
                                   (-F.col("label")).alias("nl")))
                    .alias("m"))
               .select("node", (-F.col("m.nl")).alias("label")))
        lab = lab.localCheckpoint(eager=False)
    return lab


def shortest_paths(edges: DataFrame, seeds, rounds: int = 6,
                   src: str = "src", dst: str = "dst",
                   weight: str = "w") -> DataFrame:
    """Bellman-Ford style single/multi-source shortest paths over
    integer-weighted directed edges: ``rounds`` synchronous relaxation
    passes, each one join + one min-agg. After k rounds the distances
    are exact for every node whose shortest path uses <= k edges —
    the bounded-hop contract that makes the loop SQL-replayable and
    keeps the 100-TB cost at k scans of the edge set (no
    data-dependent convergence check in the hot path). Integer
    weights keep every distance an exact long."""
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(s), 0) for s in seeds], "node long, d long")
    e = edges.select(F.col(src).alias("node"),
                     F.col(dst).alias("nbr"),
                     F.col(weight).alias("w"))
    for _ in range(rounds):
        relax = (dist.join(e, "node")
                 .select(F.col("nbr").alias("node"),
                         (F.col("d") + F.col("w")).alias("d")))
        dist = (dist.union(relax)
                .groupBy("node").agg(F.min("d").alias("d"))
                .localCheckpoint(eager=False))
    return dist
