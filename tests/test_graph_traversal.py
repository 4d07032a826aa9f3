"""BFS hop distance + label propagation (operators/bfs.py)."""

from pyspark.sql import functions as F

from pyproj_spark.operators.bfs import hop_distance, label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long")


def test_bfs_chain_min_hops(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {r["node"]: r["hop"]
           for r in hop_distance(e, seeds=[0], max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 is beyond max_hops


def test_bfs_takes_shortest_of_two_paths(spark):
    # 0 -> 9 directly and 0 -> 1 -> 9: hop(9) must be 1
    e = _edges(spark, [(0, 9), (0, 1), (1, 9), (9, 5)])
    got = {r["node"]: r["hop"]
           for r in hop_distance(e, seeds=[0], max_hops=4).collect()}
    assert got == {0: 0, 9: 1, 1: 1, 5: 2}


def test_bfs_multi_seed_and_unreachable(spark):
    e = _edges(spark, [(0, 1), (7, 8), (50, 60)])  # 50,60 unreachable
    got = {r["node"]: r["hop"]
           for r in hop_distance(e, seeds=[0, 7], max_hops=6).collect()}
    assert got == {0: 0, 7: 0, 1: 1, 8: 1}


def test_bfs_early_stop_on_empty_frontier(spark):
    e = _edges(spark, [(0, 1)])
    # frontier empties at hop 2; max_hops=100 must not loop 100 times
    got = hop_distance(e, seeds=[0], max_hops=100).collect()
    assert {r["node"]: r["hop"] for r in got} == {0: 0, 1: 1}


def test_lpa_two_triangles(spark):
    # two disjoint triangles -> every node adopts its triangle's
    # min label within 3 deterministic rounds
    e = _edges(spark, [(1, 2), (2, 3), (3, 1),
                       (10, 11), (11, 12), (12, 10)])
    got = {r["node"]: r["label"]
           for r in label_propagation(e, rounds=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_lpa_tie_breaks_to_smallest_label(spark):
    # node 5's neighbors {1, 2} tie at count 1 -> label 1 after one
    # round regardless of input ordering
    e = _edges(spark, [(1, 5), (2, 5)])
    lab = label_propagation(e, rounds=1)
    got = {r["node"]: r["label"] for r in lab.collect()}
    assert got[5] == 1


def test_lpa_deterministic_under_repartition(spark):
    pairs = [(i % 13, (i * 7 + 3) % 13) for i in range(60)
             if i % 13 != (i * 7 + 3) % 13]
    a = label_propagation(_edges(spark, pairs), rounds=3)
    b = label_propagation(
        _edges(spark, list(reversed(pairs))).repartition(7), rounds=3)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))


def test_hll_register_merge_equals_direct_grouping(spark):
    """Pyramid soundness: registers merged z8->z6 with max must be
    bit-identical to registers computed directly at the z6 grouping —
    the mergeability property q_hll_pyramid rides on."""
    from pyproj_spark.operators.sketch import hll_registers
    df = spark.range(0, 5000).select(
        (F.col("id") % 64).alias("tx8"),
        ((F.col("id") * 7) % 64).alias("ty8"),
        ((F.col("id") * 2654435761) % 512).cast("string").alias("u"))
    direct = hll_registers(
        df.select((F.shiftright("tx8", 2) * 16
                   + F.shiftright("ty8", 2)).alias("g"), "u"),
        "g", "u")
    regs8 = (df.select((F.col("tx8") * 64 + F.col("ty8")).alias("g8"),
                       "u")
             .transform(lambda d: hll_registers(d, "g8", "u")))
    merged = (regs8
              .select((F.shiftright(F.floor(F.col("g8") / 64), 2) * 16
                       + F.shiftright(F.col("g8") % 64, 2)).alias("g"),
                      "idx", "mx")
              .groupBy("g", "idx").agg(F.max("mx").alias("mx")))
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_bellman_ford_prefers_cheap_long_path(spark):
    from pyproj_spark.operators.bfs import shortest_paths
    # direct 0->3 costs 10; 0->1->2->3 costs 3
    e = spark.createDataFrame(
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)],
        "src long, dst long, w long")
    got = {r["node"]: r["d"]
           for r in shortest_paths(e, seeds=[0], rounds=6).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bellman_ford_bounded_rounds_contract(spark):
    from pyproj_spark.operators.bfs import shortest_paths
    # chain of 5 edges: with rounds=3 only the first 3 hops are final
    e = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(5)], "src long, dst long, w long")
    got = {r["node"]: r["d"]
           for r in shortest_paths(e, seeds=[0], rounds=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # nodes 4,5 not yet reached
