"""PageRank (operators/pagerank.py)."""

import pytest

from pyproj_spark.operators.pagerank import pagerank


def test_two_node_cycle(spark):
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, iters=5).collect()}
    # symmetric cycle: exact stationary distribution from any start
    assert got[1] == pytest.approx(0.5, abs=1e-9)
    assert got[2] == pytest.approx(0.5, abs=1e-9)


def test_mass_conserved_with_dangling(spark):
    # node 3 has no outlinks: without the dangling term, total mass
    # decays by ~d*rank(3) per iteration
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3)],
                              "src long, dst long")
    ranks = pagerank(e, iters=4).collect()
    assert sum(r.rank for r in ranks) == pytest.approx(1.0, abs=1e-6)
    got = {r.node: r.rank for r in ranks}
    # 3 receives from both 1 and 2: highest rank
    assert got[3] > got[2] > 0
    assert got[3] > got[1]


def test_parallel_edges_deduped(spark):
    e1 = spark.createDataFrame([(1, 2), (1, 2), (2, 1)],
                               "src long, dst long")
    e2 = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    r1 = {r.node: r.rank for r in pagerank(e1, iters=3).collect()}
    r2 = {r.node: r.rank for r in pagerank(e2, iters=3).collect()}
    assert r1 == r2
