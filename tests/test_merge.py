"""MERGE/upsert CDC apply (operators/merge.py)."""

from pyproj_spark.operators.merge import merge_upsert


def test_merge_paths(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double")
    feed = spark.createDataFrame(
        [(2, "B", 99.0, "upsert"),   # update
         (3, None, 0.0, "delete"),   # delete
         (4, "d", 40.0, "upsert"),   # insert
         (5, None, 0.0, "delete")],  # delete of absent key: no-op
        "k long, s string, v double, _op string")
    got = {r.k: (r.s, r.v)
           for r in merge_upsert(target, feed, ["k"]).collect()}
    assert got == {1: ("a", 10.0),    # passthrough
                   2: ("B", 99.0),    # updated
                   4: ("d", 40.0)}    # inserted; 3 deleted, 5 no-op


def test_composite_key(spark):
    target = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")],
                                   "a long, b long, s string")
    feed = spark.createDataFrame([(1, 2, "Y", "upsert")],
                                 "a long, b long, s string, _op string")
    got = {(r.a, r.b): r.s
           for r in merge_upsert(target, feed, ["a", "b"]).collect()}
    assert got == {(1, 1): "x", (1, 2): "Y"}


def test_scd2_apply(spark):
    from pyproj_spark.operators.merge import scd2_apply
    hist = spark.createDataFrame(
        [(1, "a", 0, None), (2, "b", 0, None),
         (3, "c0", 0, 5), (3, "c1", 5, None)],
        "k long, v string, valid_from long, valid_to long")
    changes = spark.createDataFrame(
        [(1, "A", 10),    # real change: close + open
         (2, "b", 10),    # no-op: same value -> NO new version
         (4, "d", 10)],   # brand-new key
        "k long, v string, ts long")
    out = scd2_apply(hist, changes, ["k"], ["v"]).collect()
    rows = {(r.k, r.v): (r.valid_from, r.valid_to) for r in out}
    assert rows[(1, "a")] == (0, 10)       # closed
    assert rows[(1, "A")] == (10, None)    # opened
    assert rows[(2, "b")] == (0, None)     # untouched (no-op)
    assert rows[(3, "c0")] == (0, 5)       # old history preserved
    assert rows[(3, "c1")] == (5, None)    # unmatched current kept
    assert rows[(4, "d")] == (10, None)    # new key
    assert len(out) == 6
