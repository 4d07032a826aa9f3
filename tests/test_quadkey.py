"""Quadkey encode/decode invariants (Bing tile system)."""

from pyspark.sql import functions as F


def test_quadkey_roundtrip_and_known_vectors(spark):
    from pyproj_spark.functions.tiles import quadkey, quadkey_decode
    rows = [(tx, ty) for tx in (0, 1, 35, 127, 255)
            for ty in (0, 2, 77, 200, 255)]
    df = spark.createDataFrame(rows, "tx long, ty long")
    enc = df.select("tx", "ty", quadkey(F.col("tx"), F.col("ty"), 8)
                    .alias("qk"))
    dx, dy = quadkey_decode(F.col("qk"), 8)
    out = enc.select("tx", "ty", "qk", dx.alias("rx"), dy.alias("ry"))
    for r in out.collect():
        assert (r.rx, r.ry) == (r.tx, r.ty)
        assert len(r.qk) == 8 and set(r.qk) <= set("0123")
    got = dict(((r.tx, r.ty), r.qk) for r in out.collect())
    # Bing documentation example: tile (3, 5) at level 3 -> "213"
    df3 = spark.createDataFrame([(3, 5)], "tx long, ty long")
    assert df3.select(quadkey(F.col("tx"), F.col("ty"), 3)
                      .alias("q")).collect()[0].q == "213"
    assert got[(0, 0)] == "00000000" and got[(255, 255)] == "33333333"


def test_quadkey_parent_is_prefix(spark):
    from pyproj_spark.functions.tiles import quadkey
    df = spark.createDataFrame([(100, 200)], "tx long, ty long")
    q8 = df.select(quadkey(F.col("tx"), F.col("ty"), 8).alias("q")
                   ).collect()[0].q
    # parent at z=6: floor-divide coords by 4, key is the 6-char prefix
    dfp = spark.createDataFrame([(25, 50)], "tx long, ty long")
    q6 = dfp.select(quadkey(F.col("tx"), F.col("ty"), 6).alias("q")
                    ).collect()[0].q
    assert q8.startswith(q6)
