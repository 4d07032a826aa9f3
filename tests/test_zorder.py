"""Z-order keys (functions/zorder.py): interleave correctness,
locality, and the repartitionByRange write-layout path."""

import numpy as np
import pytest

from pyproj_spark.functions import zorder


def _interleave_ref(x: int, y: int) -> int:
    out = 0
    for i in range(21):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_spread_matches_naive_interleave():
    rng = np.random.default_rng(7)
    for _ in range(200):
        x = int(rng.integers(0, 1 << 21))
        y = int(rng.integers(0, 1 << 21))
        got = int(zorder._spread_np(np.int64(x))
                  | (zorder._spread_np(np.int64(y)) << 1))
        assert got == _interleave_ref(x, y)


def test_corner_values():
    bits = 10
    n = 1 << bits
    assert zorder.zorder_np([-180.0], [-90.0], bits)[0] == 0
    top = zorder.zorder_np([179.999], [89.999], bits)[0]
    assert top == _interleave_ref(n - 1, n - 1)
    with pytest.raises(ValueError):
        zorder.zorder_np([0.0], [0.0], 22)


def test_locality_beats_row_order():
    """Sorting by Morton key must give spatially tighter consecutive
    chunks than the raw scatter order."""
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 4000)
    lat = rng.uniform(-85, 85, 4000)
    keys = zorder.zorder_np(lon, lat, 12)
    order = np.argsort(keys, kind="stable")

    def mean_span(idx):
        spans = []
        for c in np.array_split(idx, 40):
            spans.append((lon[c].max() - lon[c].min())
                         * (lat[c].max() - lat[c].min()))
        return np.mean(spans)

    assert mean_span(order) < 0.2 * mean_span(np.arange(4000))


def test_repartition_by_range_layout(spark):
    from pyspark.sql import functions as F
    from pyproj_spark.functions.zorder import zorder_of
    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in
         zip(rng.uniform(-180, 180, 2000), rng.uniform(-85, 85, 2000))],
        "lon double, lat double")
    parts = (df.repartitionByRange(8, zorder_of(F.col("lon"),
                                                F.col("lat"), 12))
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid")
             .agg((F.max("lon") - F.min("lon")).alias("lon_span"),
                  (F.max("lat") - F.min("lat")).alias("lat_span"),
                  F.count("*").alias("cnt"))
             .collect())
    assert len(parts) == 8
    # every write partition covers far less than the global extent in
    # at least one axis (Z curves alternate split axes per level)
    area = [p.lon_span * p.lat_span for p in parts]
    assert np.mean(area) < 0.35 * (360.0 * 170.0)
