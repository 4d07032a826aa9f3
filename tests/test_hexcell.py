"""Hexagonal cell index (functions/hexcell.py): cube-rounding
correctness (nearest-center property), k-ring geometry, and
Column/numpy bit-identity."""

import math

import numpy as np
import pytest

from pyproj_spark.functions import hexcell

rng = np.random.default_rng(20260817)


def _merc(lon, lat):
    lat = np.clip(lat, -hexcell.MAX_LAT, hexcell.MAX_LAT)
    x = hexcell.R * np.radians(lon)
    y = hexcell.R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def _centers_xy(cells):
    res, q, r = hexcell.decode_np(cells)
    s = hexcell.S0 / (1 << res).astype(np.float64)
    return s * hexcell.SQ3 * (q + r / 2.0), s * 1.5 * r


def test_nearest_center_property():
    """Cube rounding must pick the hexagon whose center is closest in
    the mercator plane — checked against the full 1-ring."""
    lon = rng.uniform(-179, 179, 2000)
    lat = rng.uniform(-80, 80, 2000)
    res = 7
    cells = hexcell.encode_np(lon, lat, res)
    px, py = _merc(lon, lat)
    cx, cy = _centers_xy(cells)
    d_own = np.hypot(px - cx, py - cy)
    for i in range(0, 2000, 97):  # sample rows: ring scan is O(7) each
        ring = hexcell.k_ring_np(int(cells[i]), 1)
        rx, ry = _centers_xy(ring)
        d_all = np.hypot(px[i] - rx, py[i] - ry)
        assert d_own[i] <= d_all.min() + 1e-6


def test_k_ring_sizes_and_distances():
    c = int(hexcell.encode_np([10.0], [45.0], 8)[0])
    for k in (0, 1, 2, 3):
        ring = hexcell.k_ring_np(c, k)
        assert len(ring) == 3 * k * k + 3 * k + 1
        assert len(set(ring.tolist())) == len(ring)
        assert max(hexcell.hex_distance_np(c, int(x)) for x in ring) \
            == (k if k else 0)
    # all 6 direct neighbors at distance exactly 1 and at the SAME
    # center distance (the property square grids lack)
    nbrs = [x for x in hexcell.k_ring_np(c, 1) if x != c]
    assert [hexcell.hex_distance_np(c, int(x)) for x in nbrs] == [1] * 6
    cx, cy = _centers_xy(np.array([c]))
    nx, ny = _centers_xy(np.array(nbrs))
    d = np.hypot(nx - cx[0], ny - cy[0])
    assert d.max() - d.min() < 1e-6 * d.max()
    s = hexcell.hex_size(8)
    assert d.mean() == pytest.approx(s * math.sqrt(3), rel=1e-9)


def test_center_round_trip():
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-80, 80, 500)
    cells = hexcell.encode_np(lon, lat, 9)
    clon, clat = hexcell.center_np(cells)
    again = hexcell.encode_np(clon, clat, 9)
    assert np.array_equal(cells, again)


def test_resolution_scaling():
    # halving s quadruples density: res r+1 cell of a point is within
    # the point's res-r cell's 1-ring footprint
    assert hexcell.hex_size(5) == 2 * hexcell.hex_size(6)
    with pytest.raises(ValueError):
        hexcell.hex_size(21)


def test_column_matches_numpy(spark):
    from pyspark.sql import functions as F
    lon = rng.uniform(-179, 179, 300)
    lat = rng.uniform(-88, 88, 300)  # exercises the MAX_LAT clamp
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)],
        "lon double, lat double")
    got = np.sort(np.array(
        [r.h for r in df.select(
            hexcell.hex_of(F.col("lon"), F.col("lat"), 9).alias("h"))
         .collect()], dtype=np.int64))
    want = np.sort(hexcell.encode_np(lon, lat, 9))
    assert np.array_equal(got, want)


def test_hex_ring_column_matches_numpy(spark):
    from pyspark.sql import functions as F
    from pyproj_spark.functions.hexcell import hex_of, hex_ring
    df = spark.createDataFrame(
        [(float(lo), float(la)) for lo, la in
         [(-120.3, 37.1), (3.2, -44.9), (151.2, -33.9)]],
        "lon double, lat double")
    rows = df.select(
        hex_of(F.col("lon"), F.col("lat"), 8).alias("c"),
        hex_ring(hex_of(F.col("lon"), F.col("lat"), 8), 2, 8)
        .alias("ring")).collect()
    for r in rows:
        assert list(r.ring) == hexcell.k_ring_np(int(r.c), 2).tolist()
        assert len(r.ring) == 19
