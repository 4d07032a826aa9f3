"""Hilbert locality keys: automaton vs the classic per-point loop,
curve properties, Column/SQL parity, and the locality edge over Morton
that justifies the operator's existence.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyproj_spark.functions.hilbert import (
    DIGITS, STATES, hilbert_d_np, hilbert_np, hilbert_sql, with_hilbert,
)
from pyproj_spark.functions.zorder import zorder_np


def _xy2d(n, x, y):
    """The textbook per-point loop (Wikipedia's xy2d), the independent
    reference the derived automaton must reproduce."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_automaton_matches_classic_loop_exhaustive():
    bits = 5
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    got = hilbert_d_np(xs, ys, bits)
    ref = np.array([_xy2d(n, int(a), int(b)) for a, b in zip(xs, ys)])
    assert np.array_equal(got, ref)


def test_bijection_and_unit_adjacency():
    bits = 6
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    d = hilbert_d_np(xs, ys, bits)
    assert len(np.unique(d)) == n * n          # bijective onto [0, n^2)
    assert d.min() == 0 and d.max() == n * n - 1
    order = np.argsort(d)
    step = (np.abs(np.diff(xs[order].astype(int)))
            + np.abs(np.diff(ys[order].astype(int))))
    assert (step == 1).all()                    # EVERY move is unit


def test_hilbert_beats_morton_locality():
    """The reason this operator exists next to zorder, measured two
    ways: (1) Morton's curve JUMPS — the max spatial step between
    consecutive keys is the grid width, Hilbert's is 1 — and (2) at
    any file count that is not a power of 4 (the real-world case),
    equal-key-range buckets cover strictly less total bbox area under
    Hilbert, which is exactly what min/max pruning monetizes."""
    bits = 6
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    h = hilbert_d_np(xs, ys, bits)
    lon = (xs + 0.5) / n * 360.0 - 180.0
    lat = (ys + 0.5) / n * 180.0 - 90.0
    m = zorder_np(lon, lat, bits)

    def max_step(key):
        o = np.argsort(key)
        return (np.abs(np.diff(xs[o].astype(int)))
                + np.abs(np.diff(ys[o].astype(int)))).max()

    assert max_step(h) == 1
    assert max_step(m) == n  # the Z-jump across the plane

    def bucket_area(key, nb):
        o = np.argsort(key)
        return sum((xs[c].max() - xs[c].min() + 1)
                   * (ys[c].max() - ys[c].min() + 1)
                   for c in np.array_split(o, nb))

    for nb in (10, 12, 24, 100):
        assert bucket_area(h, nb) < bucket_area(m, nb)


def test_packed_tables_are_the_derived_ones():
    # lock the derived constants; a regression in the derivation would
    # silently re-key every written table
    assert DIGITS == 0x1E369CB4
    assert STATES == 0xB7CA5C21


def test_column_and_sql_parity(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "doc_id": np.arange(2000),
        "lon": rng.uniform(-180, 180, 2000),
        "lat": rng.uniform(-90, 90, 2000)})
    exp = hilbert_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 10)
    out = (with_hilbert(spark.createDataFrame(pdf), F.col("lon"),
                        F.col("lat"), 10)
           .select("doc_id", "hkey").toPandas()
           .sort_values("doc_id"))
    assert np.array_equal(out["hkey"].to_numpy(), exp)
    con = duckdb.connect()
    con.register("pts", pdf)
    got = con.execute("WITH " + hilbert_sql(10)
                      + " SELECT doc_id, hkey FROM hil ORDER BY doc_id"
                      ).df()
    assert np.array_equal(got["hkey"].to_numpy(), exp)


def test_bits_bounds():
    with pytest.raises(ValueError):
        hilbert_np([0.0], [0.0], 0)
    with pytest.raises(ValueError):
        hilbert_np([0.0], [0.0], 16)
