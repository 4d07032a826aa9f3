"""Getis-Ord Gi* / Moran's I vs an independent numpy recompute."""

import math

import pytest


def _tiles_df(spark, rows):
    return spark.createDataFrame(rows, "tx long, ty long, cnt long")


def _gi_ref(rows):
    """Reference Gi* (Getis & Ord 1992) in plain Python."""
    vals = {(tx, ty): n for tx, ty, n in rows}
    nt = len(vals)
    s1 = sum(vals.values())
    s2 = sum(v * v for v in vals.values())
    mean = s1 / nt
    sd = math.sqrt(s2 / nt - mean * mean)
    out = {}
    for (tx, ty), n in vals.items():
        nbrs = [vals[(tx + dx, ty + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (tx + dx, ty + dy) in vals]
        g, w = sum(nbrs), len(nbrs)
        u = math.sqrt((nt * w - w * w) / (nt - 1))
        out[(tx, ty)] = ((g - mean * w) / (sd * u)
                         if sd * u > 0 else None)
    return out


def test_gi_star_matches_reference(spark):
    from pyproj_spark.operators.hotspot import getis_ord_gi
    # 5x5 lattice, hot 2x2 block in one corner
    rows = [(tx, ty, 50 if tx <= 1 and ty <= 1 else 2)
            for tx in range(5) for ty in range(5)]
    got = {(r.tx, r.ty): r for r in
           getis_ord_gi(_tiles_df(spark, rows)).collect()}
    ref = _gi_ref(rows)
    assert set(got) == set(ref)
    for k, z in ref.items():
        assert got[k].gi_z == pytest.approx(z, abs=1e-12), k
    # the hot block is flagged, the far corner is cold-or-neutral
    assert got[(0, 0)].hot == 1
    assert got[(4, 4)].hot in (0, -1)
    # neighborhood bookkeeping: interior tile sees 9, corner sees 4
    assert got[(2, 2)].wsum == 9 and got[(0, 0)].wsum == 4


def test_gi_star_degenerate_variance_is_null(spark):
    from pyproj_spark.operators.hotspot import getis_ord_gi
    rows = [(tx, ty, 7) for tx in range(3) for ty in range(3)]
    out = getis_ord_gi(_tiles_df(spark, rows)).collect()
    assert all(r.gi_z is None and r.hot == 0 for r in out)


def _moran_ref(rows):
    """Reference Moran's I (binary queen weights, no self)."""
    vals = {(tx, ty): n for tx, ty, n in rows}
    nt = len(vals)
    mean = sum(vals.values()) / nt
    num = s0 = 0.0
    for (tx, ty), n in vals.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) != (0, 0) and (tx + dx, ty + dy) in vals:
                    num += (n - mean) * (vals[(tx + dx, ty + dy)] - mean)
                    s0 += 1
    den = sum((v - mean) ** 2 for v in vals.values())
    return nt / s0 * num / den, s0


def test_moran_checkerboard_negative_block_positive(spark):
    from pyproj_spark.operators.hotspot import morans_i
    # checkerboard: rook neighbors oppose, diagonals agree -> mildly
    # negative I (the queen-lattice subtlety)
    checker = [(tx, ty, 1 + 4 * ((tx + ty) % 2))
               for tx in range(6) for ty in range(6)]
    m = morans_i(_tiles_df(spark, checker)).collect()[0]
    ref_i, ref_s0 = _moran_ref(checker)
    assert m.n_tiles == 36 and m.s0 == ref_s0 == 220
    assert m.i_obs == pytest.approx(ref_i, abs=1e-12)
    assert m.i_obs < m.e_i and m.z_i < 0
    # two homogeneous halves -> strong positive autocorrelation
    blocks = [(tx, ty, 100 if tx < 3 else 1)
              for tx in range(6) for ty in range(6)]
    b = morans_i(_tiles_df(spark, blocks)).collect()[0]
    ref_b, _ = _moran_ref(blocks)
    assert b.i_obs == pytest.approx(ref_b, abs=1e-12)
    assert b.i_obs > b.e_i and b.z_i > 2


def test_moran_partitioning_invariance(spark):
    from pyproj_spark.operators.hotspot import morans_i
    rows = [(tx, ty, (tx * 7 + ty * 3) % 11 + 1)
            for tx in range(8) for ty in range(8)]
    a = morans_i(_tiles_df(spark, rows)).collect()[0]
    b = morans_i(_tiles_df(spark, rows).repartition(7)).collect()[0]
    assert a == b  # exact integer sums -> bit-identical doubles
