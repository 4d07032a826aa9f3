"""PBSM rect join + scanline dissolve vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyproj_spark.operators.rectjoin import rect_join
from pyproj_spark.operators.sweep import union_by_row


def _rects(n, seed, span=40, size=25):
    # deterministic LCG so the fixture is stable across runs
    s = seed
    out = []
    for i in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        x = s % span
        s = (s * 1103515245 + 12345) % (1 << 31)
        y = s % span
        s = (s * 1103515245 + 12345) % (1 << 31)
        w = s % size
        s = (s * 1103515245 + 12345) % (1 << 31)
        h = s % size
        out.append((i, x, x + w, y, y + h))
    return out


COLS = ["id", "x_lo", "x_hi", "y_lo", "y_hi"]


def _brute_pairs(a, b):
    out = set()
    for ai, ax0, ax1, ay0, ay1 in a:
        for bi, bx0, bx1, by0, by1 in b:
            if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                area = ((min(ax1, bx1) - max(ax0, bx0) + 1)
                        * (min(ay1, by1) - max(ay0, by0) + 1))
                out.add((ai, bi, area))
    return out


class TestRectJoin:
    @pytest.mark.parametrize("cell", [4, 16, 64])
    def test_matches_brute_force_each_pair_once(self, spark, cell):
        a, b = _rects(60, 7), _rects(80, 13)
        got = rect_join(spark.createDataFrame(a, COLS),
                        spark.createDataFrame(b, COLS),
                        cell=cell).collect()
        tuples = [(r.a_id, r.b_id, r.ix_area) for r in got]
        assert len(tuples) == len(set(tuples)), "duplicate pair reported"
        assert set(tuples) == _brute_pairs(a, b)

    def test_touching_edge_counts_huge_rect_spans_cells(self, spark):
        a = [(0, 0, 9, 0, 9), (1, 0, 200, 0, 0)]       # row-spanning strip
        b = [(0, 10, 20, 5, 7),                         # touches a0 at x=10? no: 10>9
             (1, 9, 9, 9, 9),                           # corner-touch a0
             (2, 150, 260, 0, 3)]                       # overlaps strip far out
        got = rect_join(spark.createDataFrame(a, COLS),
                        spark.createDataFrame(b, COLS), cell=8).collect()
        assert {(r.a_id, r.b_id, r.ix_area) for r in got} == _brute_pairs(a, b)
        assert (0, 1) in {(r.a_id, r.b_id) for r in got
                          if r.ix_area == 1}  # corner touch = area 1


class TestUnionByRow:
    def test_matches_pixel_grid(self, spark):
        rects = _rects(50, 99, span=64, size=20)
        got = {r.y: (r.n_intervals, r.n_islands, r.union_len)
               for r in union_by_row(
                   spark.createDataFrame(rects, COLS)).collect()}
        # brute: boolean grid per row
        grid = np.zeros((128, 128), bool)
        per_row = {}
        for _, x0, x1, y0, y1 in rects:
            for y in range(y0, y1 + 1):
                grid[y, x0:x1 + 1] = True
                per_row[y] = per_row.get(y, 0) + 1
        for y, n_int in per_row.items():
            row = grid[y]
            islands = int(np.sum(row[1:] & ~row[:-1]) + row[0])
            assert got[y] == (n_int, islands, int(row.sum())), y
        assert set(got) == set(per_row)

    def test_fully_nested_intervals_one_island(self, spark):
        rects = [(0, 0, 100, 5, 5), (1, 10, 20, 5, 5), (2, 30, 90, 5, 5)]
        [r] = union_by_row(spark.createDataFrame(rects, COLS)).collect()
        assert (r.y, r.n_intervals, r.n_islands, r.union_len) == (5, 3, 1, 101)


class TestRangeJoin:
    def test_matches_brute_force_each_pair_once(self, spark):
        from pyproj_spark.operators.rangejoin import range_join
        a = [(i, i * 37 % 500, i * 37 % 500 + i % 40) for i in range(80)]
        b = [(i, i * 53 % 480, i * 53 % 480 + i % 60) for i in range(60)]
        for bucket in (7, 64, 1000):
            got = range_join(
                spark.createDataFrame(a, ["id", "lo", "hi"]),
                spark.createDataFrame(b, ["id", "lo", "hi"]),
                bucket=bucket).collect()
            tuples = [(r.a_id, r.b_id, r.ov_len) for r in got]
            assert len(tuples) == len(set(tuples)), bucket
            brute = {(ai, bi, min(ah, bh) - max(al, bl) + 1)
                     for ai, al, ah in a for bi, bl, bh in b
                     if al <= bh and bl <= ah}
            assert set(tuples) == brute, bucket

    def test_touching_intervals_overlap_by_one(self, spark):
        from pyproj_spark.operators.rangejoin import range_join
        a = [(0, 0, 10)]
        b = [(0, 10, 20), (1, 11, 20)]
        got = range_join(spark.createDataFrame(a, ["id", "lo", "hi"]),
                         spark.createDataFrame(b, ["id", "lo", "hi"]),
                         bucket=4).collect()
        assert [(r.a_id, r.b_id, r.ov_len) for r in got] == [(0, 0, 1)]
