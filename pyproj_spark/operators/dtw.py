"""Dynamic-time-warping trajectory distance.

DTW against a reference polyline — the route-conformance /
trajectory-similarity measure that tolerates speed variation, which
Hausdorff (set distance) and resampled-pointwise metrics do not. One
applyInPandas DP per trajectory (the operators/hmm.py Viterbi shape:
per-group dynamic programming is exactly what Arrow-batched Python is
for — the DP recurrence is not expressible as a join/window plan
without materializing the full i x j lattice as rows).

All costs are EXACT int64: squared integer coordinate differences,
min/plus recurrence — so an engine replaying the same recurrence gets
bit-identical totals and the oracle can unroll the lattice in SQL.

Scale shape: the shuffle is one hash partition by trajectory id; DP
memory is O(len(ref)) per row. Reference polylines are driver
literals (a route table would broadcast).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def dtw_to_reference(tracks: DataFrame, ref: list[tuple[int, int]],
                     user_col: str = "user_id", seq_col: str = "i",
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-trajectory DTW cost vs ``ref`` (integer coordinate pairs).

    Cost(i, j) = (x_i - rx_j)^2 + (y_i - ry_j)^2; standard full-band
    recurrence dp[i][j] = cost + min(up, left, diag) with both
    endpoints anchored. Returns (user, n_pts, dtw_cost)."""
    R = np.asarray(ref, dtype=np.int64)
    m = len(R)

    def _dp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        xs = pdf[x_col].to_numpy(np.int64)
        ys = pdf[y_col].to_numpy(np.int64)
        prev = np.zeros(m, np.int64)
        for i in range(len(xs)):
            cost = (xs[i] - R[:, 0]) ** 2 + (ys[i] - R[:, 1]) ** 2
            cur = np.empty(m, np.int64)
            if i == 0:
                cur[0] = cost[0]
                for j in range(1, m):
                    cur[j] = cost[j] + cur[j - 1]
            else:
                cur[0] = cost[0] + prev[0]
                for j in range(1, m):
                    cur[j] = cost[j] + min(prev[j], prev[j - 1],
                                           cur[j - 1])
            prev = cur
        return pd.DataFrame({"user_id": [key[0]],
                             "n_pts": [len(xs)],
                             "dtw_cost": [int(prev[-1])]})

    return tracks.groupBy(user_col).applyInPandas(
        _dp, "user_id long, n_pts int, dtw_cost long")


def frechet_to_reference(tracks: DataFrame, ref: list[tuple[int, int]],
                         user_col: str = "user_id", seq_col: str = "i",
                         x_col: str = "x", y_col: str = "y"
                         ) -> DataFrame:
    """Per-trajectory DISCRETE FRECHET distance vs ``ref`` (Eiter &
    Mannila 1994 "Computing discrete Frechet distance" — public): the
    min-over-couplings MAX leash length, squared. Same anchored
    lattice as DTW with the plus swapped for max:
    ca[i][j] = max(cost(i,j), min(ca[i-1][j], ca[i-1][j-1],
    ca[i][j-1])) — the bottleneck counterpart of DTW's sum, the third
    member of the trajectory-similarity triad next to Hausdorff (set
    distance, ignores order) and DTW (sum cost, dilutes single
    excursions). Exact int64 squared costs; returns
    (user, n_pts, frechet_sq)."""
    R = np.asarray(ref, dtype=np.int64)
    m = len(R)

    def _dp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        xs = pdf[x_col].to_numpy(np.int64)
        ys = pdf[y_col].to_numpy(np.int64)
        prev = np.zeros(m, np.int64)
        for i in range(len(xs)):
            cost = (xs[i] - R[:, 0]) ** 2 + (ys[i] - R[:, 1]) ** 2
            cur = np.empty(m, np.int64)
            if i == 0:
                cur[0] = cost[0]
                for j in range(1, m):
                    cur[j] = max(cost[j], cur[j - 1])
            else:
                cur[0] = max(cost[0], prev[0])
                for j in range(1, m):
                    cur[j] = max(cost[j], min(prev[j], prev[j - 1],
                                              cur[j - 1]))
            prev = cur
        return pd.DataFrame({"user_id": [key[0]],
                             "n_pts": [len(xs)],
                             "frechet_sq": [int(prev[-1])]})

    return tracks.groupBy(user_col).applyInPandas(
        _dp, "user_id long, n_pts int, frechet_sq long")
