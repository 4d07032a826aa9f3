"""HMM map-matching (Viterbi) — the path-coherent upgrade of
nearest-segment snapping (queries.py `snap_roads`): match each
trajectory to the road-segment sequence minimizing
sum(emission d^2) + lambda * (number of segment switches).
Newson & Krumm's (2009) classic formulation, distilled to a deterministic
integer form.

Distributed shape (what must survive 100 TB):
  * candidate costs: one scan cross-joined against the broadcast
    segment table (at corpus scale the segment set is cell-prefiltered
    first, the pip_join/knn pattern, so the fan-out stays bounded);
  * DP: applyInPandas per trajectory — state is steps x states
    integers, bounded by the trajectory length, never corpus-sized;
  * all costs are EXACT int64 (d^2 rounded once to 1e-10-degree^2
    units), so a SQL engine replays the full DP bit-for-bit.

Tie-break contract (shared with the SQL oracle): the forward values
use min() only; the path is reconstructed BACKWARD as
argmin_s(v_k(s) + lambda*[s != path_{k+1}]) with lowest-seg-first
ties — identical in numpy (first-occurrence argmin over seg-sorted
columns) and SQL (ORDER BY cost, seg LIMIT 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: segment-switch penalty in the same 1e-10 deg^2 units as emissions
LAMBDA = 2_000_000_000


def emission_costs(pts: DataFrame, segs: DataFrame) -> DataFrame:
    """(traj_id, step, seg_id, em): clamped point-to-segment squared
    distance — the snap_roads arithmetic — rounded once to an exact
    long. ``pts`` needs traj_id, step, lon, lat; ``segs`` needs
    seg_id, ax, ay, bx, by (broadcast)."""
    c = pts.crossJoin(F.broadcast(segs))
    dx, dy = F.col("bx") - F.col("ax"), F.col("by") - F.col("ay")
    traw = (((F.col("lon") - F.col("ax")) * dx
             + (F.col("lat") - F.col("ay")) * dy)
            / (dx * dx + dy * dy))
    t = F.least(F.greatest(traw, F.lit(0.0)), F.lit(1.0))
    ex = F.col("lon") - (F.col("ax") + t * dx)
    ey = F.col("lat") - (F.col("ay") + t * dy)
    em = F.round((ex * ex + ey * ey) * 1e10).cast("long")
    return c.select("traj_id", "step", "seg_id", em.alias("em"))


def viterbi_match(pts: DataFrame, segs: DataFrame,
                  lam: int = LAMBDA) -> DataFrame:
    """(traj_id, step, seg_id): the minimum-cost segment sequence per
    trajectory."""
    em = emission_costs(pts, segs)

    def _dp(key, pdf: pd.DataFrame):
        mat = (pdf.pivot(index="step", columns="seg_id", values="em")
               .sort_index())
        segs_sorted = list(mat.columns)          # ascending seg_id
        e = mat.to_numpy(dtype=np.int64)         # steps x states
        k_steps = e.shape[0]
        vs = [e[0].copy()]
        for k in range(1, k_steps):
            prev = vs[-1]
            vs.append(e[k] + np.minimum(prev, prev.min() + lam))
        path = np.empty(k_steps, dtype=np.int64)
        path[-1] = int(np.argmin(vs[-1]))        # first min = low seg
        for k in range(k_steps - 2, -1, -1):
            cand = vs[k] + lam * (
                np.arange(len(segs_sorted)) != path[k + 1])
            path[k] = int(np.argmin(cand))
        return pd.DataFrame({
            "traj_id": [int(key[0])] * k_steps,
            "step": list(mat.index),
            "seg_id": [segs_sorted[i] for i in path]})

    return (em.groupBy("traj_id")
            .applyInPandas(_dp, "traj_id long, step long, seg_id int"))
