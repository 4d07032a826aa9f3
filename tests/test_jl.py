"""JL projection: distance preservation + determinism."""

import numpy as np
import pytest

from pyproj_spark.operators.similarity import jl_project, jl_sign_matrix


class TestJLProject:
    def test_matches_numpy_matmul(self, spark):
        rng = np.random.RandomState(7)
        vecs = rng.randn(20, 64).astype(np.float32)
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = {(r.vec_id, r.comp): r.p_micro
               for r in jl_project(df, k=16, dim=64).collect()}
        M = np.array(jl_sign_matrix(16, 64), np.int64)
        q = np.round(vecs.astype(np.float64) * 1e6).astype(np.int64)
        want = q @ M.T
        for i in range(20):
            for c in range(16):
                assert got[(i, c)] == want[i, c]

    def test_pairwise_distance_preservation(self, spark):
        # the JL lemma: sq distances scale by ~k (for +-1 signs) with
        # bounded distortion; check rank correlation on random pairs
        # structured data: cluster centres at genuinely different
        # separations (iid gaussians concentrate — all pairwise
        # distances equal — leaving no signal to preserve)
        rng = np.random.RandomState(11)
        centres = rng.randn(5, 64) * np.array([1, 2, 4, 8, 16])[:, None]
        vecs = (centres[np.arange(30) % 5]
                + 0.1 * rng.randn(30, 64))
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = jl_project(df, k=16, dim=64).collect()
        proj = np.zeros((30, 16))
        for r in out:
            proj[r.vec_id, r.comp] = r.p_micro / 1e6
        orig_d, proj_d = [], []
        for a in range(0, 30, 3):
            for b in range(a + 1, 30, 4):
                orig_d.append(np.sum((vecs[a] - vecs[b]) ** 2))
                proj_d.append(np.sum((proj[a] - proj[b]) ** 2))
        corr = np.corrcoef(orig_d, proj_d)[0, 1]
        assert corr > 0.7

    def test_sign_matrix_deterministic_and_balanced(self):
        m1 = jl_sign_matrix(16, 64)
        m2 = jl_sign_matrix(16, 64)
        assert m1 == m2
        flat = [s for row in m1 for s in row]
        assert set(flat) == {-1, 1}
        # md5 parity should be roughly balanced
        assert abs(sum(flat)) < 0.2 * len(flat)
