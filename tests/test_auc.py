"""Exact rank-sum ROC-AUC vs a brute-force pair count."""

import numpy as np
import pytest


def _brute_auc(scores, labels):
    """P(score_pos > score_neg) + 0.5 P(equal) over all pairs."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0
              for p in pos for n in neg)
    return num / (len(pos) * len(neg))


class TestQualityAUC:
    def _run(self, spark, rows):
        from pyproj_spark.queries_text import q_quality_auc
        import pandas as pd
        import tempfile, os
        df = spark.createDataFrame(
            [(i, "t", lang, src, s) for i, (src, s, lang) in
             enumerate(rows)],
            ["doc_id", "text", "lang", "source", "n_chars"])
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        return {r.source: r for r in q_quality_auc(spark, d).collect()}

    def test_matches_brute_force_with_ties(self, spark):
        rng = np.random.RandomState(21)
        rows = []
        for src in ("a.com", "b.com"):
            for _ in range(40):
                is_en = rng.rand() < 0.5
                # positives get higher-but-overlapping tied scores
                s = int(rng.randint(0, 8) + (3 if is_en else 0))
                rows.append((src, s, "en" if is_en else "de"))
        got = self._run(spark, rows)
        for src in ("a.com", "b.com"):
            scores = [s for r, s, l in rows if r == src]
            labels = [l == "en" for r, s, l in rows if r == src]
            want = _brute_auc(scores, labels)
            assert got[src].auc_micro == round(1e6 * want), src

    def test_perfect_and_random_extremes(self, spark):
        rows = ([("p.com", 100 + i, "en") for i in range(10)]
                + [("p.com", i, "de") for i in range(10)]
                + [("t.com", i, "en") for i in range(10)]
                + [("t.com", i, "de") for i in range(10)])
        got = self._run(spark, rows)
        assert got["p.com"].auc_micro == 1_000_000
        assert got["t.com"].auc_micro == 500_000  # all-tied pairs
