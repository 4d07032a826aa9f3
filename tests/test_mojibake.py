"""Mojibake detection: the regex must catch double-encode artifacts
without flagging LEGITIMATE non-ASCII text — clean accented words,
genuine CP1252-style punctuation, CJK — which an over-broad
"any non-ASCII" heuristic would destroy at corpus scale."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyproj_spark.operators.textstats import mojibake_stats

CASES = [
    # (text, expected n_moji, expected n_repl)
    ("CafÃ©", 1, 0),                 # 'CafÃ©' = é double-encoded
    ("dÃ©jÃ  vu", 2, 0),   # two artifacts
    ("donâ€™t", 1, 0),          # 'â€™' = ' through CP1252
    ("â€œquoteâ€", 2, 0),  # “ and ”
    ("naÃ¯ve", 1, 0),                # ï double-encoded
    ("Ð Ñ", 0, 0),        # Ð/Ñ leads not in C2-C5 set
    ("ok � bad �", 0, 2),            # replacement chars
    # clean text that must NOT flag:
    ("café déjà vu naïve", 0, 0),              # real accents
    ("don’t “quote” — fine", 0, 0),  # real punctuation
    ("中文文本", 0, 0),        # CJK
    ("100€ price", 0, 0),                 # euro after a digit
    ("plain ascii", 0, 0),
    ("", 0, 0),
    # Â + NBSP is the classic space double-encode and MUST flag
    ("xÂ y", 1, 0),
]


def test_mojibake_cases(spark):
    pdf = pd.DataFrame({"i": range(len(CASES)),
                        "t": [c[0] for c in CASES]})
    got = (spark.createDataFrame(pdf)
           .select("i", mojibake_stats(F.col("t")).alias("s"))
           .select("i", "s.n_moji", "s.n_repl")
           .toPandas().sort_values("i"))
    for i, (txt, em, er) in enumerate(CASES):
        row = got[got["i"] == i].iloc[0]
        assert (row["n_moji"], row["n_repl"]) == (em, er), \
            (txt.encode("unicode_escape"), int(row["n_moji"]),
             int(row["n_repl"]), em, er)


def test_mojibake_pure_catalyst(spark):
    df = spark.range(3).select(
        mojibake_stats(F.lit("CafÃ©")).alias("s"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
