"""Unigram-LM quality scoring (operators/lm.py) — hand-computed
goldens on a tiny corpus plus plan-shape checks."""

import math

import pytest

from pyproj_spark.operators.lm import score_documents, train_unigram_lm


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog"), (2, "zzz unknown"),
         (3, "")],
        "doc_id long, text string")


def test_model_logprobs(corpus):
    lm = {r.token: r.logp
          for r in train_unigram_lm(corpus, vocab_size=3).collect()}
    # corpus tokens: the(2) cat sat dog zzz unknown -> total 7
    # top-3 by (cnt desc, token asc): the, cat, dog
    assert set(lm) == {"the", "cat", "dog", "__oov__"}
    assert lm["the"] == pytest.approx(math.log(3 / 10))  # (2+1)/(7+3)
    assert lm["cat"] == pytest.approx(math.log(2 / 10))
    assert lm["__oov__"] == pytest.approx(math.log(1 / 10))


def test_document_scores(corpus):
    lm = train_unigram_lm(corpus, vocab_size=3)
    got = {r.doc_id: (r.n_toks, r.mean_logp)
           for r in score_documents(corpus, lm).collect()}
    # doc 0: the cat sat -> (log .3 + log .2 + oov log .1)/3
    want0 = round((math.log(.3) + math.log(.2) + math.log(.1)) / 3, 5)
    assert got[0] == (3, want0)
    # doc 2 is all-OOV, doc 3 empty -> no row
    assert got[2] == (2, round(math.log(.1), 5))
    assert 3 not in got


def test_scoring_plan_broadcasts_model(corpus):
    lm = train_unigram_lm(corpus, vocab_size=3)
    plan = score_documents(corpus, lm) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan
