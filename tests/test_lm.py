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


def test_tfidf_keywords(spark):
    import math
    from pyproj_spark.operators.lm import tfidf_keywords
    df = spark.createDataFrame(
        [(0, "apple apple banana common common common"),
         (1, "cherry common common"),
         (2, "banana cherry common")],
        "doc_id long, text string")
    out = tfidf_keywords(df, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.token, r.score))
    # doc 0: apple (df=1) beats common (df=3) despite higher tf
    top0 = sorted(by_doc[0])[0]
    assert top0[1] == "apple"
    idf_apple = math.log(4 / 2) + 1
    assert top0[2] == round((2 / 6) * idf_apple, 6)
    # doc 1: common's tf (2/3 x idf 1.0 = .667) outweighs cherry's
    # idf edge (1/3 x 1.693 = .564) — rank order is common, cherry
    assert [t for _r, t, _s in sorted(by_doc[1])] == ["common",
                                                      "cherry"]
    assert sorted(by_doc[1])[1][2] == round((1 / 3)
                                            * (math.log(4 / 3) + 1), 6)
    assert all(len(v) == 2 for v in by_doc.values())
