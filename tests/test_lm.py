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


def test_bm25_matches_numpy(spark):
    """bm25_search must equal an independent numpy BM25 (same formula,
    unrounded) in ranking and match scores to 1e-6."""
    import math
    import numpy as np
    from pyproj_spark.operators.search import bm25_search

    docs = [(0, "spark join join window"),
            (1, "join table scan scan scan"),
            (2, "window window spark table value"),
            (3, "value value value"),
            (4, "spark")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    queries = [(1, ["spark", "window"]), (2, ["scan"])]
    got = (bm25_search(df, queries, top_k=5).toPandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))

    texts = {i: t.split() for i, t in docs}
    N = len(docs)
    dls = {i: len(t) for i, t in texts.items()}
    avgdl = sum(dls.values()) / len(dls)
    k1, b = 1.2, 0.75

    def score(qterms, i):
        s = 0.0
        for t in qterms:
            tf = texts[i].count(t)
            if tf == 0:
                continue
            dfreq = sum(1 for d in texts.values() if t in d)
            idf = math.log(1 + (N - dfreq + 0.5) / (dfreq + 0.5))
            s += round(idf * tf * (k1 + 1)
                       / (tf + k1 * (1 - b + b / avgdl * dls[i]))
                       * 1e6) / 1e6
        return s

    for qid, qterms in queries:
        exp = sorted(((score(qterms, i), i) for i in texts
                      if score(qterms, i) > 0),
                     key=lambda p: (-p[0], p[1]))
        sub = got[got["query_id"] == qid]
        assert list(sub["doc_id"]) == [i for _, i in exp]
        np.testing.assert_allclose(sub["score"].to_numpy(),
                                   [s for s, _ in exp], atol=2e-6)
