"""Readability signals + RAKE keyword extraction."""

import pytest

from pyproj_spark.operators.search import rake_keywords
from pyproj_spark.operators.textstats import readability


class TestReadability:
    def test_known_counts(self, spark):
        text = "The cat sat. The dog ran! A bird flew?"
        [r] = readability(spark.createDataFrame(
            [(1, text)], ["doc_id", "text"])).collect()
        assert r.n_words == 9
        assert r.n_sents == 3
        # vowel-group runs: e,a,a,e,o,a,a,i,e,u -> count them
        assert r.n_syll == sum(1 for _ in __import__("re").finditer(
            r"[aeiouy]+", text.lower()))
        fre = 206.835 - 1.015 * 9 / 3 - 84.6 * r.n_syll / 9
        assert r.fre == pytest.approx(fre)

    def test_degenerate_no_sentences(self, spark):
        [r] = readability(spark.createDataFrame(
            [(1, "no terminal punctuation here")],
            ["doc_id", "text"])).collect()
        assert r.n_sents == 1  # floor guards the division

    def test_simple_text_scores_higher(self, spark):
        rows = [(1, "The cat sat on the mat. It was fun. We ran."),
                (2, "Notwithstanding institutional heterogeneity, "
                    "organizational restructuring necessitates "
                    "comprehensive infrastructural reconfiguration.")]
        out = {r.doc_id: r.fre for r in readability(
            spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
        assert out[1] > out[2]

    def test_fre_null_when_empty_text(self, spark):
        [r] = readability(spark.createDataFrame(
            [(1, "")], ["doc_id", "text"])).collect()
        assert r.n_words == 0  # guarded division, no crash


class TestRake:
    def test_multiword_phrase_beats_common_single_word(self, spark):
        docs = [
            (1, "deep learning of text. deep learning is the key."),
            (2, "text mining and deep learning for text mining."),
            (3, "the key is text."),
        ]
        rows = rake_keywords(spark.createDataFrame(
            docs, ["doc_id", "text"]), top_k=10).collect()
        scores = {r.phrase: r.score_micro for r in rows}
        # RAKE's signature behaviour: multi-word collocations outrank
        # their frequent constituent words
        assert scores["deep learning"] > scores["key"]
        assert scores["text mining"] > scores["text"]
        # occurrences counted per appearance
        occ = {r.phrase: r.n_occ for r in rows}
        assert occ["deep learning"] == 3
        assert occ["text mining"] == 2

    def test_stopwords_never_appear_in_phrases(self, spark):
        from pyproj_spark.operators.search import RAKE_STOPWORDS
        docs = [(1, "the quick brown fox and the lazy dog of the farm")]
        rows = rake_keywords(spark.createDataFrame(
            docs, ["doc_id", "text"])).collect()
        words = {w for r in rows for w in r.phrase.split()}
        assert not words & set(RAKE_STOPWORDS)
        assert "quick brown fox" in {r.phrase for r in rows}

    def test_phrase_length_cap(self, spark):
        docs = [(1, "alpha beta gamma delta epsilon zeta eta theta")]
        rows = rake_keywords(spark.createDataFrame(
            docs, ["doc_id", "text"]), max_words=4).collect()
        assert all(len(r.phrase.split()) <= 4 for r in rows)
