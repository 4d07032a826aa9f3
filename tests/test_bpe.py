"""BPE training (operators/bpe.py) vs a pure-python reference
(Sennrich et al. 2016 algorithm on a word-frequency dict)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from pyproj_spark.operators.bpe import learn_bpe, segment_words


def _ref_bpe(word_counts: dict, n_merges: int):
    """Reference implementation: dict of word->count, greedy
    left-to-right merge application."""
    vocab = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # freq desc, pair asc — the operator's tie-break
        (a, b), freq = sorted(pairs.items(),
                              key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b, freq))
        new = {}
        for syms, c in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_learn_bpe_matches_reference(spark):
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3,
             "lowest": 4, "newer": 1}
    text = " ".join(" ".join([w] * c) for w, c in sorted(words.items()))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = (learn_bpe(docs, n_merges=6).orderBy("step").collect())
    exp = _ref_bpe(words, 6)
    assert [(r["left"], r["right"], r["freq"]) for r in got] == exp
    assert [r["merged"] for r in got] == [a + b for a, b, _ in exp]


def test_greedy_overlap_run():
    """'aaa' under merge (a,a) -> [aa, a] — non-overlapping greedy."""
    ref = _ref_bpe({"aaa": 1}, 1)
    assert ref[0][:2] == ("a", "a")
    # apply once: the run must not double-fuse


def test_segment_words_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "stack stack stack stars stars strut")],
        ["doc_id", "text"])
    m = learn_bpe(docs, n_merges=4).orderBy("step").collect()
    pieces = segment_words(docs, [(r["left"], r["right"]) for r in m])
    out = pieces.collect()
    for r in out:
        # pieces always reassemble to the word + terminal marker
        assert "".join(r["pieces"]) == r["w"] + "</w>"
        assert len(r["pieces"]) >= 1
    # at least one multi-char piece was learned on this corpus
    assert any(len(p) > 1 for r in out for p in r["pieces"])


def test_deterministic_across_partitionings(spark):
    text = "the quick brown fox jumps over the lazy dog the end"
    docs1 = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    docs8 = spark.createDataFrame(
        [(i, w) for i, w in enumerate(text.split())],
        ["doc_id", "text"]).repartition(8)
    a = [tuple(r) for r in learn_bpe(docs1, n_merges=3)
         .orderBy("step").collect()]
    b = [tuple(r) for r in learn_bpe(docs8, n_merges=3)
         .orderBy("step").collect()]
    assert a == b


def test_safe_batch_matches_sequential_selection():
    """The frequency-gap batch must produce EXACTLY the sequential
    one-merge-at-a-time sequence (pure-python replay, randomized)."""
    import random
    from collections import Counter

    from pyproj_spark.operators.bpe import _safe_batch

    def apply_merge(s, l, r):
        acc = []
        for x in s:
            if acc and acc[-1] == l and x == r:
                acc[-1] = l + r
            else:
                acc.append(x)
        return acc

    def counts(syms, words):
        c = Counter()
        for w, cnt in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                c[(a, b)] += cnt
        return c

    def run(words, n, window=None):
        syms = {w: list(w) + ["</w>"] for w in words}
        out = []
        while len(out) < n:
            c = counts(syms, words)
            if not c:
                break
            rows = [{"l": l, "r": r, "freq": f} for (l, r), f in
                    sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))]
            if window:
                batch = _safe_batch(rows[:window])[:n - len(out)]
            else:
                batch = rows[:1]
            for b in batch:
                out.append((b["l"], b["r"], b["freq"]))
                for w in syms:
                    syms[w] = apply_merge(syms[w], b["l"], b["r"])
        return out

    rng = random.Random(11)
    for _ in range(40):
        words = {"".join(rng.choice("abcd")
                         for _ in range(rng.randint(2, 8))):
                 rng.randint(1, 30)
                 for _ in range(rng.randint(4, 40))}
        assert run(dict(words), 8, window=16) == run(dict(words), 8)


def test_fertility_bounds(spark):
    """Fertility >= 1 (a word is at least one piece) and chars per
    token <= max word length; every lang present."""
    from pyproj_spark.queries_text import q_fertility
    rows = q_fertility(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.fertility >= 1.0
        assert 0 < r.chars_per_tok <= 12.0
        assert r.n_tokens >= r.n_words
