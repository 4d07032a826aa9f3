"""repetition_features (operators/textstats.py) — golden edge cases;
the bulk path is gated by the `repetition` oracle query."""

import pytest

from pyproj_spark.operators.textstats import repetition_features


def test_repetition_features_goldens(spark):
    df = spark.createDataFrame([
        (1, "a b a b a\nline two\nline two"),
        (2, "x"),            # single token: no bigrams
        (3, ""),             # empty text
        (4, "one two one two one"),
        (5, "t t\nt t"),     # duplicate lines + tie-free top bigram
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}

    r = got[1]
    # 3 lines, 'line two' duplicated once -> 1/3
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # ties between 'a b', 'b a', 'line two' (2 each) break lexically
    assert (r["top_bigram"], r["top_bigram_cnt"]) == ("a b", 2)
    assert r["n_bigrams"] == 8
    assert r["top_bigram_frac"] == pytest.approx(0.25)

    for d in (2, 3):
        r = got[d]
        assert r["n_bigrams"] == 0
        assert (r["top_bigram"], r["top_bigram_cnt"]) == ("", 0)
        assert r["top_bigram_frac"] == 0.0

    r = got[4]
    assert (r["top_bigram"], r["top_bigram_cnt"]) == ("one two", 2)
    assert r["top_bigram_frac"] == pytest.approx(0.5)

    r = got[5]
    assert r["dup_line_frac"] == pytest.approx(0.5)
    # tokens flatten across lines: 't t','t t','t t' -> cnt 3 of 3
    assert (r["top_bigram"], r["top_bigram_cnt"]) == ("t t", 3)
    assert r["top_bigram_frac"] == pytest.approx(1.0)


def test_deterministic_sampling(spark):
    """operators/sampling.py: the kept set is a pure function of the
    key — invariant under repartitioning — and rates land near the
    target fraction."""
    from pyproj_spark.operators.sampling import (
        deterministic_sample, stratified_sample,
    )
    from pyspark.sql import functions as F
    df = spark.range(20000).withColumnRenamed("id", "doc_id") \
        .withColumn("lang", F.when(F.col("doc_id") % 3 == 0, "en")
                    .otherwise("de"))
    a = sorted(r["doc_id"] for r in
               deterministic_sample(df, 0.3).collect())
    b = sorted(r["doc_id"] for r in
               deterministic_sample(df.repartition(17), 0.3).collect())
    assert a == b  # partitioning-invariant
    assert abs(len(a) / 20000 - 0.3) < 0.02
    s = stratified_sample(df, {"en": 0.5}, default_rate=0.1)
    got = {r["lang"]: r["cnt"] for r in
           s.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    n_en = 20000 // 3 + 1
    assert abs(got["en"] / n_en - 0.5) < 0.05
    assert abs(got["de"] / (20000 - n_en) - 0.1) < 0.03
    # different salts draw different (deterministic) coins
    c = sorted(r["doc_id"] for r in
               deterministic_sample(df, 0.3, salt="other").collect())
    assert c != a


def test_decontaminate(spark):
    from pyproj_spark.operators.dedup import decontaminate
    corpus = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "a completely different document about spark plans"),
         (2, "quick brown fox jumps right over everything"),  # 2 hits
         (3, "brown fox sighted")],  # 3 tokens -> 1 shingle, 1 hit
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontaminate(corpus, bench).collect()}
    assert got[0][1] is True and got[0][0] >= 2
    assert got[1] == (0, False)
    assert got[2][1] is True
    assert got[3] == (0, False)  # "brown fox sighted" shares no 3-gram
    # benchmark shingles must broadcast
    plan = decontaminate(corpus, bench) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_paragraph_dedup(spark):
    from pyproj_spark.operators.dedup import paragraph_dedup
    docs = spark.createDataFrame(
        [(0, "unique zero\nshared boilerplate\ntail zero"),
         (1, "unique one\nshared boilerplate\n\n  \ntail one"),
         (2, "all mine\nonly here")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_paras, r.n_dup)
           for r in paragraph_dedup(docs).collect()}
    # empties/whitespace-only paragraphs don't count
    assert got[0] == (3, 1) and got[1] == (3, 1)
    assert got[2] == (2, 0)
    # cleaned text of docs 0/1 keeps order and drops only the shared
    import hashlib
    want0 = hashlib.md5(b"unique zero\ntail zero").hexdigest()
    row0 = [r for r in paragraph_dedup(docs).collect()
            if r.doc_id == 0][0]
    assert row0.clean_hash == want0


def test_simhash_pairs(spark):
    from pyproj_spark.operators.dedup import simhash_pairs
    df = spark.createDataFrame([
        (0, "the quick brown fox jumps over the lazy dog once more"),
        (1, "the quick brown fox jumps over the lazy dog once more?"),
        (2, "entirely unrelated catalyst optimizer discussion text"),
    ], "doc_id long, text string")
    # 16-bit signatures are coarse on tiny texts: at the default
    # hamming<=3 even unrelated shorts can collide, so assert at the
    # strict threshold where only the true near-dup survives
    pairs = simhash_pairs(df, max_hamming=1).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]
    assert pairs[0].hamming <= 1
    # pigeonhole: identical docs pair at hamming 0 via every band,
    # but distinct() collapses the duplicate candidates
    df2 = spark.createDataFrame(
        [(0, "same words here entirely"), (1, "same words here entirely")],
        "doc_id long, text string")
    p2 = simhash_pairs(df2).collect()
    assert len(p2) == 1 and p2[0].hamming == 0


def test_containment_detects_embedded_doc(spark):
    """A short doc fully embedded in a long one must score containment
    1.0 in the src->dst direction while Jaccard stays low, and the
    reverse direction scores |inter|/|superset|."""
    from pyproj_spark.operators.dedup import (containment_pairs,
                                              jaccard_pairs)
    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = [(1, quote), (2, filler + " " + quote + " " + filler)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = (containment_pairs(df, threshold=0.01)
           .toPandas().set_index(["src_id", "dst_id"]))
    assert got.loc[(1, 2), "containment"] == 1.0
    assert got.loc[(2, 1), "containment"] < 0.05
    jac = jaccard_pairs(df, threshold=0.01).toPandas()
    assert (jac["jaccard"] < 0.05).all()


def test_extract_links_parses_tags(spark):
    """Link extraction must pair each href host with ITS anchor text
    (zip order), skip non-http schemes, and handle pages with no
    links."""
    from pyproj_spark.operators.extract import extract_links
    pages = spark.createDataFrame([
        ("a", '<a href="http://x.com/1">one</a> mid '
              '<a href="https://y.org/2?q=3">two</a>'),
        ("b", '<a href="ftp://z.net/f">nope</a> plain text'),
        ("c", "no links at all"),
    ], ["src_host", "html"])
    got = (extract_links(pages).toPandas()
           .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
    assert len(got) == 2
    assert list(got["dst_host"]) == ["x.com", "y.org"]
    assert list(got["anchor_text"]) == ["one", "two"]


def test_dup_spans_interval_semantics(spark):
    """A 30-token run shared between two docs yields ONE span of
    coverage 30 in each; two shared runs separated by >20 unique
    tokens yield two spans; a doc with no shared run emits no row."""
    from pyproj_spark.queries_text import QUERIES_TEXT
    import pyproj_spark.queries_text as qt
    from pyspark.sql import functions as F, Window
    from pyproj_spark.operators.lm import _tokens  # noqa: F401

    run1 = " ".join(f"r{j}" for j in range(30))
    run2 = " ".join(f"s{j}" for j in range(25))
    fill = lambda p, n: " ".join(f"{p}{j}" for j in range(n))
    docs = [
        (1, f"{fill('a', 5)} {run1} {fill('b', 30)} {run2}"),
        (2, f"{run1} {fill('c', 40)} {run2} {fill('d', 3)}"),
        (3, fill("e", 60)),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    # reuse the query's pipeline on a custom frame by invoking the
    # internals: shingle + dupset + interval merge at N=20
    N = 20
    toks = F.filter(F.split(F.trim("text"), r"\s+"),
                    lambda t: t != F.lit(""))
    staged = df.select("doc_id", toks.alias("tk")) \
        .filter(F.size("tk") >= N)
    sh = staged.select(
        "doc_id", F.size("tk").alias("n_tokens"),
        F.posexplode(F.transform(
            F.sequence(F.lit(1), F.size("tk") - (N - 1)),
            lambda p: F.md5(F.concat_ws(" ", F.slice(F.col("tk"),
                                                     p, N)))))
        .alias("pos", "h"))
    dupset = (sh.select("h", "doc_id").distinct().groupBy("h")
              .agg(F.count(F.lit(1)).alias("nd"))
              .filter(F.col("nd") >= 2).select("h"))
    dpos = sh.join(F.broadcast(dupset), "h")
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (dpos.withColumn(
        "ns", F.when(F.col("pos") - F.lag("pos").over(w) <= N, 0)
        .otherwise(1))
        .withColumn("sid", F.sum("ns").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "sid")
        .agg((F.max("pos") - F.min("pos") + N).alias("cov")))
    got = (spans.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_spans"),
                F.sum("cov").alias("dup_tokens"))
           .toPandas().set_index("doc_id").sort_index())
    assert got.loc[1, "n_spans"] == 2
    assert got.loc[1, "dup_tokens"] == 30 + 25
    assert got.loc[2, "n_spans"] == 2
    assert got.loc[2, "dup_tokens"] == 30 + 25
    assert 3 not in got.index


def test_dup_spans_exact_variable_lengths(spark):
    """dup_spans_exact reports TRUE maximal match lengths, not the
    fixed-20-gram floor: the planted pair run of 20 + (g % 15) tokens
    comes back with its exact length (21..34 exercise every value the
    fixed-n detector cannot distinguish), and the 45-token group run
    comes back as exactly 45 for every cross-pair in the 5-doc group."""
    from pyproj_spark.queries_text import q_dup_spans_exact
    got = (q_dup_spans_exact(spark, "/root/testdata/sf0.001")
           .toPandas().set_index(["da", "db"]).sort_index())
    assert (got["max_len"] >= 20).all()
    pair_rows = [(da, db) for (da, db) in got.index
                 if db == da + 1 and da % 2 == 0]
    assert pair_rows, "no planted doc pairs found"
    seen_lengths = set()
    for da, db in pair_rows:
        g = da // 2
        want_x = 20 + (g % 15)
        r = got.loc[(da, db)]
        # same 5-group -> runY(45) also matches; max is whichever wins
        same_group = (da // 5) == (db // 5)
        want_max = max(want_x, 45) if same_group else want_x
        assert r["max_len"] == want_max, (da, db, r["max_len"], want_max)
        seen_lengths.add(want_x)
    # the fixture cycles all 15 pair-run lengths at sf0.001 (>=30 pairs)
    assert len(seen_lengths) >= 10
    # a cross-pair inside a 5-group that is NOT a planted doc pair
    # matches ONLY runY -> exact length 45
    cross = [(da, db) for (da, db) in got.index
             if (da // 5) == (db // 5) and db != da + 1]
    assert cross and all(got.loc[p, "max_len"] == 45 for p in cross)
