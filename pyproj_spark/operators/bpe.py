"""Distributed BPE vocabulary training — the tokenizer-learning stage
of an LLM data pipeline (Sennrich et al., "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016 — public).

Shape matters at 100 TB: BPE learning never iterates over the corpus.
ONE corpus pass builds the (distinct word, count) table — the classic
compressed form — and every merge iteration runs over that small
table: adjacent-symbol pair counts weighted by word frequency (explode
+ hash agg), deterministic selection (freq desc, pair asc — a
TakeOrdered, no global sort), then greedy left-to-right merge
application as a native aggregate-HOF fold over each word's symbol
array. Each driver round collects a bounded top-M window (same
bounded-driver contract as kmeans centroids) and accepts every merge
the frequency-gap bound proves safe, so n merges cost ~log-ish driver
rounds rather than n.

The greedy fold needs no lookahead flag: fuse whenever the
accumulator's last symbol is `left` and the incoming symbol is
`right`. A fused token can never re-fuse with the same rule in the
same pass because its string differs from `left` (it is strictly
longer), which reproduces the standard non-overlapping left-to-right
semantics ("aaa" under (a,a) -> ["aa", "a"]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_table(docs: DataFrame, text_col: str, max_words: int,
                max_len: int) -> DataFrame:
    words = (docs.select(F.explode(
        F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"))
        .filter((F.length("w") >= 2) & (F.length("w") <= max_len))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w").limit(max_words))
    syms = F.concat(
        F.transform(F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.substr(F.col("w"), i, F.lit(1))),
        F.array(F.lit("</w>")))
    return words.select("w", "cnt", syms.alias("syms"))


def _apply_merge(syms, left: str, right: str):
    """Greedy left-to-right fold: array<string> column with every
    non-overlapping (left, right) adjacency fused."""
    def step(acc, x):
        last = F.when(F.size(acc) > 0,
                      F.element_at(acc, F.lit(-1))).otherwise(F.lit(""))
        fuse = (last == F.lit(left)) & (x == F.lit(right))
        return (F.when(fuse,
                       F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                                F.array(F.lit(left + right))))
                .otherwise(F.concat(acc, F.array(x))))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _safe_batch(rows) -> list:
    """Longest prefix of the sorted top-M pair rows that is provably
    the next merges WITHOUT recounting — the frequency-gap bound.

    After applying the accepted merges, (a) an old pair's count can
    only DECREASE, and it can change at all only if it shares a symbol
    with an accepted merge; (b) a NEW pair (one side is a merged
    token) inherits at most the count of a symbol-sharing old pair.
    So: scan in (freq desc, l, r) order, accepting while each
    candidate's symbols are disjoint from every previously accepted
    merge (incl. the fused token); the first symbol-sharing candidate
    (or, if none, the window edge) caps what any disturbed/new pair
    can reach — keep only accepted rows whose freq is STRICTLY above
    that cap (strict, because a tie could win the lexical
    tie-break after the counts shift). Row 1 is always safe."""
    syms: set[str] = set()
    accepted = []
    cap = rows[-1]["freq"]  # pairs below the window are <= this
    for i, r in enumerate(rows):
        l, rr = r["l"], r["r"]
        if i > 0 and (l in syms or rr in syms):
            cap = r["freq"]
            break
        accepted.append(r)
        syms.update((l, rr, l + rr))
    k = 1
    while k < len(accepted) and accepted[k]["freq"] > cap:
        k += 1
    return accepted[:k]


def _learn_driver(rows, n_merges: int) -> list:
    """The merge loop on the COLLECTED word table — the bounded-driver
    cutover (kmeans-centroid / cc.py ≤200k-edge pattern): the table is
    ≤ max_words rows BY CONSTRUCTION, so after the one distributed
    corpus pass the iteration is a pure-Python loop instead of
    n_merges Spark jobs of ~0.4 s fixed scheduling latency each.
    Identical semantics: integer pair counts weighted by word freq,
    selection (freq desc, l asc, r asc), greedy left-to-right
    non-overlapping application."""
    words = [(list(r["syms"]), int(r["cnt"])) for r in rows]
    out = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for syms, cnt in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, left, right, left + right, freq))
        for w, (syms, cnt) in enumerate(words):
            i, merged = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[w] = (merged, cnt)
    return out


def learn_bpe(docs: DataFrame, text_col: str = "text",
              n_merges: int = 8, max_words: int = 2000,
              max_len: int = 12, batch_window: int = 32,
              driver_cutover: int = 100_000) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns the merge table
    (step, left, right, merged, freq) — the artifact a tokenizer
    ships. Deterministic: integer pair counts, ties broken (freq desc,
    left asc, right asc); words bounded to the ``max_words`` most
    frequent (freq desc, word asc) of length [2, max_len].

    The corpus pass is always distributed (ONE scan builds the
    compressed word table). The merge loop then follows the repo's
    bounded-driver contract: when ``max_words <= driver_cutover`` the
    ≤max_words rows are collected once and merges run driver-side
    (:func:`_learn_driver` — same cutover rule as kmeans centroids and
    the ≤200k-edge graph loops); above the cutover each driver round
    collects the top ``batch_window`` pairs and accepts every merge
    the frequency-gap bound proves safe (:func:`_safe_batch`) —
    identical merge sequence either way."""
    from pyspark.sql.types import (IntegerType, LongType, StringType,
                                   StructField, StructType)
    merge_schema = StructType([
        StructField("step", IntegerType()),
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("merged", StringType()),
        StructField("freq", LongType())])
    if max_words <= driver_cutover:
        rows = _word_table(docs, text_col, max_words, max_len).collect()
        return docs.sparkSession.createDataFrame(
            _learn_driver(rows, n_merges), merge_schema)
    cur = _word_table(docs, text_col, max_words, max_len).cache()
    spark = docs.sparkSession
    out = []
    while len(out) < n_merges:
        pairs = cur.select(
            "cnt",
            F.explode(F.zip_with(
                F.slice(F.col("syms"), F.lit(1),
                        F.size("syms") - 1),
                F.slice(F.col("syms"), F.lit(2),
                        F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r"))))
            .alias("p"))
        top = (pairs.groupBy("p.l", "p.r")
               .agg(F.sum("cnt").alias("freq"))
               .orderBy(F.col("freq").desc(), "l", "r")
               .limit(batch_window).collect())
        if not top:
            break
        batch = _safe_batch(top)[: n_merges - len(out)]
        syms_col = F.col("syms")
        for row in batch:
            left, right = row["l"], row["r"]
            out.append((len(out) + 1, left, right, left + right,
                        int(row["freq"])))
            syms_col = _apply_merge(syms_col, left, right)
        cur = (cur.withColumn("syms", syms_col)
               .localCheckpoint(eager=False))
    return spark.createDataFrame(out, merge_schema)


def segment_words(docs: DataFrame, merges: list,
                  text_col: str = "text", max_len: int = 12,
                  max_words: int = 2000) -> DataFrame:
    """Apply a learned merge list to the word table — the tokenizer
    APPLICATION side: (w, cnt, pieces). Merge rules apply in learned
    order, the same greedy fold as training."""
    cur = _word_table(docs, text_col, max_words, max_len)
    syms = F.col("syms")
    for left, right in merges:
        syms = _apply_merge(syms, left, right)
    return cur.select("w", "cnt", syms.alias("pieces"))
