"""Sequence packing — the final prep stage of an LLM training
pipeline: the token stream of the (ordered) corpus is concatenated
and cut into fixed-capacity training sequences; documents straddle
boundaries (attention-mask resets handle that downstream), so no
token is padded away and every bin is exactly full except the last.

The distributed form is window arithmetic, not stateful streaming:
a running token offset per document (one global-order window), then
each document explodes into the bins it touches with its per-bin
token contribution — all native expressions.

Scale note: the global orderBy window range-partitions by the sort
key, so the cumsum is distributed (Spark's WindowExec handles
unbounded-preceding sums per range partition with a prefix pass);
for 10^12 docs you run the same arithmetic per shard (e.g. per
Z-order bucket from functions/zorder.py) and offset bins by shard —
packing quality is unchanged because bins never cross shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   capacity: int = 2048) -> DataFrame:
    """Per-bin packing stats: (bin, n_docs, n_tokens, fill). Bins are
    full by construction except the final one; n_docs counts every
    document contributing at least one token to the bin."""
    d = df.filter(F.col(tokens_col) > 0)
    w = Window.orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    spans = (d.withColumn("_start", start)
             .withColumn("_end", F.col("_start") + F.col(tokens_col))
             .withColumn("bin", F.explode(F.sequence(
                 F.floor(F.col("_start") / capacity),
                 F.floor((F.col("_end") - 1) / capacity)))))
    contrib = (F.least(F.col("_end"), (F.col("bin") + 1) * capacity)
               - F.greatest(F.col("_start"), F.col("bin") * capacity))
    return (spans.withColumn("_c", contrib)
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_c").alias("n_tokens"),
                 F.round(F.sum("_c") / capacity, 6).alias("fill")))


def stride_mix(df: DataFrame, weights: dict, stratum_col: str = "source",
               id_col: str = "doc_id", round_to: int = 6) -> DataFrame:
    """Deterministic training-data mixing via stride scheduling
    (Waldspurger & Weihl, OSDI 1994 — public; the same interleave
    rule behind weighted fair queueing): each stratum emits its
    documents at positions (rank - 0.5) / weight, so sorting by
    position yields a stream whose LOCAL mixture matches the target
    weights everywhere — not just in expectation like sampling, and
    not in blocks like concatenation (which trains on one source for
    millions of steps before the next). Epoch boundaries are honest
    too: a stratum with weight 2x finishes its pass 2x sooner and the
    caller sees that in the position range.

    One rank window per stratum (single shuffle on the stratum key);
    the position IS the global order — no global row_number
    bottleneck. Returns (id_col, stratum_col, pos)."""
    from pyspark.sql import Window
    w = Window.partitionBy(stratum_col).orderBy(id_col)
    wexpr = F.lit(None).cast("double")
    for k, v in sorted(weights.items()):
        wexpr = F.when(F.col(stratum_col) == k,
                       F.lit(float(v))).otherwise(wexpr)
    return (df.select(id_col, stratum_col)
            .withColumn("_r", F.row_number().over(w))
            .filter(wexpr.isNotNull())
            .select(id_col, stratum_col,
                    F.round((F.col("_r") - 0.5) / wexpr, round_to)
                    .alias("pos")))
