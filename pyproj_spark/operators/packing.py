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
