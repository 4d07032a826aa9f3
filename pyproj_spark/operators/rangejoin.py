"""Interval-overlap (range) join.

The 1-D temporal analogue of operators/rectjoin.py: two interval sets
join on overlap by exploding each interval into fixed-width buckets,
hash-equi-joining on the bucket, filtering the exact overlap predicate,
and collapsing duplicates with the responsibility-bucket rule (a pair
reports only from the bucket containing the overlap's left edge). This
is the operator behind session-vs-outage attribution, ad-slot overlap,
and contact-interval joins — the "range join" Spark itself plans as a
BroadcastNestedLoopJoin unless you decompose it.

Scale shape: explode factor = ceil(len/bucket) per interval (pick the
bucket near the median interval length), one shuffle (the bucket
equi-join), per-row dedup predicate — no post-join distinct. Integer
bounds end-to-end so the responsibility predicate is exact on any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cover(df: DataFrame, bucket: int, prefix: str) -> DataFrame:
    b = F.explode(F.sequence(F.floor(F.col("lo") / bucket),
                             F.floor(F.col("hi") / bucket))).alias("b")
    return df.select(*[F.col(c).alias(prefix + c) for c in df.columns], b)


def range_join(a: DataFrame, b: DataFrame, bucket: int = 3600) -> DataFrame:
    """All overlapping (a, b) interval pairs, each exactly once.

    Inputs carry (id, lo, hi) with INCLUSIVE integer bounds (touching
    intervals overlap). Output adds the exact overlap length
    ``ov_len`` (hi-exclusive convention: min(hi)-max(lo)+1)."""
    ca = _cover(a, bucket, "a_")
    cb = _cover(b, bucket, "b_")
    j = ca.join(cb, "b")
    lo = F.greatest("a_lo", "b_lo")
    hi = F.least("a_hi", "b_hi")
    keep = ((lo <= hi)
            & (F.col("b") == F.floor(lo / bucket)))
    return (j.filter(keep)
            .select("a_id", "b_id",
                    (hi - lo + 1).cast("long").alias("ov_len")))
