"""MERGE / upsert (CDC apply) — what Iceberg's ``MERGE INTO`` and a
Delta upsert compile to, expressed engine-side so the pattern works
on plain parquet tables too.

SCD-1 semantics over a change feed with an ``_op`` column:
  * ``upsert`` rows replace the matched target row (or insert when
    no target row exists);
  * ``delete`` rows remove the matched target row (a delete for an
    absent key is a no-op);
  * untouched target rows pass through.

Plan: ONE full-outer shuffle join on the merge key — the same shape
Iceberg's copy-on-write MERGE plans — with per-column coalesce
resolution. The key is unique on both sides by contract (a change
feed is deduped to latest-per-key upstream; see first_seen /
asof-style compaction), so the join never fans out. At 10^12 rows
the refinement is partition pruning: bucket both sides by the key so
the join is shuffle-free, and only rewrite files whose buckets
contain source keys — the plumbing here is the inner loop of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame,
                 key_cols: list[str], op_col: str = "_op"
                 ) -> DataFrame:
    """Apply a deduped change feed to the target; returns the merged
    state with the target's schema."""
    data_cols = [c for c in target.columns if c not in key_cols]
    src = source.select(
        *[F.col(c).alias(f"_s_{c}") for c in key_cols],
        *[F.col(c).alias(f"_s_{c}") for c in data_cols],
        F.col(op_col).alias("_s_op"))
    cond = None
    for k in key_cols:
        c = target[k] == src[f"_s_{k}"]
        cond = c if cond is None else (cond & c)
    joined = target.join(src, cond, "full_outer")
    # delete: matched target row with a delete op vanishes; a delete
    # with no target row contributes nothing either
    kept = joined.filter(
        F.coalesce(F.col("_s_op") != F.lit("delete"), F.lit(True)))
    out_cols = []
    for k in key_cols:
        out_cols.append(F.coalesce(target[k], F.col(f"_s_{k}"))
                        .alias(k))
    for c in data_cols:
        out_cols.append(
            F.when(F.col("_s_op") == "upsert", F.col(f"_s_{c}"))
            .otherwise(target[c]).alias(c))
    return kept.select(*out_cols)
