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


def scd2_apply(history: DataFrame, changes: DataFrame,
               key_cols: list[str], attr_cols: list[str],
               ts_col: str = "ts",
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """SCD-2 (slowly-changing-dimension type 2) batch apply: rows in
    ``changes`` whose attributes DIFFER from the key's current
    version close that version (valid_to = change ts) and open a new
    one; no-op changes (same attributes) leave history untouched —
    the invariant that distinguishes SCD-2 from an append log.
    ``changes`` must hold one row per key (dedupe to latest
    upstream).

    Plan: the change batch joins the CURRENT slice only (a filter on
    valid_to IS NULL — at scale this is the partition an SCD-2 table
    is stored clustered by), one shuffle join on the key, a union of
    three legs (untouched + closed + opened). History rows are never
    mutated in place — the output is the next snapshot, Iceberg
    style."""
    cur = history.filter(F.col(valid_to).isNull())
    old = history.filter(F.col(valid_to).isNotNull())
    ch = changes.select(
        *[F.col(c).alias(f"_c_{c}") for c in key_cols],
        *[F.col(c).alias(f"_c_{c}") for c in attr_cols],
        F.col(ts_col).alias("_c_ts"))
    cond = None
    for k in key_cols:
        c = cur[k] == ch[f"_c_{k}"]
        cond = c if cond is None else (cond & c)
    j = cur.join(ch, cond, "full_outer")
    differs = None
    for a in attr_cols:
        d = ~cur[a].eqNullSafe(ch[f"_c_{a}"])
        differs = d if differs is None else (differs | d)
    is_cur = cur[key_cols[0]].isNotNull()
    is_ch = ch[f"_c_{key_cols[0]}"].isNotNull()
    # leg 1: current rows — closed when a differing change matched
    kept_cur = j.filter(is_cur).select(
        *[cur[c] for c in key_cols + attr_cols],
        cur[valid_from].alias(valid_from),
        F.when(is_ch & differs, F.col("_c_ts"))
        .otherwise(F.lit(None).cast(cur.schema[valid_from].dataType))
        .alias(valid_to))
    # leg 2: new versions — differing changes and brand-new keys
    opened = j.filter(is_ch & (~is_cur | differs)).select(
        *[F.coalesce(cur[c], F.col(f"_c_{c}")).alias(c)
          for c in key_cols],
        *[F.col(f"_c_{c}").alias(c) for c in attr_cols],
        F.col("_c_ts").alias(valid_from),
        F.lit(None).cast(cur.schema[valid_from].dataType)
        .alias(valid_to))
    return old.unionByName(kept_cur).unionByName(opened)


def scd2_as_of(history: DataFrame, at, valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Time travel over an SCD-2 history: the state visible at ``at``
    (valid_from <= at < valid_to, open intervals included). A single
    filter — at scale this prunes to the partitions whose validity
    ranges cover ``at`` when the table is range-partitioned on
    valid_from."""
    return history.filter(
        (F.col(valid_from) <= F.lit(at))
        & (F.col(valid_to).isNull() | (F.col(valid_to) > F.lit(at)))) \
        .drop(valid_from, valid_to)
