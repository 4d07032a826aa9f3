"""As-of (nearest-predecessor) temporal join — a core operator Spark's
built-in join surface lacks (pandas has merge_asof, DuckDB has ASOF
JOIN, kdb has aj).

Implementation is the scale-safe union + running-window construction,
NOT a range self-join:

  1. tag left rows side=1 and right rows side=0, union them with a
     common (key, ts) prefix and side-specific payload structs;
  2. one window per key ordered by (ts, side) carries the most recent
     right payload forward with last(..., ignorenulls=True) over an
     UNBOUNDED PRECEDING .. CURRENT ROW running frame — right rows
     sort before left rows at equal ts, so the match is inclusive
     (right_ts <= left_ts), exactly DuckDB's ASOF semantics;
  3. keep only left rows and optionally null out matches older than
     `tolerance_us`.

Cost model: ONE shuffle on the key (the union is shuffle-free), no
intermediate blow-up — each row is touched once, vs the O(|L|·|R|)
candidate explosion of a naive range join.  At 100 TB the hazard is a
single hot key serializing its window partition; mitigate upstream by
salting the key with a coarse time bucket and as-of joining within the
bucket (carrying the previous bucket's tail), the standard refinement —
out of scope here because web-event keys (user/session) are
high-cardinality by construction.

`direction="forward"` flips the window order to match the earliest
right row with right_ts >= left_ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance_us: int | None = None,
              right_payload: list[str] | None = None,
              right_prefix: str = "r_") -> DataFrame:
    """For each left row, attach the nearest right row per `on` key at
    or before (backward) / at or after (forward) the left timestamp.

    Right-side (key, ts) duplicates must be resolved by the caller
    (e.g. max_by) — the match would otherwise be ordering-dependent.

    Output: all left columns, then `<right_prefix><col>` for each
    payload column and `<right_prefix><right_ts>`; unmatched left rows
    keep nulls (left-outer semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    rp = right_payload or [c for c in right.columns
                           if c not in (on, right_ts)]

    lstruct = F.struct(*[F.col(c) for c in left.columns])
    rstruct = F.struct(F.col(right_ts).alias("_mts"),
                       *[F.col(c) for c in rp])
    ltype = left.select(lstruct.alias("_l")).schema["_l"].dataType
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType

    l2 = left.select(F.col(on).alias("_k"), F.col(left_ts).alias("_ots"),
                     F.lit(1).alias("_side"), lstruct.alias("_l"),
                     F.lit(None).cast(rtype).alias("_r"))
    r2 = right.select(F.col(on).alias("_k"), F.col(right_ts).alias("_ots"),
                      F.lit(0).alias("_side"),
                      F.lit(None).cast(ltype).alias("_l"),
                      rstruct.alias("_r"))
    u = l2.unionByName(r2)

    order = [F.col("_ots").asc(), F.col("_side").asc()] \
        if direction == "backward" \
        else [F.col("_ots").desc(), F.col("_side").asc()]
    w = (Window.partitionBy("_k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)) \
        .filter(F.col("_side") == 1)

    if tolerance_us is not None:
        # unix_micros rejects TIMESTAMP_NTZ (the usual parquet type);
        # the NTZ->TZ cast shifts both operands by the same session-tz
        # offset, so the difference is exact either way
        def _us(c):
            return F.unix_micros(c.cast("timestamp"))

        gap = (_us(F.col("_ots")) - _us(F.col("_m._mts"))) \
            if direction == "backward" else \
            (_us(F.col("_m._mts")) - _us(F.col("_ots")))
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(tolerance_us), F.col("_m")))

    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rp]
    out_cols.append(F.col("_m._mts").alias(f"{right_prefix}{right_ts}"))
    return matched.select(*out_cols)
