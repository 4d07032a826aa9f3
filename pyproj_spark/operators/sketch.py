"""Deterministic HyperLogLog distinct-count sketch.

THE 100-TB cardinality tool: a count(DISTINCT x) over a petabyte
corpus shuffles every distinct value; an HLL shuffles m=2^p small
integers per group, and register vectors MERGE with element-wise max —
associative and commutative, so partial aggregation, multi-level
combines, and cross-day sketch unions are all free (Flajolet et al.,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm", AofA 2007 — public).

Spark ships approx_count_distinct, but its internal hash makes the
result engine-private. This implementation is DETERMINISTIC end to
end — md5-derived 60-bit hash, bit-length register rank (string
length of bin(w): exact integer logic, no floating log2), and an
EXACT INTEGER harmonic sum (each register contributes the long
2^(52-M), so the sum is associative and replayable) — which is what
lets a DuckDB oracle reproduce the estimate bit-for-bit, and makes
sketches comparable across engines and runs.

Registers: idx = top p bits of the 60-bit hash, w = low (60-p) bits,
rho(w) = leading zeros of w within (60-p) bits + 1 = (60-p+1) -
bitlength(w). Estimate: alpha_m * m^2 / sum(2^-M_j), scaled by 2^W
(W = 60 - p) so the harmonic sum is the exact long
sum(2^(W+1-M_j))·2^(... ) — concretely each register adds
1 << (W + 1 - M) with empty registers adding 1 << (W + 1), and the
constant C = alpha_m * m^2 * 2^(W+1) divides that sum. Small-range
linear counting below 2.5m with zero registers present. (No 32-bit
large-range correction: the hash space is 60-bit, where collision
bias is negligible until ~2^30 distinct.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 9               # 2^9 = 512 registers -> ~4.6% standard error
M = 1 << P
W = 60 - P          # rank bits of the 60-bit (15 hex chars) md5 hash
ALPHA = 0.7213 / (1 + 1.079 / M)
#: numerator of the raw estimate, one exact double literal shared by
#: Spark, DuckDB and Python: alpha_m * m^2 * 2^(W+1)
C_NUM = ALPHA * M * M * float(1 << (W + 1))
LC_THRESH = 2.5 * M


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 round_to: int = 4) -> DataFrame:
    """Per-group HLL distinct estimate of ``value_col``.

    Returns (group_col, hll_est, zeros) — zeros = empty registers
    (exposed because the linear-counting branch depends on it).
    Plan: narrow hash/register projection (no distinct, no wide
    shuffle of values) -> groupBy(group, idx).max(rho) (partial-agg,
    at most m rows per group survive the map side) -> per-group exact
    integer harmonic sum -> closed-form estimate.
    """
    h = F.md5(F.col(value_col).cast("string"))
    v = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    idx = F.shiftright(v, W)
    w = v.bitwiseAND(F.lit((1 << W) - 1))
    rho = (F.when(w == 0, F.lit(W + 1))
           .otherwise(F.lit(W + 1) - F.length(F.bin(w))))
    regs = (df.select(F.col(group_col), idx.alias("idx"),
                      rho.alias("rho"))
            .groupBy(group_col, "idx")
            .agg(F.max("rho").alias("mx")))
    g = (regs.groupBy(group_col)
         .agg(F.sum(F.expr(f"shiftleft(1L, {W + 1} - mx)")).alias("sp"),
              F.count(F.lit(1)).alias("npres")))
    zeros = F.lit(M) - F.col("npres")
    s = F.col("sp") + zeros * F.lit(1 << (W + 1))
    raw = F.lit(C_NUM) / s
    est = F.when((raw <= F.lit(LC_THRESH)) & (zeros > 0),
                 F.lit(float(M)) * F.log(F.lit(float(M)) / zeros)) \
        .otherwise(raw)
    return g.select(F.col(group_col),
                    F.round(est, round_to).alias("hll_est"),
                    zeros.cast("long").alias("zeros"))


def hll_sql(table_expr: str, group_col: str, value_col: str,
            round_to: int = 4) -> str:
    """DuckDB oracle computing the identical registers and estimate."""
    v = (f"CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), "
         f"1, 15)) AS BIGINT)")
    w = f"({v} & {(1 << W) - 1})"
    rho = (f"(CASE WHEN {w} = 0 THEN {W + 1} "
           f"ELSE {W + 1} - length(bin({w})) END)")
    return f"""
WITH regs AS (
  SELECT {group_col}, ({v} >> {W}) AS idx, max({rho}) AS mx
  FROM {table_expr} GROUP BY 1, 2
),
g AS (
  SELECT {group_col},
         sum(1::BIGINT << ({W + 1} - mx)) AS sp,
         count(*) AS npres
  FROM regs GROUP BY 1
)
SELECT {group_col},
       round(CASE WHEN {C_NUM!r} / (sp + ({M} - npres)
                       * (1::BIGINT << {W + 1})) <= {LC_THRESH!r}
                   AND {M} - npres > 0
             THEN {float(M)!r} * ln({float(M)!r} / ({M} - npres))
             ELSE {C_NUM!r} / (sp + ({M} - npres)
                               * (1::BIGINT << {W + 1}))
             END, {round_to}) AS hll_est,
       CAST({M} - npres AS BIGINT) AS zeros
FROM g
"""
