"""Deterministic sampling for training-data curation.

Production corpus pipelines sample with a HASH of a stable key, not an
RNG: the same document set always yields the same sample (reruns,
backfills, and resumed jobs agree), rates can differ per stratum
(language/domain balancing), and no sampler state is shipped. The
hash is md5-based so the DuckDB oracle reproduces the exact row set —
`Spark.sample()`'s RNG could never be cross-engine-gated.

Everything is native Catalyst: one filter per row for the sampler, a
broadcast map lookup for per-stratum rates. No shuffle is introduced
by sampling itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sampling-hash resolution: rates are quantized to 1/DENOM
DENOM = 1_000_000


def sample_hash(key: Column, salt: str = "sample") -> Column:
    """Uniform-ish bucket in [0, DENOM) from md5(salt:key) — the
    deterministic coin every sampling decision is made with."""
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))),
        1, 12), 16, 10).cast("long")
    return F.pmod(h, F.lit(DENOM))


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id",
                         salt: str = "sample") -> DataFrame:
    """Keep ~fraction of rows, decided per row by the key hash —
    reproducible across runs, partitionings, and engines."""
    cut = int(round(fraction * DENOM))
    return df.filter(sample_hash(F.col(key_col), salt) < cut)


def stratified_sample(df: DataFrame, rates: dict,
                      stratum_col: str = "lang",
                      key_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling (language/domain balancing):
    ``rates`` maps stratum value -> keep fraction; unlisted strata get
    ``default_rate``. One filter, no shuffle, no sampler state."""
    cut = F.lit(int(round(default_rate * DENOM)))
    for value, rate in sorted(rates.items()):
        cut = F.when(F.col(stratum_col) == value,
                     F.lit(int(round(rate * DENOM)))).otherwise(cut)
    return df.filter(sample_hash(F.col(key_col), salt) < cut)


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    stratum_col: str | None = None,
                    key_col: str = "doc_id",
                    salt: str = "wsample") -> DataFrame:
    """Deterministic weighted sampling without replacement (A-Res,
    Efraimidis & Spirakis, "Weighted random sampling with a
    reservoir", IPL 2006 — public): each row gets key u^(1/w); the k
    largest keys are a weighted-without-replacement sample. Where the
    paper draws u from an RNG, this derives u from md5(salt:key) —
    the same run-/partitioning-/engine-reproducibility contract as
    the uniform samplers above, which is what lets backfills agree
    and an oracle replay the exact kept-row set.

    Ranking uses ln(u)/w (monotone in u^(1/w), numerically tamer),
    ROUNDED to 9 decimals with key tie-break so the order is
    cross-engine stable. Per-stratum when ``stratum_col`` is given
    (top-k within each stratum — quality-proportional corpus
    subsetting per language/domain); top-k via window, which is one
    shuffle on the stratum key.

    Weights must be > 0."""
    from pyspark.sql import Window
    u = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(salt),
                          F.col(key_col).cast("string"))),
        1, 15), 16, 10).cast("double") + 1.0) / F.lit(float(1 << 60))
    rk = F.round(F.log(u) / F.col(weight_col), 9)
    part = [stratum_col] if stratum_col else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(F.col("_akey").desc(),
                                          F.col(key_col))
    return (df.withColumn("_akey", rk)
            .withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") <= k)
            .drop("_akey", "_rank"))


def weighted_sample_sql(table_expr: str, k: int, weight_expr: str,
                        stratum_expr: str = "1",
                        key_expr: str = "doc_id",
                        salt: str = "wsample") -> str:
    """DuckDB oracle replaying the identical A-Res keys and ranking."""
    u = (f"((CAST(('0x' || substr(md5('{salt}:' || "
         f"CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0) "
         f"/ {float(1 << 60)!r})")
    return f"""
SELECT * EXCLUDE (_akey, _rank) FROM (
  SELECT *, round(ln({u}) / ({weight_expr}), 9) AS _akey,
         row_number() OVER (PARTITION BY {stratum_expr}
                            ORDER BY round(ln({u}) / ({weight_expr}),
                                           9) DESC,
                            {key_expr}) AS _rank
  FROM {table_expr}
) WHERE _rank <= {k}
"""
