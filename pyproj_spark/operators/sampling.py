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
