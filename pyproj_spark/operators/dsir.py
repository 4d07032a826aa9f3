"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
choose the raw-corpus documents whose hashed-n-gram feature profile
most resembles a target corpus, by importance weighting in a hashed
feature space and Gumbel-top-k resampling. This is the
pretraining-data selection stage that sits between dedup and mixing
in an LLM data pipeline.

Distributed shape (what must survive 100 TB):

* feature distributions: ONE corpus pass -> groupBy(bucket) with
  map-side partial aggregation; bucket cardinality is FIXED at
  ``n_buckets``, so the resulting table is tiny by construction and
  broadcasts;
* the smoothed per-bucket log-ratio log p_target(b) - log p_raw(b)
  is rounded once to exact integer MICROS, so every per-document
  weight is an exact-long sum — aggregation-order independent (the
  repo's distributed-float-sum convention);
* scoring: exploded tokens broadcast-join the bucket table; the only
  wide shuffle is the per-doc sum keyed by doc_id (high-cardinality,
  skew-free);
* resampling: Gumbel-top-k with md5 coins — deterministic across
  runs, partitionings, and engines — executed as orderBy+limit,
  which Spark runs as TakeOrdered (per-partition heaps + driver
  merge), never a global sort.

Hashing follows the sketch convention (operators/sketch.py): first 8
hex chars of md5 -> 32-bit int (Spark ``conv(h,16,10)``, DuckDB
``CAST('0x'||h AS BIGINT)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyproj_spark.operators.lm import _tokens

N_BUCKETS = 1024


def _bucket(col) -> F.Column:
    h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    return (h % F.lit(N_BUCKETS)).alias("bucket")


def bucket_log_ratios(docs: DataFrame, is_target,
                      text_col: str = "text") -> DataFrame:
    """(bucket, lr_micros): add-one-smoothed log p_target - log p_raw
    per hashed token bucket, rounded to exact integer micros.
    ``is_target`` is a boolean Column selecting the target corpus
    (its tokens also count toward the raw distribution, as in the
    paper's raw = full-corpus formulation)."""
    toks = _tokens(docs.select(text_col,
                               is_target.alias("_is_target")), text_col)
    per_bucket = (toks.groupBy(_bucket(F.col("token")))
                  .agg(F.sum(F.when(F.col("_is_target"), 1)
                             .otherwise(0)).alias("ct"),
                       F.count("*").alias("cr")))
    # materialize the FIXED-size (n_buckets-row) table once: it has
    # two consumers (totals + the ratio projection) and each would
    # otherwise re-run the whole corpus tokenize pass
    per_bucket = per_bucket.localCheckpoint(eager=False)
    totals = per_bucket.agg(F.sum("ct").alias("tt"),
                            F.sum("cr").alias("tr"))
    b = F.lit(float(N_BUCKETS))
    lr = (F.log((F.col("ct") + 1.0) / (F.col("tt") + b))
          - F.log((F.col("cr") + 1.0) / (F.col("tr") + b)))
    return (per_bucket.crossJoin(F.broadcast(totals))
            .select("bucket",
                    F.round(lr * 1e6).cast("long").alias("lr_micros")))


def dsir_weights(docs: DataFrame, ratios: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_toks, w_micros): per-document importance log-weight as
    an exact long (sum of per-token bucket log-ratio micros). Docs
    whose tokens all miss the ratio table (impossible when ratios
    came from the same corpus) score 0."""
    toks = _tokens(docs.select(id_col, text_col), text_col)
    scored = (toks.select(id_col, _bucket(F.col("token")))
              .join(F.broadcast(ratios), "bucket")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_toks"),
                   F.sum("lr_micros").alias("w_micros")))
    return (docs.select(id_col).join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
                    F.coalesce("w_micros", F.lit(0)).alias("w_micros")))


def gumbel_topk(weights: DataFrame, k: int, id_col: str = "doc_id",
                salt: str = "dsir") -> DataFrame:
    """Gumbel-top-k resampling: key = log w + Gumbel(0,1) with a
    deterministic md5 coin per id; the k largest keys are an exact
    sample-without-replacement from softmax(log w) — reproducible
    across runs, partitionings, and engines."""
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + ":"),
                       F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("double") + 0.5) / F.lit(4294967296.0))
    g = -F.log(-F.log(u))
    key = F.col("w_micros") / F.lit(1e6) + g
    return (weights.withColumn("sel_key", key)
            .orderBy(F.col("sel_key").desc(), id_col)
            .limit(k))
