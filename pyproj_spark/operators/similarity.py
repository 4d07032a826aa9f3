"""Embedding similarity search (driver-mandated family).

* cosine_topk — exact brute-force top-k per query against a broadcast
  query set: the dot product is a native ``zip_with``+``aggregate`` fold
  (sequential, so engines agree bit-for-bit after rounding), ranked on
  the ROUNDED similarity with an id tie-break for cross-engine
  determinism.
* simhash_buckets — random-hyperplane LSH bucketing: the scale path.
  Hyperplanes are deterministic pseudo-vectors derived from md5 of
  (plane, dim) so no driver-side data is shipped; bucket id is the sign
  pattern. ANN = equi-join on bucket then exact re-rank inside buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                id_col: str = "vec_id", qid_col: str = "qid",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine for each query row. queries is broadcast
    (the query set is small by construction)."""
    e = embeddings.select(F.col(id_col),
                          F.col(vec_col).cast("array<double>").alias("_v"))
    q = queries.select(F.col(qid_col),
                       F.col(vec_col).cast("array<double>").alias("_q"))
    cand = e.join(F.broadcast(q), F.col(id_col) != F.col(qid_col))
    cand = cand.withColumn(
        "sim", F.round(cosine(F.col("_v"), F.col("_q")), 6))
    w = Window.partitionBy(qid_col).orderBy(F.desc("sim"), id_col)
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, "rank", id_col, "sim"))


def _plane_component(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-gaussian-ish component in [-1, 1): derived
    from md5(plane:dim) — reproducible on any engine, no shipped data."""
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(str(plane)), dim_idx.cast("string"))), 1, 8), 16, 10) \
        .cast("long")
    return (h % 20001 - 10000) / 10000.0


def simhash_buckets(embeddings: DataFrame, n_planes: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """Adds a `bucket` column: n_planes-bit random-hyperplane signature.
    Vectors in the same bucket are ANN candidates (equi-join key)."""
    v = F.col(vec_col).cast("array<double>")
    idx = F.sequence(F.lit(0), F.size(v) - 1)

    def _proj(p: int):
        # closure, not default-arg lambda (PySpark infers HOF arity)
        return lambda x, i: x * _plane_component(p, i)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        comp = F.zip_with(v, idx, _proj(p))
        s = F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket.bitwiseOR(
            F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), p))
            .otherwise(F.lit(0).cast("long")))
    return embeddings.withColumn("bucket", bucket)


def ann_topk_lsh(embeddings: DataFrame, k: int = 3, n_planes: int = 6,
                 id_col: str = "vec_id", vec_col: str = "embedding"
                 ) -> DataFrame:
    """Bucketed ANN self-join: candidates share an LSH bucket; exact
    cosine re-rank inside buckets. Recall grows as n_planes shrinks."""
    b = simhash_buckets(embeddings, n_planes, id_col, vec_col)
    a_side = b.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).cast("array<double>").alias("_va"),
                      "bucket")
    b_side = b.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).cast("array<double>").alias("_vb"),
                      "bucket")
    cand = (a_side.join(b_side, "bucket")
            .filter(F.col("id_a") != F.col("id_b"))
            .withColumn("sim", F.round(cosine(F.col("_va"),
                                              F.col("_vb")), 6)))
    w = Window.partitionBy("id_a").orderBy(F.desc("sim"), "id_b")
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id_a", "rank", "id_b", "sim"))
