"""Distributed k-means (Lloyd's algorithm) — the iterative-ML shape
on Spark: per iteration ONE job whose assignment stage broadcasts the
K centroids as literal arrays (plan-embedded, no Python crossing) and
whose update stage is an explode + hash aggregate; the K x dim
centroid matrix (a few KB) is the only thing that ever reaches the
driver, exactly MLlib's topology.

Determinism contract (what lets a SQL oracle replay it):
  * init = the first K vectors by id (k-means|| trades determinism
    for quality; a seeded variant can be layered on, documented);
  * centroids are ROUNDED to ``round_to`` decimals after every
    update, so the 1e-13-level float-sum-order noise of distributed
    averaging can never leak into the next iteration's comparisons;
  * assignment distances are rounded the same way and ties break to
    the lowest cluster index.
Empty clusters keep their previous centroid (the standard choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "v", round_to: int = 6
                    ) -> DataFrame:
    """Adds ``cluster`` (argmin of rounded squared distance, ties to
    the lowest index) and ``dist2`` columns. The centroids embed as
    ONE nested literal array and the argmin is array_min +
    array_position (first index wins ties — identical semantics to a
    K-way when-chain but with O(K·dim) smaller codegen: a chain of K
    separate fold expressions measured ~3x slower at K=8, dim=64)."""
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                      for c in centroids])
    dists = F.transform(
        cents,
        lambda c: F.round(F.aggregate(
            F.zip_with(F.col(vec_col), c,
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x), round_to))
    staged = df.withColumn("_d", dists)
    best = F.array_min(F.col("_d"))
    return (staged
            .withColumn("cluster",
                        (F.array_position(F.col("_d"), best) - 1)
                        .cast("int"))
            .withColumn("dist2", best)
            .drop("_d"))


def farthest_first_init(df: DataFrame, k: int, vec_col: str = "v",
                        id_col: str = "vec_id",
                        round_to: int = 6) -> list[list[float]]:
    """Deterministic k-means++-style seeding WITHOUT randomness:
    start from the lowest-id vector and repeatedly take the point
    farthest from its nearest chosen centroid (ties to the lowest
    id). This is farthest-first traversal — the classic 2-approx for
    k-center — and, unlike first-K init, it spans well-separated
    clusters regardless of row order. One max_by job per seed; k is
    small, so the driver loop is k lightweight actions."""
    emb = df.select(id_col, F.col(vec_col).alias("v"))
    first = emb.orderBy(id_col).limit(1).collect()[0]
    cents = [list(first.v)]
    for _ in range(k - 1):
        scored = assign_clusters(emb, cents, round_to=round_to)
        far = (scored
               .orderBy(F.col("dist2").desc(), F.col(id_col))
               .limit(1).collect()[0])
        cents.append(list(far.v))
    return cents


def kmeans_fit(df: DataFrame, vec_col: str = "v", k: int = 8,
               iters: int = 2, id_col: str = "vec_id",
               round_to: int = 6,
               init: str = "first") -> list[list[float]]:
    """Lloyd's iterations; returns the final rounded centroids.
    ``init``: "first" (first K by id — SQL-replayable, used by the
    oracle-gated query) or "farthest" (farthest-first traversal —
    deterministic and row-order-robust, the quality choice)."""
    emb = df.select(id_col, F.col(vec_col).alias("v"))
    if init == "farthest":
        cents = farthest_first_init(df, k, vec_col, id_col, round_to)
    elif init == "first":
        cents = [list(r.v) for r in
                 emb.orderBy(id_col).limit(k).collect()]
    else:
        raise ValueError(f"init must be first|farthest: {init}")
    for _ in range(iters):
        assigned = assign_clusters(emb, cents)
        rows = (assigned
                .select("cluster", F.posexplode("v")
                        .alias("dim", "val"))
                .groupBy("cluster", "dim")
                .agg(F.round(F.avg("val"), round_to).alias("m"))
                .collect())
        nxt = [list(c) for c in cents]  # empty cluster: keep old
        by_c: dict[int, dict[int, float]] = {}
        for r in rows:
            by_c.setdefault(r.cluster, {})[r.dim] = r.m
        for c, dims in by_c.items():
            for d, m in dims.items():
                nxt[c][d] = m
        cents = nxt
    return cents


def kmeans(df: DataFrame, vec_col: str = "v", k: int = 8,
           iters: int = 2, id_col: str = "vec_id",
           round_to: int = 6) -> DataFrame:
    """Fit + final assignment: (id, cluster, dist2) for every row."""
    cents = kmeans_fit(df, vec_col, k, iters, id_col, round_to)
    emb = df.select(id_col, F.col(vec_col).alias("v"))
    return assign_clusters(emb, cents, round_to=round_to) \
        .select(id_col, "cluster", "dist2")
