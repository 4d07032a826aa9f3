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
    from pyproj_spark.operators.similarity import _dlit
    cents = _dlit(centroids)  # one parse, not K*dim py4j lit() calls
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


def kmeans_parallel_init(df: DataFrame, k: int, vec_col: str = "v",
                         id_col: str = "vec_id", l: int | None = None,
                         rounds: int = 3, round_to: int = 6
                         ) -> list[list[float]]:
    """Deterministic k-means|| seeding (Bahmani et al., "Scalable
    k-means++", VLDB 2012 — public): each of ``rounds`` passes
    oversamples ~``l`` candidates with probability l*d²(x)/cost — the
    k-means++ distribution taken in parallel, which is what makes the
    classic sequential k-means++ (k driver round-trips over the full
    corpus) feasible on a cluster: O(rounds) full scans instead of
    O(k).

    Where the paper flips random coins, this flips md5 coins —
    u(x) = hash(round, id)/2^60 — and computes the cost denominator as
    an EXACT integer-micros sum, so the sampled candidate set (and
    therefore the final centroids) is reproducible across runs,
    partitionings, and engines; no determinism-for-quality trade.

    The ~rounds*l candidates are weighted by the size of their nearest-
    candidate cells (one job) and reduced to k driver-side with
    weighted Lloyd iterations seeded by the top-k weights (the paper's
    'recluster the candidates' step; candidates are K-scale, not
    corpus-scale, so driver numpy is the right venue)."""
    import numpy as np
    l = l or 2 * k
    emb = df.select(id_col, F.col(vec_col).alias("v"))
    first = emb.orderBy(id_col).limit(1).collect()[0]
    cands = [list(first.v)]
    for t in range(rounds):
        scored = assign_clusters(emb, cands, round_to=round_to)
        cost = (scored.agg(F.sum(
            F.round(F.col("dist2") * 1e6).cast("long"))).first()[0])
        if not cost:
            break
        u = (F.conv(F.substring(F.md5(F.concat(
            F.lit(f"kmpar:{t}:"), F.col(id_col).cast("string"))),
            1, 15), 16, 10).cast("double") / F.lit(float(1 << 60)))
        p = (F.lit(float(l)) * F.round(F.col("dist2") * 1e6)
             / F.lit(float(cost)))
        picked = (scored.filter(u < p).orderBy(id_col)
                  .select("v").collect())
        cands.extend(list(r.v) for r in picked)
    if len(cands) <= k:
        return [list(c) for c in cands]
    # weight candidates by nearest-cell population, reduce driver-side
    wrows = (assign_clusters(emb, cands, round_to=round_to)
             .groupBy("cluster").agg(F.count(F.lit(1)).alias("w"))
             .collect())
    w = np.zeros(len(cands))
    for r in wrows:
        w[r.cluster] = r.w
    C = np.array(cands)
    order = np.lexsort((np.arange(len(cands)), -w))
    cents = C[order[:k]].copy()
    for _ in range(5):  # weighted Lloyd over the candidate set
        d2 = ((C[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            m = (a == j) & (w > 0)
            if m.any():
                cents[j] = (C[m] * w[m, None]).sum(axis=0) / w[m].sum()
    return [[round(float(x), round_to) for x in c] for c in cents]


def kmeans_fit(df: DataFrame, vec_col: str = "v", k: int = 8,
               iters: int = 2, id_col: str = "vec_id",
               round_to: int = 6,
               init: str = "first") -> list[list[float]]:
    """Lloyd's iterations; returns the final rounded centroids.
    ``init``: "first" (first K by id — SQL-replayable, used by the
    oracle-gated query), "farthest" (farthest-first traversal —
    deterministic, row-order-robust), or "parallel" (md5-coin
    k-means|| — the cluster-scale quality seeding, O(rounds) scans
    instead of k-means++'s O(k), still fully deterministic)."""
    # cache the projected vector column ONCE: every Lloyd pass (and
    # the "first" init collect) re-reads it; without the cache each
    # pass re-scans the source — at corpus scale that is iters extra
    # full reads of the embedding table
    emb = df.select(id_col, F.col(vec_col).alias("v")).cache()
    try:
        if init == "farthest":
            cents = farthest_first_init(df, k, vec_col, id_col, round_to)
        elif init == "parallel":
            cents = kmeans_parallel_init(df, k, vec_col, id_col,
                                         round_to=round_to)
        elif init == "first":
            cents = [list(r.v) for r in
                     emb.orderBy(id_col).limit(k).collect()]
        else:
            raise ValueError(
                f"init must be first|farthest|parallel: {init}")
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
    finally:
        emb.unpersist()


def kmeans(df: DataFrame, vec_col: str = "v", k: int = 8,
           iters: int = 2, id_col: str = "vec_id",
           round_to: int = 6) -> DataFrame:
    """Fit + final assignment: (id, cluster, dist2) for every row."""
    cents = kmeans_fit(df, vec_col, k, iters, id_col, round_to)
    emb = df.select(id_col, F.col(vec_col).alias("v"))
    return assign_clusters(emb, cents, round_to=round_to) \
        .select(id_col, "cluster", "dist2")
