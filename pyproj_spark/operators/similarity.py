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
    # norms hoisted to one pass per VECTOR (not per pair): same
    # sqrt/product/round ops on the same values, ~3x fewer
    # interpreted fold steps in the pair stage
    e = embeddings.select(F.col(id_col),
                          F.col(vec_col).cast("array<double>").alias("_v")) \
        .withColumn("_ne", _norm(F.col("_v")))
    q = queries.select(F.col(qid_col),
                       F.col(vec_col).cast("array<double>").alias("_q")) \
        .withColumn("_nq", _norm(F.col("_q")))
    cand = e.join(F.broadcast(q), F.col(id_col) != F.col(qid_col))
    cand = cand.withColumn(
        "sim", F.round(_dot(F.col("_v"), F.col("_q"))
                       / (F.col("_ne") * F.col("_nq")), 6))
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


def _plane_components_py(plane: int, dim: int) -> list:
    """The same md5(plane:dim)-derived components computed driver-side
    (hashlib) — they are DATA-INDEPENDENT, so when the embedding
    dimensionality is known they ship as literal arrays instead of
    being re-derived per element per row (8 centroids x 64 dims of
    md5+base-conv per row is pure waste at scale). The DuckDB oracle
    still recomputes them with ITS md5, so the two independent
    implementations cross-check."""
    import hashlib
    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:8],
                16)
        out.append((h % 20001 - 10000) / 10000.0)
    return out


def _dlit(v) -> Column:
    """Nested Python list of floats -> ONE single-parse literal array
    expression. ``F.array(*[F.lit(x) ...])`` costs one py4j round trip
    per element — a 4x16x16 codebook built that way is ~1k driver
    calls INSIDE the timed query build. ``repr(float)`` round-trips
    exactly and Spark's ``D`` suffix parses via Double.parseDouble
    (correctly rounded), so the values are bit-identical to lit()."""
    def fmt(x):
        if isinstance(x, (list, tuple)):
            return "array(" + ",".join(fmt(e) for e in x) + ")"
        return repr(float(x)) + "D"
    return F.expr(fmt(v))


def _dot_const(vec: Column, comps: list) -> Column:
    """dot(vec, literal component vector) via zip_with+aggregate."""
    return F.aggregate(F.zip_with(vec, _dlit(comps),
                                  lambda x, c: x * c),
                       F.lit(0.0), lambda acc, x: acc + x)


def simhash_buckets(embeddings: DataFrame, n_planes: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int | None = None) -> DataFrame:
    """Adds a `bucket` column: n_planes-bit random-hyperplane signature.
    Vectors in the same bucket are ANN candidates (equi-join key).
    Pass ``dim`` when the embedding dimensionality is known: the
    hyperplane components then ship as literal arrays instead of being
    md5-derived per element per row (identical values either way —
    regression-locked by test)."""
    v = F.col(vec_col).cast("array<double>")
    idx = F.sequence(F.lit(0), F.size(v) - 1)

    def _proj(p: int):
        # closure, not default-arg lambda (PySpark infers HOF arity)
        return lambda x, i: x * _plane_component(p, i)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        if dim is not None:
            s = _dot_const(v, _plane_components_py(p, dim))
        else:
            comp = F.zip_with(v, idx, _proj(p))
            s = F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket.bitwiseOR(
            F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), p))
            .otherwise(F.lit(0).cast("long")))
    return embeddings.withColumn("bucket", bucket)


def _centroid_score(vec: Column, centroid: int,
                    dim: int | None = None) -> Column:
    """dot(vec, c_j) where c_j is the md5-derived pseudo centroid —
    deterministic on any engine, no trained/shipped model state. With
    ``dim`` known the centroid ships as a literal array (no per-row
    md5)."""
    if dim is not None:
        return _dot_const(vec, _plane_components_py(centroid, dim))
    idx = F.sequence(F.lit(0), F.size(vec) - 1)

    def _proj(j: int):
        return lambda x, i: x * _plane_component(j, i)

    return F.aggregate(F.zip_with(vec, idx, _proj(centroid)),
                       F.lit(0.0), lambda acc, x: acc + x)


def ivf_cells(embeddings: DataFrame, n_centroids: int = 8,
              vec_col: str = "embedding", out_col: str = "cell",
              dim: int | None = None) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest
    (argmax-dot) pseudo-centroid. The inverted-file ANN layout: `cell`
    is the partition/equi-join key, so at 100 TB the index build is one
    narrow map pass and search touches only nprobe cells."""
    v = F.col(vec_col).cast("array<double>")
    scores = F.array(*[_centroid_score(v, j, dim)
                   for j in range(n_centroids)])
    # first-index argmax (1-based) — mirrored by DuckDB list_position
    cell = F.array_position(scores, F.array_max(scores)).cast("int")
    return embeddings.withColumn(out_col, cell)


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
             n_centroids: int = 8, nprobe: int = 2,
             id_col: str = "vec_id", qid_col: str = "qid",
             vec_col: str = "embedding",
             dim: int | None = None) -> DataFrame:
    """IVF ANN search: each query probes its top-nprobe centroid cells
    and exact-cosine re-ranks only the vectors quantized into those
    cells — the classic recall/cost dial (nprobe=n_centroids = exact).
    Queries are broadcast; the only wide exchange is the final top-k
    window over candidates."""
    e = ivf_cells(
        embeddings.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v")),
        n_centroids, "_v", dim=dim)
    q = queries.select(F.col(qid_col),
                       F.col(vec_col).cast("array<double>").alias("_q"))
    qv = F.col("_q")
    qscores = F.array(*[_centroid_score(qv, j, dim)
                    for j in range(n_centroids)])
    probes = q.select(
        qid_col, "_q",
        F.posexplode(qscores).alias("cidx", "score"))
    wq = Window.partitionBy(qid_col).orderBy(F.desc("score"), "cidx")
    probes = (probes.withColumn("r", F.row_number().over(wq))
              .filter(F.col("r") <= nprobe)
              .select(qid_col, "_q", (F.col("cidx") + 1).cast("int")
                      .alias("cell")))
    cand = (e.withColumn("_ne", _norm(F.col("_v")))
            .join(F.broadcast(probes.withColumn("_nq",
                                                _norm(F.col("_q")))),
                  "cell")
            .filter(F.col(id_col) != F.col(qid_col))
            .withColumn("sim", F.round(
                _dot(F.col("_v"), F.col("_q"))
                / (F.col("_ne") * F.col("_nq")), 6)))
    w = Window.partitionBy(qid_col).orderBy(F.desc("sim"), id_col)
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, "rank", id_col, "sim"))


def ann_topk_lsh(embeddings: DataFrame, k: int = 3, n_planes: int = 6,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int | None = None) -> DataFrame:
    """Bucketed ANN self-join: candidates share an LSH bucket; exact
    cosine re-rank inside buckets. Recall grows as n_planes shrinks."""
    b = simhash_buckets(embeddings, n_planes, id_col, vec_col,
                    dim=dim)
    a_side = b.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).cast("array<double>").alias("_va"),
                      "bucket") \
        .withColumn("_na", _norm(F.col("_va")))
    b_side = b.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).cast("array<double>").alias("_vb"),
                      "bucket") \
        .withColumn("_nb", _norm(F.col("_vb")))
    cand = (a_side.join(b_side, "bucket")
            .filter(F.col("id_a") != F.col("id_b"))
            .withColumn("sim", F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")), 6)))
    w = Window.partitionBy("id_a").orderBy(F.desc("sim"), "id_b")
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id_a", "rank", "id_b", "sim"))


def semdedup(emb: DataFrame, k: int | None = 8, iters: int = 1,
             threshold: float = 0.30, member_cap: int = 64,
             id_col: str = "vec_id", vec_col: str = "v",
             target_cluster_size: int = 512) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public) with a
    BOUNDED per-cluster pair fan-out.

    Scale contract (the part the naive formulation breaks): the
    within-cluster cosine stage compares each member only against the
    ``member_cap`` LOWEST-id members of its cluster (the cluster's
    "representative set" — the star-edge analog of dedup.py's LSH
    ``band_cap``), so total pair count is <= member_cap * n — LINEAR
    in corpus size even when k-means degenerates to one mega-cluster,
    where the uncapped rule is quadratic. Removal policy stays
    deterministic and SQL-replayable: a vector is removed iff a
    LOWER-id representative of its cluster has rounded cosine >=
    ``threshold``; with member_cap >= the largest cluster this is
    exactly the canonical-minimum-survivor rule.

    ``k=None`` derives k from corpus size (ceil(n / target_cluster_
    size), min 8) — SemDeDup uses ~50k clusters at LAION scale for the
    same reason: cluster population, not corpus size, bounds per-key
    shuffle volume. The oracle-gated query pins k=8 (the SQL replay
    cannot depend on n); the derived-k path is covered by pytest.
    """
    from pyproj_spark.operators.kmeans import kmeans
    e0 = emb.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).alias("v"))
    if k is None:
        n = e0.count()
        k = max(8, -(-n // target_cluster_size))
    asg = kmeans(e0, k=k, iters=iters).select("vec_id", "cluster")
    # norms hoisted to one pass per VECTOR; the pair stage then does
    # one dot product per pair instead of dot + two norms
    e = e0.join(asg, "vec_id").withColumn("n", _norm(F.col("v")))
    w = Window.partitionBy("cluster").orderBy("vec_id")
    ranked = e.withColumn("rk", F.row_number().over(w))
    reps = (ranked.filter(F.col("rk") <= member_cap)
            .select("cluster", F.col("vec_id").alias("id_a"),
                    F.col("v").alias("va"), F.col("n").alias("na")))
    members = ranked.select("cluster", F.col("vec_id").alias("id_b"),
                            F.col("v").alias("vb"),
                            F.col("n").alias("nb"))
    dup = (reps.join(members, "cluster")
           .filter(F.col("id_a") < F.col("id_b"))
           .withColumn("sim", F.round(
               _dot(F.col("va"), F.col("vb"))
               / (F.col("na") * F.col("nb")), 6))
           .filter(F.col("sim") >= threshold)
           .select(F.col("id_b").alias("vec_id")).distinct()
           .withColumn("removed", F.lit(True)))
    return (e.select("vec_id", "cluster")
            .join(dup, "vec_id", "left")
            .select("vec_id", "cluster",
                    F.coalesce("removed", F.lit(False))
                    .alias("removed")))


def sq8_stats(embeddings: DataFrame,
              vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (mn, mx) training stats for int8 scalar
    quantization, as ONE row of two aligned arrays. posexplode ->
    groupBy(pos) is map-side-combined down to <= dim rows per
    partition before the (tiny) shuffle; the arrays re-assemble with
    an order-locked collect_list. Exact float min/max, so any engine
    recomputes the identical stats from the same data."""
    per_dim = (embeddings
               .select(F.posexplode(F.col(vec_col).cast("array<double>"))
                       .alias("i", "x"))
               .groupBy("i")
               .agg(F.min("x").alias("mn"), F.max("x").alias("mx")))
    return per_dim.groupBy().agg(
        F.transform(F.array_sort(F.collect_list(F.struct("i", "mn"))),
                    lambda s: s["mn"]).alias("mn"),
        F.transform(F.array_sort(F.collect_list(F.struct("i", "mx"))),
                    lambda s: s["mx"]).alias("mx"))


def sq8_codes(df: DataFrame, stats: DataFrame, id_col: str,
              vec_col: str = "embedding",
              out_col: str = "codes") -> DataFrame:
    """Affine-quantize each vector to int8 codes in [-128, 127]:
    q_i = round((x_i - mn_i) / (mx_i - mn_i) * 255) - 128 (degenerate
    dims quantize to 0). The stats row broadcasts; codes are exact
    integers, so downstream dot products are exact longs — this is
    what makes 4x-smaller embedding search replayable bit-for-bit."""
    x = F.col(vec_col).cast("array<double>")
    scaled = F.zip_with(
        F.zip_with(x, F.col("mn"), lambda v, lo: F.struct(
            v.alias("v"), lo.alias("lo"))),
        F.col("mx"),
        lambda s, hi: F.when(
            hi > s["lo"],
            F.round((s["v"] - s["lo"]) / (hi - s["lo"]) * 255.0)
            .cast("long") - 128).otherwise(F.lit(0).cast("long")))
    return (df.crossJoin(F.broadcast(stats))
            .select(F.col(id_col), scaled.alias(out_col)))


def sq8_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", qid_col: str = "qid",
             vec_col: str = "embedding") -> DataFrame:
    """ANN over int8 scalar-quantized codes: exact-long integer dot
    products between corpus codes and the broadcast quantized query
    set, top-k per query with id tie-break. The 100-TB shape: stats
    are one tiny agg, codes quantize map-side, and the score join is
    broadcast — the only shuffle is the per-query top-k TakeOrdered
    window over candidate rows."""
    stats = sq8_stats(embeddings, vec_col)
    e = sq8_codes(embeddings, stats, id_col, vec_col, "c")
    q = sq8_codes(queries, stats, qid_col, vec_col, "qc")
    cand = e.join(F.broadcast(q), F.col(id_col) != F.col(qid_col))
    dot = F.aggregate(F.zip_with(F.col("c"), F.col("qc"),
                                 lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), id_col)
    return (cand.withColumn("score", dot)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, "rank", id_col, "score"))


# ---------------------------------------------------------------- PQ

PQ_M = 4      # subspaces
PQ_K = 16     # centroids per subspace codebook
PQ_SUB = 16   # dims per subspace (PQ_M * PQ_SUB = embedding dim)


def pq_train(embeddings: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding",
             iters: int = 1) -> list[list[list[float]]]:
    """Train PQ codebooks (Jegou, Douze & Schmid 2011): an
    independent k-means per 16-dim subspace — kmeans_fit with the
    SQL-replayable conventions (first-K init by id, per-pass
    centroid rounding, exact tie-breaks), so an oracle can re-derive
    every codebook from the data alone. Returns PQ_M lists of PQ_K
    rounded centroids. Training cost: PQ_M * (iters + 1) scans of a
    16-dim projection — at 100 TB you train on a bounded sample; the
    ENCODING pass below is the corpus-scale stage."""
    v = F.col(vec_col).cast("array<double>")
    # all PQ_M subspaces train in ONE keyed frame (posexplode of the
    # slices) so each Lloyd pass is a single job — 4 sequential
    # kmeans_fit calls cost 2 driver round-trips EACH for identical
    # arithmetic (assignment + update formulas below are byte-for-byte
    # kmeans.assign_clusters / kmeans_fit at round_to=6, first-K init)
    keyed = embeddings.select(
        F.posexplode(F.array(*[F.slice(v, m * PQ_SUB + 1, PQ_SUB)
                               for m in range(PQ_M)]))
        .alias("_m", "sv"))
    if iters > 1:  # a single Lloyd pass reads keyed exactly once —
        keyed = keyed.cache()  # caching would only add a store pass
    try:
        first = (embeddings.select(id_col, v.alias("_v"))
                 .orderBy(id_col).limit(PQ_K).collect())
        cbs = [[[float(x) for x in r._v[m * PQ_SUB:(m + 1) * PQ_SUB]]
                for r in first] for m in range(PQ_M)]
        for _ in range(iters):
            allc = _dlit(cbs)
            dists = F.transform(
                F.element_at(allc, F.col("_m") + 1),
                lambda c: F.round(F.aggregate(
                    F.zip_with(F.col("sv"), c,
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x), 6))
            staged = keyed.withColumn("_d", dists)
            cluster = (F.array_position(F.col("_d"),
                                        F.array_min("_d")) - 1) \
                .cast("int")
            rows = (staged.withColumn("cluster", cluster)
                    .select("_m", "cluster",
                            F.posexplode("sv").alias("dim", "val"))
                    .groupBy("_m", "cluster", "dim")
                    .agg(F.round(F.avg("val"), 6).alias("mu"))
                    .collect())
            nxt = [[list(c) for c in cb] for cb in cbs]
            for r in rows:  # empty cluster: keep old centroid
                nxt[r._m][r.cluster][r.dim] = r.mu
            cbs = nxt
        return cbs
    finally:
        if iters > 1:
            keyed.unpersist()


def _sub_dists(sub: Column, cents: list, round_to: int = 6) -> Column:
    """array of rounded squared distances to each centroid — the
    assign_clusters arithmetic, inlined so all PQ_M argmins run in
    ONE projection."""
    return F.transform(
        _dlit(cents),
        lambda c: F.round(F.aggregate(
            F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x), round_to))


def pq_codes(df: DataFrame, codebooks: list, id_col: str,
             vec_col: str = "embedding",
             extra_cols: tuple = ()) -> DataFrame:
    """Product-quantize each vector to PQ_M 0-based codebook indices
    (argmin rounded-d2 per subspace, first-index tie-break): 64
    doubles become 4 small ints — the 64x-compression ANN storage
    layout. One map-side projection, no joins, no shuffle.
    ``extra_cols`` pass through unchanged (e.g. the IVF cell id), so
    callers don't re-join the source frame — and re-run its whole
    assignment subtree — just to recover a column."""
    v = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    for m, cents in enumerate(codebooks):
        sub = F.slice(v, m * PQ_SUB + 1, PQ_SUB)
        d2s = _sub_dists(sub, cents)
        cols.append((F.array_position(d2s, F.array_min(d2s)) - 1)
                    .cast("int").alias(f"code{m}"))
    cols.extend(F.col(c) for c in extra_cols)
    return df.select(*cols)


def pq_adc_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", qid_col: str = "qid",
                vec_col: str = "embedding",
                iters: int = 1) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: corpus vectors live only
    as codes; each query precomputes a PQ_M x PQ_K table of
    squared-distance-to-centroid entries (rounded once to exact 1e-9
    longs) and a candidate's distance is PQ_M integer lookups + an
    exact-long sum. The 100-TB shape: the code table is 64x smaller
    than the vectors, query tables broadcast, and the only wide
    exchange is the per-query top-k window."""
    cbs = pq_train(embeddings, id_col, vec_col, iters)
    e = pq_codes(embeddings, cbs, id_col, vec_col)
    qv = F.col(vec_col).cast("array<double>")
    qcols = [F.col(qid_col)]
    for m, cents in enumerate(cbs):
        sub = F.slice(qv, m * PQ_SUB + 1, PQ_SUB)
        tab = F.transform(
            _dlit(cents),
            lambda c: F.round(F.aggregate(
                F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x) * 1e9)
            .cast("long"))
        qcols.append(tab.alias(f"t{m}"))
    q = queries.select(*qcols)
    cand = e.join(F.broadcast(q), F.col(id_col) != F.col(qid_col))
    dist = None
    for m in range(PQ_M):
        term = F.element_at(F.col(f"t{m}"), F.col(f"code{m}") + 1)
        dist = term if dist is None else dist + term
    w = Window.partitionBy(qid_col).orderBy("dist", id_col)
    return (cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, "rank", id_col, "dist"))


def ivfpq_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
               n_centroids: int = 8, nprobe: int = 2,
               id_col: str = "vec_id", qid_col: str = "qid",
               vec_col: str = "embedding",
               iters: int = 1) -> DataFrame:
    """IVF-PQ (the FAISS-style composition of the two scale paths):
    coarse md5-pseudo-centroid cells prune the search to nprobe
    cells; RESIDUALS (vector minus its coarse centroid) are
    product-quantized with trained codebooks; queries build one
    exact-long ADC table per probed cell from THEIR residual in that
    cell. Search cost = candidates-in-probed-cells x 4 integer
    lookups; storage = 4 bytes of codes + a cell id per vector. All
    stages reuse this module's gated conventions, so the full
    index-build + search replays in SQL."""
    dim = PQ_M * PQ_SUB
    cents = [_plane_components_py(j, dim) for j in range(n_centroids)]
    cent_arr = _dlit(cents)

    def with_cell_residual(df, idc):
        v = F.col(vec_col).cast("array<double>")
        scores = F.array(*[_dot_const(v, cc) for cc in cents])
        cell = F.array_position(scores, F.array_max(scores)) \
            .cast("int")
        staged = df.select(F.col(idc), v.alias("_v"),
                           cell.alias("cell"))
        resid = F.zip_with(F.col("_v"),
                           F.element_at(cent_arr, F.col("cell")),
                           lambda a, b: a - b)
        return staged.select(idc, "cell", resid.alias("_r"))

    e = with_cell_residual(embeddings, id_col)
    cbs = pq_train(e, id_col, "_r", iters)
    ecodes = pq_codes(e, cbs, id_col, "_r", extra_cols=("cell",))

    # queries: top-nprobe cells by dot, then a residual PER cell
    qv = F.col(vec_col).cast("array<double>")
    qscores = F.array(*[_dot_const(qv, cc) for cc in cents])
    probes = (queries.select(F.col(qid_col), qv.alias("_q"),
                             F.posexplode(qscores)
                             .alias("cidx", "score")))
    wq = Window.partitionBy(qid_col).orderBy(F.desc("score"), "cidx")
    probes = (probes.withColumn("r", F.row_number().over(wq))
              .filter(F.col("r") <= nprobe)
              .select(qid_col, "_q",
                      (F.col("cidx") + 1).cast("int").alias("cell")))
    qres = probes.select(
        qid_col, "cell",
        F.zip_with(F.col("_q"), F.element_at(cent_arr, F.col("cell")),
                   lambda a, b: a - b).alias("_r"))
    qcols = [F.col(qid_col), F.col("cell")]
    for m, cc in enumerate(cbs):
        sub = F.slice(F.col("_r"), m * PQ_SUB + 1, PQ_SUB)
        carr = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                         for c in cc])
        tab = F.transform(
            carr,
            lambda c: F.round(F.aggregate(
                F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x) * 1e9)
            .cast("long"))
        qcols.append(tab.alias(f"t{m}"))
    qtabs = qres.select(*qcols)

    cand = (ecodes.join(F.broadcast(qtabs), "cell")
            .filter(F.col(id_col) != F.col(qid_col)))
    dist = None
    for m in range(PQ_M):
        term = F.element_at(F.col(f"t{m}"), F.col(f"code{m}") + 1)
        dist = term if dist is None else dist + term
    w = Window.partitionBy(qid_col).orderBy("dist", id_col)
    return (cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, "rank", id_col, "dist"))


def jl_sign_matrix(k: int, dim: int, seed: str = "jl") -> list[list[int]]:
    """Deterministic ±1 Achlioptas/JL projection matrix from md5
    parity of (seed:i:j) — reproducible on any engine without
    shipping data (the _plane_components_py convention)."""
    import hashlib
    return [[1 if int(hashlib.md5(f"{seed}:{i}:{j}".encode())
                      .hexdigest()[0], 16) % 2 == 0 else -1
             for j in range(dim)]
            for i in range(k)]


def jl_project(embeddings: DataFrame, k: int = 16,
               dim: int = 64, id_col: str = "vec_id",
               vec_col: str = "embedding",
               seed: str = "jl") -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a ±1 sign
    matrix (Achlioptas 2003): the embedding-compression step before
    LSH/ANN when the raw dim is too wide. Components quantize to
    integer MICRO units BEFORE the fold, so the per-component sums
    are exact longs and any engine replaying the same signs agrees
    bit-for-bit. Pure Catalyst: the matrix ships as literal arrays,
    one zip_with+aggregate per output component, one scan, no
    shuffle at all. Returns long-format (id, comp, p_micro)."""
    signs = jl_sign_matrix(k, dim, seed)
    # quantize ONCE per row (bound as a HOF lambda variable), not once
    # per output component: the round(e*1e6) chain is identical across
    # the k folds, so inlining it k times cost k*dim interpreted ops
    # per row for the same values. Sign arrays ship as single-parse
    # F.expr literals (one py4j call each instead of dim lit() calls —
    # plan construction is inside the benched query time). Same
    # arithmetic: long(round(e*1e6)) * (+-1 int) summed in index order.
    q_micro = F.transform(F.col(vec_col),
                          lambda e: F.round(e * 1e6).cast("long"))

    def _comps(qq):
        return F.array(*[
            F.struct(
                F.lit(i).alias("comp"),
                F.aggregate(
                    F.zip_with(
                        qq,
                        F.expr("array(" + ",".join(
                            str(s) for s in signs[i]) + ")"),
                        lambda a, s: a * s),
                    F.lit(0).cast("long"), lambda acc, v: acc + v)
                .alias("p_micro"))
            for i in range(k)])

    comps = F.element_at(F.transform(F.array(q_micro), _comps), 1)
    return (embeddings
            .select(id_col, F.explode(comps).alias("c"))
            .select(id_col, F.col("c.comp").alias("comp"),
                    F.col("c.p_micro").alias("p_micro")))
