"""Deduplication operators for web-scale text (driver-mandated family).

All operators avoid per-row Python: token pipelines are built from
native Catalyst higher-order functions (split/transform/aggregate) with
md5-based hashing (stable across engines, so DuckDB oracles can verify
bit-for-bit).

* exact_dedup      — hash-groupBy on a normalized text key
* minhash_signature— k-permutation MinHash via md5(i || token)
* minhash_lsh_pairs— banding -> candidate pairs (the scale path: the
  only shuffle is the band equi-join, skew-safe because a band key is
  (band_idx, hash))
* simhash          — 16-bit sign-sum fingerprint
* ngram_shingles   — n-token shingles for Jaccard joins
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_text(col: Column) -> Column:
    """Dedup normalization: lowercase, strip non [a-z0-9 ], squeeze."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(c, r" +", " "))


def tokens(col: Column) -> Column:
    return F.split(norm_text(col), " ")


def _md5_long(c: Column) -> Column:
    """First 8 hex digits of md5 as a non-negative long (< 2^32)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def token_hash(tok: Column, salt: int) -> Column:
    return _md5_long(F.concat(F.lit(str(salt)), F.lit(":"), tok))


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", prefix: int = 0) -> DataFrame:
    """Groups of exact duplicates (by md5 of normalized text, optionally
    prefix-limited). Returns (text_hash, dup_count, min_id)."""
    key = norm_text(F.col(text_col))
    if prefix:
        key = F.substring(key, 1, prefix)
    return (df.withColumn("text_hash", F.md5(key))
            .groupBy("text_hash")
            .agg(F.count("*").alias("dup_count"),
                 F.min(id_col).alias("min_id"))
            .filter(F.col("dup_count") > 1))


def _hash_with(salt: int):
    # NOTE: must be a closure, NOT a default-arg lambda — PySpark infers
    # the higher-order-function shape from the lambda's arity, so
    # `lambda t, i=i:` would silently become an (element, index) lambda.
    return lambda t: token_hash(t, salt)


#: universal-hash constants for minhash permutations: h_i = (a_i*h + b_i)
#: mod P with h < 2^31, a_i < 2^31 so products stay < 2^62 (no int64
#: overflow in either Spark or DuckDB)
MINHASH_P = (1 << 61) - 1
MINHASH_A = [1103515245, 69069, 1664525, 22695477, 134775813, 214013,
             1103, 48271, 16807, 75, 1366, 950706376]
MINHASH_B = [12345, 362437, 1013904223, 1, 1, 2531011, 7, 3, 11, 74, 150889,
             12345]


def minhash_signature(df: DataFrame, text_col: str = "text",
                      num_hashes: int = 8) -> DataFrame:
    """Adds minhash_0..minhash_{k-1} columns.

    ONE md5 per token + num_hashes arithmetic permutations (universal
    hashing), instead of num_hashes md5 passes — at 10^12 rows the md5
    over the token stream dominates, so this is an O(num_hashes) saving.
    The same formula is reproduced in the DuckDB oracle SQL.
    """
    toks = tokens(F.col(text_col))
    base = F.transform(toks, _hash_with(0))  # one md5 pass, h < 2^32
    # materialize the token-hash array in its OWN projection: HOFs are
    # interpreted (not codegen'd), and CollapseProject would otherwise
    # inline `base` into every consumer — re-running the md5 pass once
    # per permutation (measured 4.0 s -> ~0.5 s on the sf0.1 signature).
    # CollapseProject keeps the two projections separate because the
    # alias is non-cheap and referenced num_hashes times.
    staged = df.withColumn("_mh_base", base)
    sig_cols = [
        F.array_min(F.transform(F.col("_mh_base"),
                                _perm_with(MINHASH_A[i], MINHASH_B[i])))
        .alias(f"minhash_{i}")
        for i in range(num_hashes)]
    return staged.select(*df.columns, *sig_cols)


def _perm_with(a: int, b: int):
    return lambda h: (F.pmod(h, F.lit(1 << 31)) * a + b) % MINHASH_P


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 8,
                      bands: int = 4, band_cap: int = 64,
                      star_only: bool = False) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: rows sharing any band of
    the minhash signature. Output (id_a, id_b) with id_a < id_b.

    Hot-band guard (the 100-TB path): instead of a band self-join (a
    degenerate band key — e.g. all empty-normalized docs — recreates the
    O(n²) all-pairs blowup inside one bucket), bands are aggregated with
    ONE groupBy(band_key):

    * bands with <= band_cap members emit all pairs via a nested array
      HOF (bounded at band_cap²/2 per band, computed map-side);
    * hot bands (> band_cap members) emit STAR edges (min_id, member) —
      O(n) per band, no information loss for connected-components dedup
      (every member stays linked to its cluster representative; docs in
      a hot band are near-identical by construction, which exact dedup
      catches first anyway).

    Total shuffles: groupBy(band_key) + the final pair dedup — both
    partial-aggregated; no join, no unbounded bucket.

    ``star_only=True`` emits star edges for EVERY band (not just hot
    ones): the right mode when the consumer is connected-components
    dedup, which only needs CONNECTIVITY — components are identical,
    the edge count drops from O(members²) to O(members) per band, and
    the near-star graph converges in ~2 label alternations.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df.select(id_col, text_col), text_col,
                            num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"minhash_{b * rows_per_band + r}").cast("string")
                 for r in range(rows_per_band)]
        band_cols.append(
            F.md5(F.concat_ws("_", F.lit(str(b)), *parts)).alias(f"band_{b}"))
    banded = sig.select(id_col, *band_cols)
    stacked = banded.select(
        id_col,
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(str(b)), F.col(f"band_{b}"))
            for b in range(bands)])).alias("band_key"))
    grouped = (stacked.groupBy("band_key")
               .agg(F.array_sort(F.collect_list(id_col)).alias("ids"),
                    F.count("*").alias("cnt"))
               .filter(F.col("cnt") >= 2))
    ids = F.col("ids")
    all_pairs = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(ids) - 2),
        lambda i: F.transform(
            F.sequence(i + 1, F.size(ids) - 1),
            lambda j: F.struct(
                F.element_at(ids, (i + 1).cast("int")).alias("id_a"),
                F.element_at(ids, (j + 1).cast("int")).alias("id_b")))))
    star_edges = F.transform(
        F.slice(ids, 2, F.size(ids) - 1),
        lambda m: F.struct(F.element_at(ids, 1).alias("id_a"),
                           m.alias("id_b")))
    edges = grouped.select(F.explode(
        star_edges if star_only else
        F.when(F.col("cnt") <= band_cap, all_pairs)
        .otherwise(star_edges)).alias("e"))
    return edges.select(F.col("e.id_a").alias("id_a"),
                        F.col("e.id_b").alias("id_b")).distinct()


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16,
            id_col: str = "doc_id") -> DataFrame:
    """bits-wide SimHash: sign of per-bit sums of +-1 over token hashes.
    Returns (id_col, simhash)."""
    # explode -> ONE md5 per token -> single groupBy with `bits`
    # conditional sums. A per-bit F.aggregate over the token array would
    # re-hash the tokens `bits` times and blow the codegen method-size
    # limit into interpreted mode (measured 57s -> ~2s at sf0.1).
    # Shuffle carries only (id, token hash) — never the text.
    other_cols = [id_col]
    tok = df.select(
        *other_cols,
        F.explode(tokens(F.col(text_col))).alias("_t"))
    tok = tok.withColumn("_h", token_hash(F.col("_t"), 999))
    sums = tok.groupBy(*other_cols).agg(
        *[F.sum(F.when(F.shiftright(F.col("_h"), b)
                       .bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1))
          .alias(f"_b{b}") for b in range(bits)])
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim.bitwiseOR(
            F.when(F.col(f"_b{b}") > 0,
                   F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long")))
    return sums.withColumn("simhash", sim).drop(
        *[f"_b{b}" for b in range(bits)])


def ngram_shingles(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle_hash) rows: hashes of n-token shingles — the input to
    Jaccard-style similarity joins."""
    # zip_with over n shifted slices, NOT transform+element_at: inside
    # a lambda, element_at(<toks expr>, i) re-evaluates its array
    # argument per element once the optimizer inlines the tokenizer
    # (InferFiltersFromGenerate pushes a size() filter through the
    # projection) — O(tokens^2) per row. zip_with's arguments are
    # evaluated once per row regardless of inlining. Also fixes the
    # <n-token edge: sequence(0, -1) counts DOWN, emitting ghost
    # shingles; slices of length 0 emit none (matching the SQL
    # oracle's range(greatest(len-2, 0))).
    toks = tokens(F.col(text_col))
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    joined = F.slice(toks, 1, m)
    for k in range(1, n):
        joined = F.zip_with(joined, F.slice(toks, k + 1, m),
                            lambda a, b: F.concat(a, F.lit(" "), b))
    # both md5 applications AFTER the explode: F.transform(joined,
    # F.md5) ran the inner md5 as an interpreted HOF (~tokens md5
    # dispatches per row); on the exploded column the md5(md5(s))
    # chain is plain whole-stage-codegen expression work. Same double
    # hash, same values.
    return (df.select(id_col, F.explode(joined).alias("shingle"))
            .withColumn("shingle_hash",
                        _md5_long(F.md5(F.col("shingle"))))
            .drop("shingle"))


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  threshold: float = 0.5, df_max: int = 50) -> DataFrame:
    """n-gram Jaccard over candidate pairs sharing >= 1 RARE shingle.

    Document-frequency cap (the 100-TB guard): a shingle appearing in m
    docs contributes m² candidate rows in a shingle self-join — common
    boilerplate shingles ("click here to subscribe") blow up
    quadratically on real web text. Shingles with document frequency
    > df_max are excluded from candidate generation and intersection
    counting (the standard rare-shingle approximation: the reported
    jaccard is a lower bound — exact whenever no shared shingle is
    hot). RECALL CAVEAT: a pair whose shared shingles are ALL hot
    (boilerplate-only near-dups) produces NO candidate pair here — not
    just an underestimated score. For connected-components dedup,
    union these pairs with ``jaccard_capped_star_edges`` (O(m) edges
    per hot shingle) so hot-shingle documents stay in their clusters;
    exact dedup also catches the fully-identical subset first.
    Denominator sizes n_a/n_b remain the TRUE distinct-shingle
    counts. Like minhash_lsh_pairs, the per-shingle posting list is
    aggregated with one groupBy and pairs are expanded with a bounded
    array HOF — no self-join at all.
    """
    sh = ngram_shingles(df, id_col, text_col, n).distinct()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    g = (sh.groupBy("shingle_hash")
         .agg(F.array_sort(F.collect_list(id_col)).alias("ids"),
              F.count("*").alias("cnt"))
         .filter((F.col("cnt") >= 2) & (F.col("cnt") <= df_max)))
    ids = F.col("ids")
    pair_arr = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(ids) - 2),
        lambda i: F.transform(
            F.sequence(i + 1, F.size(ids) - 1),
            lambda j: F.struct(
                F.element_at(ids, (i + 1).cast("int")).alias("id_a"),
                F.element_at(ids, (j + 1).cast("int")).alias("id_b")))))
    inter = (g.select(F.explode(pair_arr).alias("e"))
             .groupBy(F.col("e.id_a").alias("id_a"),
                      F.col("e.id_b").alias("id_b"))
             .agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col(id_col).alias("id_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"),
                      F.col("n_sh").alias("n_b"))
    out = (inter.join(sa, "id_a").join(sb, "id_b")
           .withColumn("jaccard",
                       F.col("n_common")
                       / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
           .filter(F.col("jaccard") >= threshold))
    return out.select("id_a", "id_b",
                      F.round("jaccard", 4).alias("jaccard"))


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      threshold: float = 0.8, df_max: int = 50
                      ) -> DataFrame:
    """ASYMMETRIC n-gram containment C(src|dst) = |src ∩ dst| / |src|
    (Broder's containment vs resemblance distinction, "On the
    resemblance and containment of documents", SEQUENCES 1997 —
    public): the quote / partial-copy detector symmetric Jaccard
    misses — a paragraph embedded verbatim in a much longer page has
    near-zero Jaccard but containment 1.0. The standard dedup policy
    built on it ("drop the contained doc, keep the superset") needs
    both directions, so each qualifying unordered pair emits up to two
    rows (src_id, dst_id, containment) meaning "src is contained in
    dst".

    Same bounded posting-list plan and df_max cap as jaccard_pairs
    (shared intersection counts — one groupBy, no self-join; capped
    shingles make the score a lower bound with the identical recall
    caveat)."""
    sh = ngram_shingles(df, id_col, text_col, n).distinct()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    g = (sh.groupBy("shingle_hash")
         .agg(F.array_sort(F.collect_list(id_col)).alias("ids"),
              F.count("*").alias("cnt"))
         .filter((F.col("cnt") >= 2) & (F.col("cnt") <= df_max)))
    ids = F.col("ids")
    pair_arr = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(ids) - 2),
        lambda i: F.transform(
            F.sequence(i + 1, F.size(ids) - 1),
            lambda j: F.struct(
                F.element_at(ids, (i + 1).cast("int")).alias("id_a"),
                F.element_at(ids, (j + 1).cast("int")).alias("id_b")))))
    inter = (g.select(F.explode(pair_arr).alias("e"))
             .groupBy(F.col("e.id_a").alias("id_a"),
                      F.col("e.id_b").alias("id_b"))
             .agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col(id_col).alias("id_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"),
                      F.col("n_sh").alias("n_b"))
    both = inter.join(sa, "id_a").join(sb, "id_b")
    a_in_b = both.select(
        F.col("id_a").alias("src_id"), F.col("id_b").alias("dst_id"),
        (F.col("n_common") / F.col("n_a")).alias("c"))
    b_in_a = both.select(
        F.col("id_b").alias("src_id"), F.col("id_a").alias("dst_id"),
        (F.col("n_common") / F.col("n_b")).alias("c"))
    return (a_in_b.unionByName(b_in_a)
            .filter(F.col("c") >= threshold)
            .select("src_id", "dst_id",
                    F.round("c", 4).alias("containment")))


def jaccard_capped_star_edges(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text", n: int = 3,
                              df_max: int = 50) -> DataFrame:
    """Connectivity edges for the shingles jaccard_pairs CAPS away.

    For every shingle with document frequency > df_max, emit star edges
    (min member, member) — O(m) per hot shingle instead of the O(m²)
    pair expansion, mirroring the minhash hot-band guard. Union with
    jaccard_pairs' (id_a, id_b) before connected_components so document
    pairs whose overlap is boilerplate-only stay in one cluster (they
    carry no jaccard score — scores are only defined for rare-shingle
    evidence)."""
    sh = ngram_shingles(df, id_col, text_col, n).distinct()
    hot = (sh.groupBy("shingle_hash")
           .agg(F.array_sort(F.collect_list(id_col)).alias("ids"),
                F.count("*").alias("cnt"))
           .filter(F.col("cnt") > df_max))
    ids = F.col("ids")
    star = F.transform(
        F.slice(ids, 2, F.size(ids) - 1),
        lambda m: F.struct(F.element_at(ids, 1).alias("id_a"),
                           m.alias("id_b")))
    return (hot.select(F.explode(star).alias("e"))
            .select(F.col("e.id_a").alias("id_a"),
                    F.col("e.id_b").alias("id_b"))
            .distinct())


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, min_overlap: int = 2) -> DataFrame:
    """Benchmark decontamination (the GPT-3-style n-gram overlap
    filter): flag every corpus document sharing >= ``min_overlap``
    DISTINCT n-gram shingles with the held-out benchmark set. Returns
    (id, n_hits, contaminated) for ALL corpus rows.

    Plan shape: the benchmark's distinct shingle set is tiny relative
    to the corpus (eval sets are thousands of docs, the corpus is
    billions), so it BROADCASTS; the corpus-side shingle explosion
    collapses map-side through the per-doc count's partial
    aggregation. One shuffle on the doc id, none on shingles."""
    c = ngram_shingles(corpus, id_col, text_col, n)
    b = (ngram_shingles(benchmark, id_col, text_col, n)
         .select("shingle_hash").distinct())
    # dedup AFTER the broadcast join (guide §2.3): the benchmark set
    # is distinct on shingle_hash, so counting distinct hits after
    # the join equals distinct-then-join-then-count — but only HIT
    # pairs reach the exchange instead of the corpus's whole shingle
    # table, and size(collect_set) does it in ONE exchange (map-side
    # partial sets) instead of distinct + groupBy's two.
    hits = (c.join(F.broadcast(b), "shingle_hash")
            .groupBy(id_col)
            .agg(F.size(F.collect_set("shingle_hash")).cast("long")
                 .alias("n_hits")))
    return (corpus.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0))
                     >= F.lit(min_overlap)).alias("contaminated")))


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", df_max: int = 1
                    ) -> DataFrame:
    """Paragraph-level dedup (the CCNet stage): a paragraph appearing
    in more than ``df_max`` DISTINCT documents is boilerplate; the
    cleaned text keeps only non-duplicated paragraphs, in order.

    Plan: explode paragraphs -> distinct (doc, hash) -> groupBy hash
    with partial aggregation (boilerplate heat absorbed map-side) ->
    the duplicated-hash set joins back BROADCAST (it is the set of
    repeated paragraphs — vocabulary-scale, not corpus-scale) -> the
    doc's paragraph array is filtered in place, one shuffle total."""
    paras = F.filter(F.split(F.col(text_col), "\n"),
                     lambda p: F.trim(p) != F.lit(""))
    staged = df.select(id_col, paras.alias("_paras"))
    ph = (staged.select(id_col, F.explode("_paras").alias("p"))
          .select(id_col, F.md5(F.trim("p")).alias("h"))
          .distinct())
    dup = (ph.groupBy("h").agg(F.count(F.lit(1)).alias("ndocs"))
           .filter(F.col("ndocs") > df_max)
           .select(F.collect_set("h").alias("dups")))
    out = (staged.crossJoin(F.broadcast(dup))
           .withColumn("_clean", F.filter(
               F.col("_paras"),
               lambda p: ~F.array_contains(F.col("dups"),
                                           F.md5(F.trim(p))))))
    return out.select(
        id_col,
        F.size("_paras").alias("n_paras"),
        (F.size("_paras") - F.size("_clean")).alias("n_dup"),
        F.md5(F.array_join(F.transform(F.col("_clean"),
                                       lambda p: F.trim(p)), "\n"))
        .alias("clean_hash"))


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", bits: int = 16,
                  bands: int = 4, max_hamming: int = 3,
                  band_cap: int = 200) -> DataFrame:
    """SimHash hamming-distance near-dup pairs (the web-dedup design
    from the original simhash paper): by pigeonhole, two signatures
    within hamming distance < ``bands`` share at least one exact
    band, so candidate generation is ``bands`` equi-joins on band
    values — no signature self-join — followed by an exact popcount
    filter. All pure Catalyst bit math.

    Same hot-key discipline as minhash_lsh_pairs: a band value held
    by more than ``band_cap`` docs (a degenerate constant-signature
    band) is dropped from pair expansion rather than exploding
    quadratically; exact dedup upstream owns identical-text pairs."""
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    w = bits // bands
    sig = simhash(df, text_col, bits, id_col).select(id_col, "simhash")
    mask = (1 << w) - 1
    bexp = F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col("simhash"), b * w)
                 .bitwiseAND(F.lit(mask)).alias("val"))
        for b in range(bands)]))
    keyed = sig.select(id_col, "simhash", bexp.alias("bk")) \
        .select(id_col, "simhash", "bk.band", "bk.val")
    grp = (keyed.groupBy("band", "val")
           .agg(F.collect_list(F.struct(F.col(id_col).alias("id"),
                                        F.col("simhash").alias("s")))
                .alias("members"))
           .filter((F.size("members") >= 2)
                   & (F.size("members") <= band_cap)))
    pairs = grp.select(F.explode(F.flatten(F.transform(
        F.sequence(F.lit(0), F.size("members") - 2),
        lambda i: F.transform(
            F.slice(F.col("members"), i + 2,
                    F.size("members")),
            lambda m: F.struct(
                F.element_at(F.col("members"),
                             (i + 1).cast("int"))["id"].alias("id_a"),
                m["id"].alias("id_b"),
                F.element_at(F.col("members"),
                             (i + 1).cast("int"))["s"].alias("sa"),
                m["s"].alias("sb")))))).alias("p")).select("p.*")
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (pairs
            .select(F.least("id_a", "id_b").alias("id_a"),
                    F.greatest("id_a", "id_b").alias("id_b"),
                    ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 4,
                        w: int = 5) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every k-token gram, then in each window
    of w consecutive gram hashes select the minimum (rightmost on
    ties). Guarantee: any shared token run of length >= w + k - 1
    produces at least one shared fingerprint, while the fingerprint
    density stays ~2/(w+1) — the LOCAL fingerprinting scheme next to
    the global minhash family (reference scope: engine-new; pyproj has
    no text surface).

    All-native: grams via zip_with over shifted slices (the per-row
    evaluation-safety pattern of ngram_shingles), the rightmost-min
    tie-break by packing ``hash * 2^20 + (2^20 - 1 - pos)`` into one
    long (docs bounded at 2^20 grams), and window minima as a w-fold
    zip_with least() over shifted slices. Output: (id, fp, pos) rows.
    """
    pos_span = 1 << 20
    toks = tokens(F.col(text_col))
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    gram = F.slice(toks, 1, m)
    for j in range(1, k):
        gram = F.zip_with(gram, F.slice(toks, j + 1, m),
                          lambda a, b: F.concat(a, F.lit(" "), b))
    combined = F.transform(
        gram,
        lambda g, i: _md5_long(g) * pos_span
        + (F.lit(pos_span - 1) - i))
    hashed = df.select(id_col, combined.alias("ch"))
    mw = F.greatest(F.size(F.col("ch")) - (w - 1), F.lit(0))
    wm = F.slice(F.col("ch"), 1, mw)
    for j in range(1, w):
        wm = F.zip_with(wm, F.slice(F.col("ch"), j + 1, mw),
                        lambda a, b: F.least(a, b))
    return (hashed.select(id_col, F.explode(F.array_distinct(wm))
                          .alias("c"))
            .select(id_col, F.shiftright("c", 20).alias("fp"),
                    (F.lit(pos_span - 1)
                     - F.col("c").bitwiseAND(F.lit(pos_span - 1)))
                    .alias("pos")))


def delete_neighborhood(title: Column) -> Column:
    """SymSpell deletion neighborhood of depth 1: the string itself plus
    every string obtainable by deleting exactly one character
    (array_distinct'ed — deleting either of two identical adjacent
    characters yields the same key).

    Completeness (the property the covering-blind oracle certifies):
    for any s, t with levenshtein(s, t) <= 1 the neighborhoods
    intersect — equal strings share the identity key, a substitution
    at i shares delete(i), an insertion shares the shorter string
    itself. So an equi-join on exploded keys misses NO pair at
    distance <= 1 (Garbe's symmetric-delete argument), while candidate
    buckets stay bounded by true collision counts instead of the
    O(alphabet x len) of generate-all-edits blocking."""
    c = title
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - F.lit(1)),
                           c.substr(i + F.lit(1),
                                    F.length(c) - i)))
    return F.array_distinct(F.concat(F.array(c), dels))


def symspell_pairs(df: DataFrame, id_col: str = "doc_id",
                   title_col: str = "title") -> DataFrame:
    """All pairs of rows whose ``title_col`` values are within
    Levenshtein distance 1 (exact, not approximate), found WITHOUT an
    all-pairs join: explode each title's depth-1 deletion neighborhood,
    hash equi-join on the key, verify candidates with the native
    ``levenshtein`` expression (JVM-side in Spark, C-side in the DuckDB
    oracle — both engines agree on unit-cost edit distance).

    Scale shape: the only shuffle is the key equi-join; a key's bucket
    holds only strings at mutual distance <= 2 that share that
    subsequence, so fan-out is bounded by true near-dup density, never
    by corpus size. Reference analogue: none (graft dedup family —
    complements minhash/simhash/winnow with the TYPO regime those
    token-level schemes cannot see).

    Returns (doc_a, doc_b, dist) with doc_a < doc_b, one row per pair.

    r6 shape: blocking runs at the DISTINCT-TITLE level, then maps
    back to doc pairs. Whether two docs pair depends only on their
    titles, and real corpora duplicate titles heavily, so the
    deletion-neighborhood self-join over distinct titles is strictly
    smaller than the doc-level one (which also needed a doc-pair
    dropDuplicates exchange — near-dup titles share MANY deletion
    keys). Ordered title pairs (both directions + the (t,t) self
    pair) make each a<b doc pair appear exactly once. Identical
    output rows (regression-verified)."""
    dt = df.select(F.col(title_col).alias("t")).distinct()
    keyed = dt.select(
        "t", F.explode(delete_neighborhood(F.col("t"))).alias("k"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    tp = (a.join(b, F.col("a.k") == F.col("b.k"))
          .select(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
          .distinct()
          .withColumn("dist", F.levenshtein("ta", "tb").cast("long"))
          .where(F.col("dist") <= 1))
    da = df.select(F.col(id_col).alias("doc_a"),
                   F.col(title_col).alias("ta"))
    db = df.select(F.col(id_col).alias("doc_b"),
                   F.col(title_col).alias("tb"))
    return (da.join(F.broadcast(tp), "ta").join(db, "tb")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "dist"))


def cdc_chunk_table(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Content-defined chunking (the storage-dedup / near-dup-span
    family: Manber 1994 anchors, the word-level analogue of
    FastCDC): a word opens a new chunk iff the first md5 nibble of
    the word is '0' (expected chunk length 16 words), so chunk
    boundaries are POSITION-INDEPENDENT — inserting a paragraph
    shifts no boundary outside itself, which is exactly why CDC
    beats fixed-size chunking for dedup. Returns one row per chunk:
    (id, grp, chunk_hash, n_words).

    Shape: posexplode -> per-doc running-sum window (partition
    bounded by doc length) -> hash agg; chunk text reassembles
    inside the agg via array_sort(collect_list(struct(pos, word))),
    never a cross-doc shuffle of raw text."""
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"))
    w = (Window.partitionBy("id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    grp = words.withColumn(
        "grp", F.sum(F.when(F.substring(F.md5("word"), 1, 1) == "0", 1)
                     .otherwise(0)).over(w))
    return (grp.groupBy("id", "grp")
            .agg(F.md5(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"]),
                " ")).alias("chunk_hash"),
                F.count(F.lit(1)).alias("n_words")))
