"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprinting (driver-mandated family). Pure Catalyst."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword markers for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " de ", " que "],
}


def _count_occurrences(col: Column, needle: str) -> Column:
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle),
                                                F.lit(""))))
            / len(needle)).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace tokenization count (BPE-ish regex variant below)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")


#: GPT-2-style pre-tokenizer shape, lookahead-free so the SAME pattern
#: runs under Java regex (Spark) and RE2 (DuckDB oracle): contractions,
#: optionally space-prefixed letter runs / digit runs / punctuation runs
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def word_chunk_count(col: Column) -> Column:
    """BPE-ish chunk count: the number of pre-tokenizer pieces a GPT-2
    style byte-pair encoder would start from (whitespace-run tokens
    excluded) — the standard cheap token-budget estimator for
    training-data pipelines."""
    return F.size(F.regexp_extract_all(
        col, F.lit(BPE_PATTERN), 0)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds length/punct/stopword quality features (rounded, so oracle
    SQL can reproduce them exactly)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = sum((_count_occurrences(F.concat(F.lit(" "), F.lower(c),
                                              F.lit(" ")), m)
                  for m in LANG_MARKERS["en"]), F.lit(0).cast("long"))
    mean_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    return (df.withColumn("n_chars", n_chars.cast("long"))
            .withColumn("n_tokens", n_tokens)
            .withColumn("punct_ratio",
                        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
            .withColumn("stopword_ratio",
                        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6))
            .withColumn("mean_token_len", F.round(mean_tok, 4)))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-count language heuristic: argmax over LANG_MARKERS with a
    deterministic tie-break (language name asc), 'und' when all zero."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {lang: sum((_count_occurrences(padded, m) for m in marks),
                        F.lit(0).cast("long"))
              for lang, marks in LANG_MARKERS.items()}
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in sorted(LANG_MARKERS, reverse=True):
        s = scores[lang]
        take = s >= best_score  # later (asc-earlier) language wins ties
        best = F.when(take & (s > 0), F.lit(lang)).otherwise(best)
        best_score = F.greatest(s, best_score)
    return df.withColumn("lang_pred", best)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 16-hex document fingerprint of normalized text."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "),
        r" +", " "))
    return df.withColumn("fingerprint", F.substring(F.md5(norm), 1, 16))


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-line
    fraction (array-native, no shuffle) and the most frequent word
    bigram with its count fraction (explode -> two-stage count ->
    window top-1 -> broadcast-size join back).

    The bigram leg shuffles on (doc, bigram) with partial aggregation,
    then on doc for the window — both keys are high-cardinality and
    skew-free by construction, so the plan holds at corpus scale; the
    line leg never leaves the row. Ties break by (count desc, bigram
    asc) so results are deterministic."""
    c = F.col(text_col)
    lines = F.split(c, "\n")
    # stage the token array in its own projection, then build bigrams
    # with zip_with over two shifted slices. NOT transform+element_at:
    # element_at(<toks expr>, i) inside a lambda re-evaluates its
    # array argument once per element, and optimizer rules
    # (CollapseProject, InferFiltersFromGenerate) inline the full
    # tokenizer there — O(tokens^2) per row, measured 22 s vs 3 s at
    # sf0.1. zip_with's arguments are evaluated once per row no
    # matter what gets inlined.
    staged = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.round((F.size(lines) - F.size(F.array_distinct(lines)))
                / F.greatest(F.size(lines), F.lit(1)), 6)
        .alias("dup_line_frac"),
        F.filter(F.split(F.lower(c), r"\s+"),
                 lambda t: t != F.lit("")).alias("_toks"))
    toks = F.col("_toks")
    n_big = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(F.slice(toks, 1, n_big),
                         F.slice(toks, 2, n_big),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    base = staged.select(id_col, "n_lines", "dup_line_frac",
                         bigrams.alias("bigrams"))
    counts = (base.select(id_col, F.explode("bigrams").alias("bigram"))
              .groupBy(id_col, "bigram").agg(F.count("*").alias("cnt")))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(),
                                           F.col("bigram"))
    top = (counts.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .select(id_col, F.col("bigram").alias("top_bigram"),
                   F.col("cnt").alias("top_bigram_cnt")))
    out = (base.select(id_col, "n_lines", "dup_line_frac",
                       F.size("bigrams").alias("n_bigrams"))
           .join(top, id_col, "left"))
    return out.select(
        id_col, "n_lines", "dup_line_frac", "n_bigrams",
        F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
        F.coalesce("top_bigram_cnt", F.lit(0)).cast("long")
        .alias("top_bigram_cnt"),
        F.round(F.coalesce("top_bigram_cnt", F.lit(0))
                / F.greatest("n_bigrams", F.lit(1)), 6)
        .alias("top_bigram_frac"))


def readability(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch reading-ease signals (the classic readability quality
    filter): words, sentence count (non-empty [.!?]+ splits),
    syllable proxy (vowel-group runs — the standard heuristic when
    no pronunciation dict ships). All three are exact integer counts
    so the closing FRE formula runs on identical inputs in any
    engine; one scan, pure Catalyst."""
    words = F.split(F.trim(F.regexp_replace(
        F.lower(F.col(text_col)), r"[^a-z ]", " ")), r" +")
    n_words = F.size(F.filter(words, lambda w: w != ""))
    sents = F.split(F.col(text_col), r"[.!?]+")
    n_sents = F.greatest(
        F.size(F.filter(sents, lambda s: F.trim(s) != "")), F.lit(1))
    n_syll = F.size(F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"), F.lit(0)))
    out = df.select(F.col(id_col), n_words.alias("n_words"),
                    n_sents.alias("n_sents"), n_syll.alias("n_syll"))
    fre = (F.lit(206.835)
           - F.lit(1.015) * F.col("n_words") / F.col("n_sents")
           - F.lit(84.6) * F.col("n_syll")
           / F.greatest(F.col("n_words"), F.lit(1)))
    return out.withColumn("fre", fre)


#: the 27 CP1252 punctuation remaps of bytes 0x80-0x9F (what a UTF-8
#: trail byte in that range shows as after a CP1252 misdecode)
_CP1252_REMAP = "".join(map(chr, [
    0x20AC, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021, 0x02C6,
    0x2030, 0x0160, 0x2039, 0x0152, 0x017D, 0x2018, 0x2019, 0x201C,
    0x201D, 0x2022, 0x2013, 0x2014, 0x02DC, 0x2122, 0x0161, 0x203A,
    0x0153, 0x017E, 0x0178]))
#: lead chars Â-Å (misdecoded 2-byte UTF-8 leads C2-C5,
#: covering Latin supplement through Cyrillic) and â (lead E2,
#: the 3-byte punctuation block behind 'â€™'); trail = Latin-1
#: 0x80-0xBF plus the CP1252 remaps
MOJIBAKE_RE = ("[\u00c2-\u00c5\u00e2]"
               "[\u0080-\u00bf" + _CP1252_REMAP + "]")


def mojibake_stats(text: Column) -> Column:
    """struct<n_moji:bigint, n_repl:bigint> — double-encoding artifact
    count (UTF-8 read as CP1252/Latin-1 and re-encoded: 'Ã©'
    for 'é', 'â€™' for a right quote) plus U+FFFD
    replacement-char count: the two standard corrupt-decode signals a
    crawl-cleaning pass filters on. Native regexp_count, lookaround-
    free pattern."""
    return F.struct(
        F.regexp_count(text, F.lit(MOJIBAKE_RE)).cast("long")
        .alias("n_moji"),
        F.regexp_count(text, F.lit("�")).cast("long")
        .alias("n_repl"))
