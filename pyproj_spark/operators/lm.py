"""Unigram language-model quality scoring — the CCNet/Gopher-style
corpus-perplexity gate of a training-data pipeline, distilled to its
distributed shape: train token statistics over the WHOLE corpus, then
score every document against them.

Plan shape (the part that must survive 100 TB):
  * train: explode -> groupBy(token) with partial aggregation (token
    cardinality is bounded by vocabulary growth, no hot keys beyond
    stopwords which partial-agg absorbs), then a global top-V via
    orderBy+limit — Spark executes that as TakeOrdered (per-partition
    heaps + driver merge), NOT a single-partition sort;
  * score: the V-row model is BROADCAST back; the only shuffle is the
    per-document aggregation, keyed by doc id (high-cardinality,
    skew-free).
All arithmetic is add-one smoothing over exact integer counts, so a
SQL oracle reproduces every logprob bit-for-bit up to libm ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tokenizer contract shared with the SQL oracle: lowercase maximal
#: [a-z0-9]+ runs
TOKEN_SPLIT_RE = r"[^a-z0-9]+"


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                    lambda t: t != F.lit(""))
    return df.select(*df.columns, F.explode(toks).alias("token"))


def train_unigram_lm(df: DataFrame, text_col: str = "text",
                     vocab_size: int = 100) -> DataFrame:
    """Token stats over the corpus: returns a (token, logp) model of
    the top ``vocab_size`` tokens with add-one smoothing over the
    TOTAL token count, plus one ``__oov__`` row carrying the
    out-of-vocabulary logprob. Small by construction — broadcast it."""
    counts = (_tokens(df.select(text_col), text_col)
              .groupBy("token").agg(F.count("*").alias("cnt")))
    total_df = counts.agg(F.sum("cnt").alias("total"))
    vocab = (counts.orderBy(F.col("cnt").desc(), F.col("token"))
             .limit(vocab_size))
    v = F.lit(vocab_size)
    lm = vocab.crossJoin(F.broadcast(total_df)).select(
        "token",
        F.log((F.col("cnt") + 1) / (F.col("total") + v)).alias("logp"))
    oov = total_df.select(
        F.lit("__oov__").alias("token"),
        F.log(1.0 / (F.col("total") + v)).alias("logp"))
    return lm.unionByName(oov)


def score_documents(df: DataFrame, lm: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    round_to: int = 5) -> DataFrame:
    """Per-document token count and mean unigram logprob (the
    perplexity proxy; lower = less like the corpus). Documents with
    zero tokens produce no row — same as the SQL oracle."""
    toks = _tokens(df.select(id_col, text_col), text_col) \
        .select(id_col, "token")
    oov = lm.filter(F.col("token") == "__oov__") \
        .select(F.col("logp").alias("oov_logp"))
    scored = (toks
              .join(F.broadcast(lm.filter(F.col("token") != "__oov__")),
                    "token", "left")
              .crossJoin(F.broadcast(oov))
              .select(id_col,
                      F.coalesce("logp", "oov_logp").alias("logp")))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_toks"),
                 F.round(F.avg("logp"), round_to).alias("mean_logp")))


def tfidf_keywords(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", top_k: int = 3,
                   round_to: int = 6) -> DataFrame:
    """Per-document TF-IDF keyword extraction: tf = term frequency
    within the doc, idf = ln((N+1)/(df+1)) + 1 (smoothed), top-k
    terms by (rounded score desc, token asc).

    Plan: one corpus aggregation for document frequencies (partial-
    agg groupBy token — stopword heat is absorbed map-side), one
    per-(doc, token) count, a token-keyed join to attach idf (Spark
    picks broadcast vs shuffle by the df-table's size — vocabulary,
    not corpus, scale), then the per-doc top-k window. Scores are
    rounded before ranking so the ordering is engine-independent."""
    toks = _tokens(df.select(id_col, text_col), text_col) \
        .select(id_col, "token")
    n_docs = df.count()  # scalar; one lightweight job
    dfreq = (toks.distinct().groupBy("token")
             .agg(F.count(F.lit(1)).alias("df")))
    idf = dfreq.select(
        "token",
        (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1)
        .alias("idf"))
    tf = (toks.groupBy(id_col, "token")
          .agg(F.count(F.lit(1)).alias("cnt")))
    totals = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("total"))
    scored = (tf.join(totals, id_col).join(idf, "token")
              .select(id_col, "token",
                      F.round((F.col("cnt") / F.col("total"))
                              * F.col("idf"), round_to)
                      .alias("score")))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(id_col, "rank", "token", "score"))
