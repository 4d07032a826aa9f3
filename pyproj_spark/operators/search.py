"""Full-text ranked retrieval: BM25 (Okapi) over a document corpus.

The search primitive of a web-text pipeline (reference scope: the
driver-mandated text-analysis family; BM25 per Robertson & Walker,
"Okapi at TREC-3", 1994 — public formula). Spark-first plan:

* one corpus pass builds per-(doc, token) term frequencies and doc
  lengths — both partial-aggregated groupBys;
* the query set is a tiny literal table, so document frequencies and
  idf are computed only for query terms (the term filter collapses
  map-side before any shuffle) and the per-term join is broadcast —
  vocabulary never shuffles at corpus scale;
* per-term scores are rounded to micros (1e-6) and summed as LONGS,
  which makes the per-doc score sum associative and therefore
  independent of Spark's aggregation order — the property that lets a
  SQL oracle replay the exact ranking bit-for-bit.

At 100 TB: the only wide exchanges are the (doc, token) count for
query terms (bounded by |terms| × docs-containing-them) and the final
per-query top-k window; both are partial-aggregated and the query
table broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyproj_spark.operators.lm import _tokens

K1 = 1.2
B = 0.75


def bm25_search(df: DataFrame, queries: list[tuple[int, list[str]]],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = K1, b: float = B, top_k: int = 10,
                ) -> DataFrame:
    """Rank documents for each query by BM25.

    queries: [(query_id, [lowercase terms...]), ...] — a small literal
    set (broadcast). Returns (query_id, rank, id_col, score) with
    score = sum over query terms of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)), each term's
    contribution rounded to 1e-6 before an exact integer sum.
    Ties break on ascending document id.
    """
    spark = df.sparkSession
    terms = sorted({t for _, ts in queries for t in ts})
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in queries for t in set(ts)],
        ["query_id", "token"])

    toks = _tokens(df.select(id_col, text_col), text_col) \
        .select(id_col, "token")
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    # corpus scalars ride as 1-row broadcast aggregates instead of
    # two driver jobs at build time (one of which re-ran the whole
    # tokenize pass just to collect avgdl). avgdl is still an EXACT
    # integer sum/count with a single double division, and b/avgdl is
    # the same IEEE ops on the same values whether evaluated in the
    # plan or on the driver — bit-identical scores (oracle-gated).
    ndocs_1 = df.agg(F.count(F.lit(1)).cast("double").alias("_nd"))
    avgdl_1 = dl.agg((F.sum("dl") / F.count(F.lit(1)))
                     .alias("_avgdl"))

    qtoks = toks.filter(F.col("token").isin(terms))
    tf = (qtoks.groupBy(id_col, "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    # df(t) = number of docs containing t = row count of the per-doc
    # tf table — same number as distinct(doc, token) counting, one
    # less evaluation of the token pipeline and no distinct exchange
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = (dfreq.crossJoin(F.broadcast(ndocs_1))
           .select(
               "token",
               F.log(1.0 + (F.col("_nd") - F.col("df") + 0.5)
                     / (F.col("df") + 0.5)).alias("idf")))

    denom = (F.col("tf")
             + k1 * (1.0 - b + (F.lit(b) / F.col("_avgdl"))
                     * F.col("dl")))
    term_score = F.col("idf") * F.col("tf") * (k1 + 1.0) / denom
    scored = (tf.join(F.broadcast(idf), "token")
              .join(dl, id_col)
              .crossJoin(F.broadcast(avgdl_1))
              .join(F.broadcast(qdf), "token")
              .select("query_id", id_col,
                      F.round(term_score * 1e6).cast("long")
                      .alias("micros")))
    total = (scored.groupBy("query_id", id_col)
             .agg(F.sum("micros").alias("sm"))
             .select("query_id", id_col,
                     (F.col("sm") / 1e6).alias("score")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col))
    return (total.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "rank", id_col, "score"))


def bm25_sql(queries: list[tuple[int, list[str]]],
             k1: float = K1, b: float = B, top_k: int = 10) -> str:
    """DuckDB oracle replaying the identical plan (same tokenizer
    split, same idf, same micros rounding, same tie-break)."""
    terms = sorted({t for _, ts in queries for t in ts})
    tlist = ", ".join(f"'{t}'" for t in terms)
    qrows = ", ".join(f"({qid}, '{t}')"
                      for qid, ts in queries for t in sorted(set(ts)))
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS token
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
scal AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl
),
qt AS (SELECT * FROM toks WHERE token IN ({tlist})),
tf AS (SELECT doc_id, token, count(*) AS tf FROM qt GROUP BY 1, 2),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM qt GROUP BY 1),
idf AS (
  SELECT token,
         ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
             AS idf
  FROM dfreq, scal
),
q AS (SELECT * FROM (VALUES {qrows}) AS q(query_id, token)),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(round(idf * tf * ({k1!r} + 1.0)
                    / (tf + {k1!r} * (1.0 - {b!r}
                       + ({b!r} / avgdl) * dl)) * 1e6) AS BIGINT)
             AS micros
  FROM tf JOIN idf USING (token) JOIN dl USING (doc_id)
          JOIN q USING (token) CROSS JOIN scal
),
total AS (
  SELECT query_id, doc_id, sum(micros) / 1e6 AS score
  FROM scored GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS rank
  FROM total) WHERE rank <= {top_k}
"""


#: RAKE phrase delimiters: function words that cannot appear inside a
#: keyword candidate (Rose et al. 2010 use a stoplist exactly this way)
RAKE_STOPWORDS = (
    "the a an and or of to in on for with is are was were be been at by"
    " from as that this it its not no but if then than so such these"
    " those there here he she they we you i his her their our your my"
).split()


def rake_keywords(df: DataFrame, text_col: str = "text",
                  top_k: int = 30, max_words: int = 4) -> DataFrame:
    """RAKE keyword extraction (Rapid Automatic Keyword Extraction):
    candidate phrases are maximal stopword-free word runs; each word
    scores deg(w)/freq(w) (degree = summed length of phrase
    occurrences containing it); a phrase scores the sum of its word
    scores. Word scores quantize to exact integer MICRO units before
    the per-phrase sum, so distributed aggregation order cannot move
    the result — the repo's standard float-sum discipline.

    Shape: two corpus passes (word stats, then phrase scores), both
    hash aggs; the phrase→word explode is bounded by max_words. The
    final top-k is one TakeOrdered."""
    # punctuation is a phrase delimiter (a keyword never crosses a
    # sentence/clause boundary), NOT whitespace — so substitute the
    # delimiter char BEFORE stopword splitting
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z ]", "|")
    stoppat = r"\b(" + "|".join(RAKE_STOPWORDS) + r")\b"
    phrases = F.filter(
        F.transform(F.split(F.regexp_replace(norm, stoppat, "|"), r"\|"),
                    lambda p: F.trim(F.regexp_replace(p, r" +", " "))),
        lambda p: (p != "") & (F.size(F.split(p, " ")) <= max_words))
    occ = df.select(F.explode(phrases).alias("phrase"))
    words = occ.select("phrase", F.size(F.split("phrase", " "))
                       .alias("plen"),
                       F.explode(F.split("phrase", " ")).alias("word"))
    stats = (words.groupBy("word")
             .agg(F.count(F.lit(1)).alias("freq"),
                  F.sum("plen").alias("deg"))
             .withColumn("w_micro",
                         F.round(F.lit(1e6) * F.col("deg") / F.col("freq"))
                         .cast("long")))
    uniq = (occ.groupBy("phrase")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .withColumn("word", F.explode(F.split("phrase", " "))))
    scored = (uniq.join(stats.select("word", "w_micro"), "word")
              .groupBy("phrase")
              .agg(F.max("n_occ").alias("n_occ"),
                   F.sum("w_micro").alias("score_micro")))
    return (scored.orderBy(F.desc("score_micro"), F.asc("phrase"))
            .limit(top_k))
