"""Bucketed co-located joins — the shuffle-elimination strategy for
repeated big-big joins at 100 TB (BASELINE.json north_star:
'bucketing for co-located joins'). Writing both sides bucketed by the
join key lets Spark plan a SortMergeJoin with NO Exchange on either
side: the shuffle is paid once at write time and amortized over every
subsequent join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # spark-warehouse location is fixed at session start; use the
    # session's default warehouse with unique table names instead
    yield spark


def test_bucketed_join_eliminates_shuffle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .withColumnRenamed("vec_id", "doc_id")
    import shutil, uuid
    for t in ("b_docs", "b_emb"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        wh = spark.conf.get("spark.sql.warehouse.dir",
                            "spark-warehouse").replace("file:", "")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    docs.select("doc_id", "lang").write \
        .bucketBy(8, "doc_id").sortBy("doc_id") \
        .mode("overwrite").saveAsTable("b_docs")
    emb.select("doc_id").write \
        .bucketBy(8, "doc_id").sortBy("doc_id") \
        .mode("overwrite").saveAsTable("b_emb")
    # force the big-big join shape this demo is about: at test scale
    # the optimizer would auto-broadcast these tiny tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("b_docs").join(spark.table("b_emb"), "doc_id")
             .groupBy("lang").agg(F.count("*").alias("cnt")))
        plan = j._jdf.queryExecution().executedPlan().toString()
    # the join itself must read both bucketed sides with ZERO exchanges
        assert "SortMergeJoin" in plan
        # the bucketed sides feed the join with ZERO exchanges: the
        # only allowed hashpartitioning exchange is the groupBy's
        assert plan.count("Exchange hashpartitioning(doc_id") == 0
        rows = sorted(map(tuple, j.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    # result equals the shuffled-join result
    expected = (docs.select("doc_id", "lang")
                .join(emb.select("doc_id"), "doc_id")
                .groupBy("lang").agg(F.count("*").alias("cnt")))
    assert rows == sorted(map(tuple, expected.collect()))
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_emb")
