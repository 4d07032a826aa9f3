"""Checkpoint/resume with lineage + skew-salting correctness."""

import pyspark.sql.functions as F
import pytest

from pyproj_spark.operators.checkpoint import ResumableJob
from pyproj_spark.operators.skew import salted_agg, salted_broadcast_join


def test_resumable_job_resumes(spark, tmp_path):
    out = str(tmp_path / "job_out")
    calls = []
    crashed = []

    def chunk(k):
        calls.append(k)
        if k == 3 and not crashed:
            crashed.append(True)
            raise RuntimeError("simulated crash in chunk 3")
        return spark.range(k * 100, (k + 1) * 100).withColumn(
            "v", F.col("id") * 2)

    job = ResumableJob(out, "test")
    with pytest.raises(RuntimeError):
        job.run(spark, chunk, n_chunks=6)
    # chunks 0-2 done, 3 crashed
    assert job.is_complete(2) and not job.is_complete(3)

    # resume: must NOT recompute 0-2
    calls.clear()
    summary = job.run(spark, chunk, n_chunks=6)
    assert summary["chunks_skipped"] == 3
    assert summary["chunks_done"] == 3
    assert sorted(set(calls)) == [3, 4, 5]

    # full output + lineage metrics
    assert job.output(spark).count() == 600
    lin = job.lineage(spark).toPandas()
    assert len(lin) == 6
    assert (lin["rows"] == 100).all()
    assert (lin["wall_ms"] > 0).all()
    assert set(lin["chunk"]) == set(range(6))

    # idempotent third run: everything skipped
    calls.clear()
    summary = job.run(spark, chunk, n_chunks=6)
    assert summary["chunks_done"] == 0 and summary["chunks_skipped"] == 6
    assert calls == []


def test_salted_agg_matches_plain(spark):
    # heavy skew: 90% of rows on one key
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 100).alias("cell"),
        (F.col("id") * 1.5).alias("x"))
    got = salted_agg(df, ["cell"], {
        "n": (F.count("*"), F.sum("n")),
        "x_max": (F.max("x"), F.max("x_max")),
        "x_sum": (F.sum("x"), F.sum("x_sum")),
    }).toPandas().set_index("cell").sort_index()
    ref = df.groupBy("cell").agg(
        F.count("*").alias("n"), F.max("x").alias("x_max"),
        F.sum("x").alias("x_sum")).toPandas().set_index("cell").sort_index()
    assert (got["n"] == ref["n"]).all()
    assert (got["x_max"] == ref["x_max"]).all()
    assert got["x_sum"].round(3).equals(ref["x_sum"].round(3))


def test_salted_broadcast_join_matches_plain(spark):
    big = spark.range(10000).select(
        F.pmod(F.col("id"), F.lit(5)).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(5)],
                                  ["k", "name"])
    got = salted_broadcast_join(big, small, "k")
    ref = big.join(small, "k")
    assert got.count() == ref.count() == 10000
    assert got.groupBy("name").count().orderBy("name").collect() == \
        ref.groupBy("name").count().orderBy("name").collect()
