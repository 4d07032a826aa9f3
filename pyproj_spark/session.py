"""SparkSession factory with scale-oriented defaults.

The confs here are the ones that matter at 100 TB: AQE (runtime
re-planning + skew-join splitting), a shuffle-partition count sized to
the local core count (on a real cluster this is set per-job), and Arrow
batching for the pandas-UDF kernels (the Spark analogue of pyproj's
64-point micro-batches — reference ``pyproj/transformer.py:1096-1099`` —
but sized for Arrow transfer amortization, not C-call overhead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Arrow batch size for pandas-UDF kernels. pyproj uses 64-point batches
#: because its per-call overhead is one C call; ours is a JVM->Python
#: Arrow round trip whose per-batch overhead dominates at small sizes —
#: measured on the flagship pipeline (5M anchor rows): 10k-row batches
#: 2.00 s, 65k 1.67 s, plateau beyond. Wide rows (binary payloads) are
#: bounded by Spark 4's spark.sql.execution.arrow.maxBytesPerBatch
#: (64 MB default), so the record cap can sit at the numeric-column
#: optimum without risking batch blowup on multimodal blobs.
ARROW_BATCH_ROWS = 65_536


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


#: JVM flags that remove the two measured sources of run-to-run stalls
#: in local mode: G1 concurrent cycles / heap resizing (ParallelGC +
#: fixed -Xms) and code-cache pressure from whole-stage-codegen class
#: churn (default 240m ReservedCodeCacheSize flushes hot methods).
#: Measured on this box: late-run spikes of 3-7x under defaults
#: disappear under these flags (see bench.py methodology notes).
STEADY_JVM_OPTS = ("-XX:ReservedCodeCacheSize=1g -XX:+UseParallelGC "
                   "-XX:CICompilerCount=4 -Xms20g")


def get_spark(app_name: str = "pyproj_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              java_opts: str | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for the engine.

    On a real cluster the same confs apply, minus ``master``; jobs are
    submitted with ``spark-submit --py-files pyproj_spark.zip``.
    ``java_opts`` (driver JVM flags) only takes effect for the process's
    FIRST session — pass it before any other get_spark call.
    """
    n = cores or default_parallelism()
    sp = shuffle_partitions or max(2 * n, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_ROWS))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions",
                                 java_opts)
    return builder.getOrCreate()
