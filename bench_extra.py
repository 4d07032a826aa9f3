"""Extra benchmarks for the optimization round (guide §1.4: noop-sink
isolation). NOT part of the driver contract — bench.py stays frozen.

Usage:
  python bench_extra.py flagship [runs]
      stage-by-stage noop timings of the flagship pipeline at the
      full-machine level (same input + confs as bench.py's 32-core
      child).
  python bench_extra.py queries name1,name2 [passes]
      per-query build-vs-execute split at $SPARK_GRAFT_SF_DIR:
      t_build = python call that constructs the DataFrame (driver-side
      plan construction), t_exec = noop write (analysis + execution).
  python bench_extra.py all [passes]
      one timed pass over every declared query (same methodology as
      bench.py's query loop) — for before/after comparisons while
      iterating; prints a sorted table and writes BENCH_extra.json.
  python bench_extra.py explain name1,name2 [suffix]
      dump .explain("formatted") for the named queries to
      plans/r06/<name>_<suffix>.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _spark():
    from pyproj_spark.session import STEADY_JVM_OPTS, get_spark
    return get_spark("bench-extra", cores=CPUS,
                     java_opts=STEADY_JVM_OPTS)


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _warm(spark):
    from pyspark.sql import functions as F

    from pyproj_spark.functions.transform import transform_xy
    warm = spark.range(CPUS * 4).select(
        transform_xy("EPSG:4326", "EPSG:3857",
                     (F.col("id") % 360 - 180.0).cast("double"),
                     F.lit(10.0)).alias("xy"))
    warm.write.format("noop").mode("overwrite").save()


def flagship(runs: int = 6):
    from pyspark.sql import functions as F

    from pyproj_spark.functions import cells
    from pyproj_spark.functions.tiles import tile_xy
    from pyproj_spark.operators.extract import (
        extract_anchors, normalize_and_project,
    )
    spark = _spark()
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(4 * 1024 * 1024))
    path = "/tmp/pyproj_spark_bench_pages_2000000"
    pages = spark.read.parquet(path)

    def full_df():
        a = extract_anchors(pages, normalize_crs=False) \
            .select("x", "y", "src_crs")
        p = normalize_and_project(F.col("x"), F.col("y"),
                                  F.col("src_crs"))
        a = a.select(p.alias("p"))
        tx, ty = tile_xy(F.col("p.px"), F.col("p.py"), 8)
        return (a.withColumn("cell", cells.cell_of(F.col("p.lon"),
                                                   F.col("p.lat"),
                                                   cells.DEFAULT_RES))
                .withColumn("tx", tx).withColumn("ty", ty)
                .groupBy("tx", "ty").agg(F.count("*").alias("n_anchors")))

    a_raw = extract_anchors(pages, normalize_crs=False)
    p = normalize_and_project(F.col("x"), F.col("y"), F.col("src_crs"))
    stages = {
        "scan_text": pages.select("text"),
        "explode_matches": pages.select(F.posexplode(
            F.regexp_extract_all(
                "text",
                F.lit(r"@geo\((-?\d+\.\d+),(-?\d+\.\d+)"
                      r"(?:,(EPSG:\d+))?\)"), 0))
            .alias("i", "m")),
        "extract_parsed": a_raw.select("x", "y", "src_crs"),
        "plus_udf": a_raw.select("x", "y", "src_crs")
        .select(p.alias("p")),
        "full": full_df(),
    }
    _warm(spark)
    out = {}
    for name, df in stages.items():
        spark.sparkContext.setJobDescription(f"flagship:{name}")
        times = [_noop(df) for _ in range(runs)]
        out[name] = round(min(times), 3)
        print(name, [round(t, 3) for t in times], "min",
              out[name], flush=True)
    print(json.dumps(out))


def queries(names: list[str], passes: int = 3):
    import __spark_entry__ as entrymod
    spark = _spark()
    _warm(spark)
    qs = entrymod.queries()
    rows = {}
    for _ in range(passes):
        for name in names:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            b, e = rows.setdefault(name, ([], []))
            b.append(t1 - t0)
            e.append(t2 - t1)
    for name, (b, e) in rows.items():
        print(f"{name:22s} build {min(b):6.3f}  exec {min(e):6.3f}  "
              f"(builds {[round(x, 2) for x in b]}, "
              f"execs {[round(x, 2) for x in e]})")


def all_queries(passes: int = 1):
    import __spark_entry__ as entrymod
    spark = _spark()
    _warm(spark)
    samples: dict = {}
    for _ in range(passes):
        for name, fn in entrymod.queries().items():
            t0 = time.time()
            try:
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                samples.setdefault(name, []).append(time.time() - t0)
            except Exception as e:
                samples.setdefault(name, []).append(
                    f"ERROR {type(e).__name__}: {e}")
    qtimes = {}
    for name, ss in samples.items():
        errs = [s for s in ss if isinstance(s, str)]
        qtimes[name] = errs[0] if errs else round(min(ss), 3)
    flo = {k: v for k, v in qtimes.items() if isinstance(v, float)}
    for k, v in sorted(flo.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{k:24s} {v:6.3f}")
    errs = {k: v for k, v in qtimes.items() if isinstance(v, str)}
    for k, v in errs.items():
        print(f"{k:24s} {v}")
    print(f"total {sum(flo.values()):.1f}s over {len(flo)} queries,"
          f" {len(errs)} errors")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_extra.json"), "w") as f:
        json.dump(qtimes, f)


def explain(names: list[str], suffix: str = "before"):
    import __spark_entry__ as entrymod
    spark = _spark()
    qs = entrymod.queries()
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"),
                  "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "flagship":
        flagship(int(sys.argv[2]) if len(sys.argv) > 2 else 6)
    elif mode == "queries":
        queries(sys.argv[2].split(","),
                int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif mode == "all":
        all_queries(int(sys.argv[2]) if len(sys.argv) > 2 else 1)
    elif mode == "explain":
        explain(sys.argv[2].split(","),
                sys.argv[3] if len(sys.argv) > 3 else "before")
    else:
        raise SystemExit(f"unknown mode {mode}")
