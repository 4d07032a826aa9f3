"""Checkpointed, resumable batch pipelines with per-partition lineage.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The real deployment target is Iceberg snapshots
(snapshot id per completed chunk); this container has no Iceberg jar, so
the same contract is implemented on plain parquet with the layout::

    <out>/chunk=<k>/...parquet + _SUCCESS     (the snapshot unit)
    <out>/_lineage/part-<k>.json              (lineage + metrics row)

A chunk is complete iff BOTH its _SUCCESS marker and its lineage row
exist (the lineage row is written after the data, so a crash between
the two re-runs the chunk — idempotent because chunk output is
overwritten atomically by Spark's job commit). ``resume()`` skips
completed chunks; ``lineage(spark)`` returns the metrics table.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class ResumableJob:
    def __init__(self, out_dir: str, name: str = "job"):
        self.out_dir = out_dir
        self.name = name
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)

    def _chunk_dir(self, k: int) -> str:
        return os.path.join(self.out_dir, f"chunk={k}")

    def _lineage_path(self, k: int) -> str:
        return os.path.join(self.lineage_dir, f"part-{k:05d}.json")

    def is_complete(self, k: int) -> bool:
        return (os.path.exists(os.path.join(self._chunk_dir(k), "_SUCCESS"))
                and os.path.exists(self._lineage_path(k)))

    def run(self, spark: SparkSession,
            chunk_df: Callable[[int], DataFrame], n_chunks: int,
            mode: str = "parquet") -> dict:
        """Process all incomplete chunks; returns summary metrics."""
        done = skipped = rows_total = 0
        t_start = time.time()
        for k in range(n_chunks):
            if self.is_complete(k):
                skipped += 1
                continue
            t0 = time.time()
            df = chunk_df(k)
            df.write.mode("overwrite").format(mode).save(self._chunk_dir(k))
            n_rows = spark.read.format(mode).load(self._chunk_dir(k)).count()
            wall_ms = int((time.time() - t0) * 1000)
            rec = {"job": self.name, "chunk": k, "rows": n_rows,
                   "wall_ms": wall_ms, "completed_at_ms":
                       int(time.time() * 1000), "status": "ok"}
            tmp = self._lineage_path(k) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, self._lineage_path(k))  # atomic commit
            done += 1
            rows_total += n_rows
        return {"chunks_done": done, "chunks_skipped": skipped,
                "rows_written": rows_total,
                "wall_s": round(time.time() - t_start, 3)}

    def lineage(self, spark: SparkSession) -> DataFrame:
        """The per-partition lineage/metrics table."""
        return spark.read.json(os.path.join(self.lineage_dir,
                                            "part-*.json"))

    def output(self, spark: SparkSession, mode: str = "parquet"
               ) -> DataFrame:
        return spark.read.format(mode).load(
            os.path.join(self.out_dir, "chunk=*"))
