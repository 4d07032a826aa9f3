"""Iceberg-style snapshot tables: time travel, incremental (CDC) reads,
rollback, snapshot expiry — on plain parquet.

North-rule target: "resumable from Iceberg-snapshot checkpoints". The
container has no Iceberg jar, so this reproduces the snapshot CONTRACT
(Iceberg spec v2 semantics, scoped to append/overwrite) with the same
commit discipline Iceberg uses — data files first, then one atomic
metadata swap::

    <dir>/data/snap=<id>/...parquet      data files added by snapshot id
    <dir>/_snapshots/v<id>.json          manifest: id, parent, operation,
                                         timestamp, ACTIVE data dirs
    <dir>/_snapshots/HEAD                current snapshot id (atomic)

A snapshot is visible iff its manifest exists; manifests and HEAD are
written tmp-then-``os.replace`` (atomic on POSIX), so a crash between
the data write and the manifest swap leaves an orphan data dir that no
reader ever sees (exactly Iceberg's orphan-file semantics; cleaned by
``expire_snapshots``). Readers never list data dirs — they read the
file set OF A MANIFEST, which is what makes time travel and rollback
O(1) metadata operations. When the real Iceberg jar is available the
call sites swap to ``df.writeTo(...).createOrReplace()`` /
``spark.read.option("snapshot-id", ...)`` unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, table_dir: str):
        self.dir = table_dir
        self.meta = os.path.join(table_dir, "_snapshots")
        os.makedirs(self.meta, exist_ok=True)

    # ------------------------------------------------------- metadata
    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self.meta, f"v{sid:06d}.json")

    def _read_manifest(self, sid: int) -> dict:
        with open(self._manifest_path(sid)) as f:
            return json.load(f)

    def _atomic_write(self, path: str, payload: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, path)

    def current_snapshot(self) -> int | None:
        head = os.path.join(self.meta, "HEAD")
        if not os.path.exists(head):
            return None
        with open(head) as f:
            return int(f.read().strip())

    def snapshot_ids(self) -> list[int]:
        return sorted(int(n[1:-5]) for n in os.listdir(self.meta)
                      if n.startswith("v") and n.endswith(".json"))

    # --------------------------------------------------------- commit
    def commit(self, df: DataFrame, operation: str = "append") -> int:
        """Write df as a new snapshot. operation: 'append' keeps the
        parent's data files active; 'overwrite' starts a fresh file
        set. Returns the new snapshot id."""
        if operation not in ("append", "overwrite"):
            raise ValueError(f"unsupported operation {operation!r}")
        parent = self.current_snapshot()
        sid = (max(self.snapshot_ids()) + 1) if self.snapshot_ids() else 1
        data_dir = os.path.join(self.dir, "data", f"snap={sid}")
        df.write.mode("overwrite").parquet(data_dir)
        active = [data_dir]
        if operation == "append" and parent is not None:
            active = self._read_manifest(parent)["active"] + active
        manifest = {"snapshot_id": sid, "parent_id": parent,
                    "operation": operation,
                    "committed_at_ms": int(time.time() * 1000),
                    "added": [data_dir], "active": active}
        # Iceberg commit order: data first (above), then manifest, then
        # the HEAD swap — each step atomic, any prefix crash-invisible
        self._atomic_write(self._manifest_path(sid),
                           json.dumps(manifest))
        self._atomic_write(os.path.join(self.meta, "HEAD"), str(sid))
        return sid

    # -------------------------------------------------------- readers
    def read(self, spark: SparkSession,
             as_of: int | None = None) -> DataFrame:
        """The table at a snapshot (default: current). Time travel is a
        metadata lookup — no data listing."""
        sid = self.current_snapshot() if as_of is None else as_of
        if sid is None:
            raise ValueError("table has no snapshots")
        active = self._read_manifest(sid)["active"]
        return spark.read.parquet(*active)

    def incremental(self, spark: SparkSession, from_id: int,
                    to_id: int | None = None) -> DataFrame:
        """CDC read: rows ADDED after from_id (exclusive) up to to_id
        (inclusive), following parent links. Raises on an overwrite in
        the range — its delta is not expressible as appended files
        (Iceberg's incremental-scan contract)."""
        to_id = self.current_snapshot() if to_id is None else to_id
        added: list[str] = []
        sid = to_id
        while sid is not None and sid != from_id:
            m = self._read_manifest(sid)
            if m["operation"] != "append":
                raise ValueError(
                    f"snapshot {sid} is {m['operation']!r}: incremental"
                    " read only spans append snapshots")
            added = m["added"] + added
            sid = m["parent_id"]
        if sid != from_id:
            raise ValueError(f"{from_id} is not an ancestor of {to_id}")
        if not added:
            return self.read(spark, to_id).limit(0)
        return spark.read.parquet(*added)

    def snapshots(self, spark: SparkSession) -> DataFrame:
        """The snapshot log as a DataFrame (id, parent, operation,
        committed_at_ms, n_added_dirs)."""
        rows = [self._read_manifest(s) for s in self.snapshot_ids()]
        return spark.createDataFrame(
            [(m["snapshot_id"], m["parent_id"], m["operation"],
              m["committed_at_ms"], len(m["added"])) for m in rows],
            "snapshot_id long, parent_id long, operation string, "
            "committed_at_ms long, n_added_dirs int")

    # ----------------------------------------------------- management
    def rollback(self, to_id: int) -> None:
        """Point HEAD at an older snapshot (O(1); later snapshots stay
        readable by id until expired — Iceberg rollback semantics)."""
        if to_id not in self.snapshot_ids():
            raise ValueError(f"unknown snapshot {to_id}")
        self._atomic_write(os.path.join(self.meta, "HEAD"), str(to_id))

    def expire_snapshots(self, keep: list[int]) -> list[str]:
        """Drop manifests not in `keep` (current is always kept) and
        delete data dirs no kept manifest references — including
        orphans from crashed commits. Returns deleted paths."""
        keep = set(keep) | {self.current_snapshot()}
        referenced: set[str] = set()
        for sid in list(self.snapshot_ids()):
            if sid in keep:
                referenced.update(self._read_manifest(sid)["active"])
            else:
                os.remove(self._manifest_path(sid))
        deleted = []
        data_root = os.path.join(self.dir, "data")
        for name in (os.listdir(data_root)
                     if os.path.isdir(data_root) else []):
            path = os.path.join(data_root, name)
            if path not in referenced:
                shutil.rmtree(path)
                deleted.append(path)
        return deleted
