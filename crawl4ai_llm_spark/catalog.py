"""Snapshot-committed table catalog — the Iceberg seam (SURVEY.md §7.4).

On a production cluster the engine targets Iceberg tables
(``df.writeTo(t).append()``, ``MERGE INTO``, snapshot rollback). This sandbox
has no Iceberg runtime jar and no network, so the same contract is provided
by partitioned Parquet directories plus a JSON *manifest log*: every commit
writes new parquet files under ``data/`` and then atomically publishes a new
manifest (snapshot id, list of live files, counters) via rename. Readers
resolve the latest manifest and read exactly its file list — giving the
atomic-commit, read-committed, resume-from-snapshot semantics the north rule
requires, with a one-line swap to Iceberg when the jar is present.

Why not plain ``df.write.parquet(mode="append")``: a killed job would leave
half-written files visible to the next reader. The manifest makes a wave's
output all-or-nothing (replaces the reference's non-atomic file+index double
write, ref json_storage.py:200-221, whose crash window SURVEY.md §3.2
documents).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: int
    files: list[str]
    counters: dict[str, int] = field(default_factory=dict)
    parent_id: int | None = None


class Table:
    """One snapshot-committed table rooted at ``root``.

    ``merge_schema`` turns on parquet footer merging at read time — needed
    only for schema-on-read tables (ProductStore); fixed-schema engine
    tables skip it (footer scans grow with the file count otherwise).

    ``bucket_by=(col, n)`` hash-buckets every committed file by
    ``pmod(hash(col), n)`` into ``_bucket=K/`` directories (the Iceberg
    ``bucket(n, col)`` partition-transform analog). Point lookups then read
    1/n of the files (``read(buckets={...})``) and mutations rewrite only
    the touched buckets (``replace_buckets``) instead of the whole table.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        merge_schema: bool = False,
        bucket_by: tuple[str, int] | None = None,
    ):
        self.spark = spark
        self.merge_schema = merge_schema
        self.bucket_by = bucket_by
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "meta")
        try:
            os.makedirs(self.data_dir, exist_ok=True)
            os.makedirs(self.meta_dir, exist_ok=True)
        except OSError as e:
            # reference contract: backend unreachable/unwritable surfaces as
            # StorageConnectionError (ref storage/base.py:14-16), not a raw
            # OS error
            from crawl4ai_llm_spark.errors import StorageConnectionError

            raise StorageConnectionError(f"warehouse not writable: {root}: {e}") from e

    # --- snapshot log --------------------------------------------------------

    def _head_path(self) -> str:
        return os.path.join(self.meta_dir, "HEAD")

    def current_snapshot(self) -> Snapshot | None:
        try:
            with open(self._head_path()) as f:
                sid = int(f.read().strip())
        except FileNotFoundError:
            return None
        return self.snapshot(sid)

    def snapshot(self, snapshot_id: int) -> Snapshot:
        with open(os.path.join(self.meta_dir, f"snap-{snapshot_id}.json")) as f:
            d = json.load(f)
        return Snapshot(d["snapshot_id"], d["files"], d.get("counters", {}), d.get("parent_id"))

    _SNAP_RE = re.compile(r"^snap-(\d+)\.json$")

    def snapshots(self) -> list[Snapshot]:
        # Parse ONLY published manifests. A crash between the tmp write and
        # os.replace in _publish leaves a snap-N.json.tmp-<uuid> file in this
        # directory; matching it here would break resume in exactly the crash
        # window the manifest log exists to survive.
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            m = self._SNAP_RE.match(name)
            if m:
                out.append(self.snapshot(int(m.group(1))))
        return sorted(out, key=lambda s: s.snapshot_id)

    def clean_stale_tmp(self) -> int:
        """Delete orphaned ``*.tmp-*`` manifest files left by a crash before
        the atomic rename. Safe any time: a tmp file is invisible to readers
        (never matched by _SNAP_RE) and its writer is gone."""
        n = 0
        for name in os.listdir(self.meta_dir):
            if ".tmp-" in name:
                os.unlink(os.path.join(self.meta_dir, name))
                n += 1
        return n

    def _publish(self, snap: Snapshot) -> None:
        try:
            path = os.path.join(self.meta_dir, f"snap-{snap.snapshot_id}.json")
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "snapshot_id": snap.snapshot_id,
                        "parent_id": snap.parent_id,
                        "files": snap.files,
                        "counters": snap.counters,
                    },
                    f,
                )
            os.replace(tmp, path)  # atomic manifest write
            head_tmp = self._head_path() + f".tmp-{uuid.uuid4().hex}"
            with open(head_tmp, "w") as f:
                f.write(str(snap.snapshot_id))
            os.replace(head_tmp, self._head_path())  # atomic pointer swap
        except OSError as e:
            from crawl4ai_llm_spark.errors import StorageConnectionError

            raise StorageConnectionError(
                f"cannot publish snapshot under {self.meta_dir}: {e}"
            ) from e

    # --- commits -------------------------------------------------------------

    def _write_files(self, df: DataFrame) -> list[str]:
        """Materialize df as new parquet files; return their paths.

        One distributed write — Spark tasks are the fan-out (replaces the
        reference's asyncio.gather thread fan-out, json_storage.py:279-293).
        Bucketed tables re-derive ``_bucket`` from the data (so compaction
        and merge rewrites stay correctly bucketed), shuffle on it once so
        each commit produces ≤1 file per touched bucket, and write it as a
        partition directory — it is never a data column.
        """
        from pyspark.sql import functions as F

        out_dir = os.path.join(self.data_dir, f"commit-{uuid.uuid4().hex}")
        if self.bucket_by is not None:
            col, n = self.bucket_by
            bucketed = df.withColumn("_bucket", F.pmod(F.hash(F.col(col)), F.lit(n)))
            bucketed.repartition(n, F.col("_bucket")).write.partitionBy("_bucket").parquet(
                out_dir, mode="overwrite"
            )
            return [
                os.path.join(dirpath, name)
                for dirpath, _, names in os.walk(out_dir)
                for name in names
                if name.endswith(".parquet")
            ]
        df.write.parquet(out_dir, mode="overwrite")
        return [
            os.path.join(out_dir, name)
            for name in os.listdir(out_dir)
            if name.endswith(".parquet")
        ]

    @staticmethod
    def _file_bucket(path: str) -> int | None:
        """Bucket id encoded in a file's partition directory, None if the
        file predates bucketing (legacy layout)."""
        m = re.search(r"/_bucket=(\d+)/", path)
        return int(m.group(1)) if m else None

    def _next_id(self, parent: Snapshot | None) -> int:
        return (parent.snapshot_id + 1) if parent else 1

    def _write_pylist(self, rows: list[dict], schema=None) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        out_dir = os.path.join(self.data_dir, f"commit-{uuid.uuid4().hex}")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "part-0.parquet")
        # explicit schema when the table is ALSO written by Spark jobs:
        # from_pylist infers int64 where Spark wrote int32, and mixed
        # physical types across files break the table's schema merge
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
        return path

    def append_pylist(
        self, rows: list[dict], counters: dict[str, int] | None = None, schema=None
    ) -> Snapshot:
        """Append a small driver-side row list WITHOUT a Spark job — one
        pyarrow parquet write. For metadata-sized tables (checkpoints,
        per-wave dup pairs): launching a distributed job to write a few
        rows is pure latency. ``schema``: optional pyarrow schema, needed
        when Spark jobs also write this table (physical-type parity)."""
        path = self._write_pylist(rows, schema=schema)
        parent = self.current_snapshot()
        snap = Snapshot(
            self._next_id(parent),
            (parent.files if parent else []) + [path],
            counters or {},
            parent.snapshot_id if parent else None,
        )
        self._publish(snap)
        return snap

    def overwrite_pylist(
        self, rows: list[dict], counters: dict[str, int] | None = None
    ) -> Snapshot:
        path = self._write_pylist(rows)
        parent = self.current_snapshot()
        snap = Snapshot(
            self._next_id(parent), [path], counters or {}, parent.snapshot_id if parent else None
        )
        self._publish(snap)
        return snap

    def append(self, df: DataFrame, counters: dict[str, int] | None = None) -> Snapshot:
        parent = self.current_snapshot()
        files = self._write_files(df)
        snap = Snapshot(
            self._next_id(parent),
            (parent.files if parent else []) + files,
            counters or {},
            parent.snapshot_id if parent else None,
        )
        self._publish(snap)
        return snap

    def overwrite(self, df: DataFrame, counters: dict[str, int] | None = None) -> Snapshot:
        parent = self.current_snapshot()
        files = self._write_files(df)
        snap = Snapshot(
            self._next_id(parent),
            files,
            counters or {},
            parent.snapshot_id if parent else None,
        )
        self._publish(snap)
        return snap

    def truncate(self, counters: dict[str, int] | None = None) -> Snapshot:
        """Publish an empty snapshot — the rollback target for 'before any
        data existed'. A kill during the FIRST wave that writes a table
        leaves a snapshot no rollback() can rewind past (there is no
        earlier snapshot id); resume() truncates such tables instead, so a
        re-run wave never double-appends."""
        parent = self.current_snapshot()
        snap = Snapshot(
            self._next_id(parent), [], counters or {},
            parent.snapshot_id if parent else None,
        )
        self._publish(snap)
        return snap

    def compact(self, target_partitions: int = 8, counters: dict[str, int] | None = None) -> Snapshot | None:
        """Rewrite the live file set into ``target_partitions`` files — the
        maintenance commit a long crawl runs every K waves (append-only
        tables otherwise accumulate cores×waves files, and every reader
        pays the footer scans). Same data, new snapshot; old snapshots
        still reference the old files (rollback still works)."""
        current = self.read()
        if current is None:
            return None
        snap = self.current_snapshot()
        return self.overwrite(
            current.coalesce(target_partitions),
            counters=counters or (snap.counters if snap else {}),
        )

    def expire_snapshots(self, keep_last: int = 10) -> dict[str, int]:
        """Iceberg ``expire_snapshots`` parity — the maintenance op that
        bounds storage on long-running tables: drop all but the newest
        ``keep_last`` manifests and delete any data file referenced ONLY by
        dropped snapshots. Irreversible: rollback past the horizon becomes
        impossible (time travel is traded for space, exactly as in
        Iceberg). HEAD is always the newest snapshot (rollback publishes a
        NEW child), so the current table state is never touched.

        Without this, an append-per-wave crawl retains cores×waves parquet
        files forever — compaction bounds the LIVE file count but every
        superseded file stays referenced by an old manifest."""
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return {"removed_snapshots": 0, "removed_files": 0}
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        live = {f for s in keep for f in s.files}
        removed_files = 0
        for s in drop:
            for f in s.files:
                if f not in live and os.path.exists(f):
                    os.unlink(f)
                    removed_files += 1
            manifest = os.path.join(self.meta_dir, f"snap-{s.snapshot_id}.json")
            if os.path.exists(manifest):
                os.unlink(manifest)
        # sweep now-empty commit/bucket directories (cosmetic, best-effort)
        for dirpath, dirnames, filenames in os.walk(self.data_dir, topdown=False):
            if dirpath != self.data_dir and not dirnames and not filenames:
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass
        return {"removed_snapshots": len(drop), "removed_files": removed_files}

    def retag(self, counters: dict[str, int]) -> Snapshot | None:
        """Publish a new snapshot with the SAME file list and new counters —
        a metadata-only commit (Iceberg snapshot-properties analog). Used to
        mark state on a table without touching data, e.g. the frontier
        engine's deferred-rebuild ``stale`` flag on the Bloom filter table.
        No-op (returns None) on an empty table."""
        parent = self.current_snapshot()
        if parent is None:
            return None
        snap = Snapshot(self._next_id(parent), parent.files, counters, parent.snapshot_id)
        self._publish(snap)
        return snap

    def rollback(self, snapshot_id: int) -> Snapshot:
        """Reset HEAD to an earlier snapshot (Iceberg rollback analog).

        The reference degrades a corrupted index to ``{}`` silently
        (json_storage.py:134-136); the engine's policy is explicit rollback
        instead (SURVEY.md §4).
        """
        snap = self.snapshot(snapshot_id)
        child = Snapshot(self._next_id(self.current_snapshot()), snap.files, snap.counters, snapshot_id)
        self._publish(child)
        return child

    # --- reads ---------------------------------------------------------------

    def read(
        self, snapshot_id: int | None = None, buckets: set[int] | None = None
    ) -> DataFrame | None:
        """Read the snapshot's live files. ``buckets`` prunes the file list
        to those bucket directories (plus any legacy unbucketed files, which
        could hold any key) — the point-lookup path reads 1/n of the data.
        """
        snap = self.snapshot(snapshot_id) if snapshot_id else self.current_snapshot()
        if snap is None or not snap.files:
            return None
        files = snap.files
        if buckets is not None:
            files = [
                f for f in files if (b := self._file_bucket(f)) is None or b in buckets
            ]
            if not files:
                return None
        reader = self.spark.read
        if self.merge_schema:
            # appended batches may carry new columns (schema-on-read parity
            # with the reference, SURVEY.md §1.1)
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    def replace_buckets(
        self, df: DataFrame, buckets: set[int], counters: dict[str, int] | None = None
    ) -> Snapshot:
        """O(changed-data) mutation commit: the given buckets' files are
        replaced by ``df`` (which must contain exactly those buckets' rows);
        every other bucket's files carry over untouched — a 10-row update
        on a 1M-row store rewrites a handful of files, not the table.
        (This is the merge-on-read/delete-manifest seam: with the Iceberg
        jar present it becomes MERGE INTO with bucket(n, col) partitioning.)
        Raises ValueError if legacy unbucketed files exist — those may hold
        rows of ANY bucket, so a bucket-scoped replace would silently drop
        or duplicate rows. The remedy is ``compact()``: its rewrite
        re-derives ``_bucket`` for every row (see _write_files), migrating a
        legacy layout into the bucketed one (store-level entry point:
        ProductStore.compact)."""
        parent = self.current_snapshot()
        old = parent.files if parent else []
        if any(self._file_bucket(f) is None for f in old):
            raise ValueError(
                "replace_buckets on a table with unbucketed files — compact first"
            )
        keep = [f for f in old if self._file_bucket(f) not in buckets]
        files = self._write_files(df)
        for f in files:
            if self._file_bucket(f) not in buckets:
                raise ValueError(f"replacement row landed outside {buckets}: {f}")
        snap = Snapshot(
            self._next_id(parent),
            keep + files,
            counters or {},
            parent.snapshot_id if parent else None,
        )
        self._publish(snap)
        return snap

    def is_empty(self) -> bool:
        snap = self.current_snapshot()
        return snap is None or not snap.files


class Catalog:
    """Namespace of tables under one warehouse directory."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        try:
            os.makedirs(warehouse, exist_ok=True)
        except OSError as e:
            from crawl4ai_llm_spark.errors import StorageConnectionError

            raise StorageConnectionError(f"warehouse not writable: {warehouse}: {e}") from e

    def table(
        self,
        name: str,
        merge_schema: bool = False,
        bucket_by: tuple[str, int] | None = None,
    ) -> Table:
        return Table(self.spark, os.path.join(self.warehouse, name), merge_schema, bucket_by)

    def drop(self, name: str) -> None:
        import shutil

        path = os.path.join(self.warehouse, name)
        if os.path.exists(path):
            shutil.rmtree(path)
