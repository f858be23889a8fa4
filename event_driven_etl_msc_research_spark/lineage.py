"""Lineage, chunk-registry, and metrics tables (SURVEY.md §2.8 E1, §2.5 A1-A3).

Replaces the reference's DynamoDB tracking tables and CloudWatch metrics:

* ``ETLDemoTrackingTable{tenant}`` per-(CorrelationId, Stage) status rows
  (``Phase3-Data-Extraction.py:106-117,127-134``) → ``lineage`` Parquet rows
  per (epoch, stage) with status/duration;
* ``SplitDataTracker{tenant}`` per-chunk record counts
  (``DataSplit.py:23-31,68-79``) → ``chunk_registry`` rows per
  (epoch, bucket) with ``n_records``;
* CloudWatch ``put_log_events`` metrics (``CloudsMatricsByQ2.py:168-210``)
  → the same tables + ``stage_report`` (groupBy stage, the exact aggregation
  of ``CloudsMatricsByQ2.py:45-73`` / ``test2.py:104-113``).

WRITE PATH — driver-side pyarrow, never a Spark job: lineage rows are a few
hundred bytes of metadata per epoch, but ``spark.createDataFrame(...).write``
costs a full job submission (~100 ms of scheduler latency) PER EPOCH — at a
100-epochs/min binlog tail that is real ingest-path overhead.  Rows are
buffered and flushed as one small parquet file per ``flush_every`` records
(pyarrow, microseconds); a Failed status always flushes immediately so crash
forensics never sit in a lost buffer.  A torn lineage write still cannot
corrupt table state, which is guarded solely by the manifest commit.
"""

from __future__ import annotations

import datetime as dt
import itertools
import os
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from .schemas import CHUNK_REGISTRY_SCHEMA, LINEAGE_SCHEMA

_LINEAGE_ARROW = pa.schema(
    [
        pa.field("epoch_id", pa.int64(), nullable=False),
        pa.field("stage", pa.string(), nullable=False),
        pa.field("status", pa.string(), nullable=False),
        pa.field("detail", pa.string()),
        pa.field("duration_s", pa.float64()),
        pa.field("tenant_id", pa.string()),
        pa.field("ts", pa.timestamp("us", tz="UTC"), nullable=False),
    ]
)

_REGISTRY_ARROW = pa.schema(
    [
        pa.field("epoch_id", pa.int64(), nullable=False),
        pa.field("partition_id", pa.int32(), nullable=False),
        pa.field("n_records", pa.int64(), nullable=False),
        pa.field("tenant_id", pa.string()),
        pa.field("stage", pa.string(), nullable=False),
        pa.field("ts", pa.timestamp("us", tz="UTC"), nullable=False),
    ]
)


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc)


class LineageLog:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        tenant_id: str | None = None,
        flush_every: int = 1,
    ):
        self.spark = spark
        self.root = root
        self.tenant_id = tenant_id
        self.flush_every = max(1, flush_every)
        self.lineage_dir = os.path.join(root, "_lineage")
        self.registry_dir = os.path.join(root, "_chunk_registry")
        self._buf_lineage: list[dict] = []
        self._buf_registry: list[dict] = []
        self._seq = itertools.count()
        # record/flush may run concurrently from the Structured Streaming
        # micro-batch thread AND the main thread (replay()'s finally-flush
        # can fire while the stream is still draining after an
        # awaitTermination timeout) — the buffers are swapped under this
        # lock so a row is serialized exactly once
        self._lock = threading.Lock()
        # unique per LOG INSTANCE, not just per process: two engines over the
        # same table root in one process (e.g. crash-recovery tests) must not
        # overwrite each other's flushed files
        self._tag = f"{os.getpid():x}-{time.monotonic_ns():x}"

    def record_stage(
        self,
        epoch_id: int,
        stage: str,
        status: str,
        detail: str | None = None,
        duration_s: float | None = None,
    ) -> None:
        with self._lock:
            self._buf_lineage.append(
                {
                    "epoch_id": int(epoch_id),
                    "stage": stage,
                    "status": status,
                    "detail": detail,
                    "duration_s": duration_s,
                    "tenant_id": self.tenant_id,
                    "ts": _now(),
                }
            )
            n = len(self._buf_lineage)
        # Failed rows flush NOW — the process may be about to die
        if status == "Failed" or n >= self.flush_every:
            self.flush()

    def record_partitions(
        self, epoch_id: int, stage: str, rows_by_partition: dict[int, int]
    ) -> None:
        if not rows_by_partition:
            return
        now = _now()
        with self._lock:
            self._buf_registry.extend(
                {
                    "epoch_id": int(epoch_id),
                    "partition_id": int(p),
                    "n_records": int(n),
                    "tenant_id": self.tenant_id,
                    "stage": stage,
                    "ts": now,
                }
                for p, n in rows_by_partition.items()
            )
            n_buf = len(self._buf_registry)
        if n_buf >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        """Drain both buffers to one small parquet file each (driver-side).

        Thread-safe: the buffer lists are SWAPPED out under the lock and
        serialized outside it, so a concurrent ``record_*`` (streaming
        micro-batch thread) or a second ``flush`` (main thread's
        finally-flush after an ``awaitTermination`` timeout) can neither
        lose rows appended between snapshot and clear nor write a row
        twice."""
        with self._lock:
            bufs = (self._buf_lineage, self._buf_registry)
            snap_lineage, snap_registry = list(bufs[0]), list(bufs[1])
            bufs[0].clear()
            bufs[1].clear()
            # sequence numbers minted under the lock too: two concurrent
            # flushes must not collide on a file name
            seqs = [next(self._seq), next(self._seq)]
        for buf, seq, schema, out_dir in (
            (snap_lineage, seqs[0], _LINEAGE_ARROW, self.lineage_dir),
            (snap_registry, seqs[1], _REGISTRY_ARROW, self.registry_dir),
        ):
            if not buf:
                continue
            os.makedirs(out_dir, exist_ok=True)
            table = pa.Table.from_pylist(buf, schema=schema)
            fname = (
                f"part-{buf[0]['epoch_id']:012d}-{self._tag}-"
                f"{seq:06d}.parquet"
            )
            pq.write_table(table, os.path.join(out_dir, fname))

    def compact(self, max_files: int = 16) -> int:
        """Fold the per-epoch parquet shards into one file per directory
        once a directory exceeds ``max_files`` — the lineage analogue of the
        data path's ``compact()``: a long-running tail flushes one small
        file per epoch, and an unbounded tiny-file tail would eventually
        dominate `lineage()` read planning.  Returns files removed.

        Multi-instance safe: only THIS instance's shards (filenames carry
        ``self._tag``) are folded — two engines logging to one table root
        (a supported multi-writer config) each compact their own files and
        can never concurrently fold, double-write, or unlink each other's.
        Crash window: the combined file is fully written (tmp + rename)
        before the inputs are deleted, so a crash can duplicate
        already-compacted rows but never lose rows — lineage is
        observability, and the table state it describes is guarded solely
        by the manifest commit."""
        removed = 0
        for out_dir in (self.lineage_dir, self.registry_dir):
            if not os.path.isdir(out_dir):
                continue
            parts = sorted(
                f
                for f in os.listdir(out_dir)
                if f.endswith(".parquet") and self._tag in f
            )
            if len(parts) <= max_files:
                continue
            table = pa.concat_tables(
                pq.read_table(os.path.join(out_dir, f)) for f in parts
            )
            # compacted shard keeps the naming scheme (epoch of its first
            # row, this instance's tag, a fresh sequence number)
            first_epoch = int(table.column("epoch_id")[0].as_py()) if table.num_rows else 0
            fname = (
                f"part-{first_epoch:012d}-{self._tag}-"
                f"{next(self._seq):06d}-compacted.parquet"
            )
            tmp = os.path.join(out_dir, f".{fname}.tmp")
            pq.write_table(table, tmp)
            os.rename(tmp, os.path.join(out_dir, fname))
            for f in parts:
                os.unlink(os.path.join(out_dir, f))
                removed += 1
        return removed

    def lineage(self) -> DataFrame:
        self.flush()
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_dir)

    def chunk_registry(self) -> DataFrame:
        self.flush()
        return self.spark.read.schema(CHUNK_REGISTRY_SCHEMA).parquet(self.registry_dir)

    def stage_report(self) -> DataFrame:
        """Per-stage total duration — the reference's metrics aggregation
        (``CloudsMatricsByQ2.py:45-73``: group history events by state, sum
        end-start pairs; offline replica ``test2.py:104-113``)."""
        from pyspark.sql import functions as F

        return (
            self.lineage()
            .groupBy("stage")
            .agg(
                F.sum("duration_s").alias("total_duration_s"),
                F.count("*").alias("n_epochs"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
            )
        )
