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

Appends are plain Parquet (metadata, not data-plane): a torn lineage write
cannot corrupt table state, which is guarded solely by the manifest commit.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .schemas import CHUNK_REGISTRY_SCHEMA, LINEAGE_SCHEMA


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc)


class LineageLog:
    def __init__(self, spark: SparkSession, root: str, tenant_id: str | None = None):
        self.spark = spark
        self.root = root
        self.tenant_id = tenant_id
        self.lineage_dir = os.path.join(root, "_lineage")
        self.registry_dir = os.path.join(root, "_chunk_registry")

    def record_stage(
        self,
        epoch_id: int,
        stage: str,
        status: str,
        detail: str | None = None,
        duration_s: float | None = None,
    ) -> None:
        pdf = pd.DataFrame(
            [
                {
                    "epoch_id": epoch_id,
                    "stage": stage,
                    "status": status,
                    "detail": detail,
                    "duration_s": duration_s,
                    "tenant_id": self.tenant_id,
                    "ts": _now(),
                }
            ]
        )
        self.spark.createDataFrame(pdf, LINEAGE_SCHEMA).write.mode("append").parquet(
            self.lineage_dir
        )

    def record_partitions(
        self, epoch_id: int, stage: str, rows_by_partition: dict[int, int]
    ) -> None:
        if not rows_by_partition:
            return
        now = _now()
        pdf = pd.DataFrame(
            [
                {
                    "epoch_id": epoch_id,
                    "partition_id": int(p),
                    "n_records": int(n),
                    "tenant_id": self.tenant_id,
                    "stage": stage,
                    "ts": now,
                }
                for p, n in rows_by_partition.items()
            ]
        )
        self.spark.createDataFrame(pdf, CHUNK_REGISTRY_SCHEMA).write.mode(
            "append"
        ).parquet(self.registry_dir)

    def lineage(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_dir)

    def chunk_registry(self) -> DataFrame:
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
