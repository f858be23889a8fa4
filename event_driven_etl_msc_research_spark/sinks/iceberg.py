"""IcebergTable — same interface as ManifestTable over a real Iceberg catalog.

UNVERIFIED WITHOUT THE JAR: the sandbox has no network (no
``iceberg-spark-runtime`` jar, SURVEY.md §7), so this connector has never
executed against a live catalog.  What IS verified here is the generated
SQL itself: ``merge_sql``/``create_sql``/``evolve_sql`` are pure functions
golden-pinned by ``tests/test_iceberg_sql.py``, so the statement text this
class would submit is locked down even though the Iceberg transaction layer
cannot run in this environment.  When the jar IS on the classpath
(``spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-...``), the
engine's MERGE maps to native ``MERGE INTO`` and schema evolution to
``ALTER TABLE ... ADD COLUMNS`` — the transaction is Iceberg's, the
detection/diff and the version-comparison predicate are ours.

Semantics mirror ``ManifestTable.merge`` (sinks/manifest.py:245-330):
* change rows carry ``(op, lsn, ts, key..., payload...)``; the target stores
  payload plus ``_lsn bigint`` and ``_deleted boolean``;
* max-version conflict predicate compares ``(ts, lsn)`` tuples — written as
  a ``struct(...) > struct(...)`` comparison (Spark SQL has no bare tuple
  comparison);
* deletes are tombstones (``_deleted = true`` with the delete's version)
  so an out-of-order older update cannot resurrect a key;
* ``op``/``lsn`` never land as target columns — UPDATE/INSERT use explicit
  column lists, never ``SET *`` / ``INSERT *`` (the source has columns the
  target lacks and vice versa).
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


def create_sql(
    identifier: str,
    schema: T.StructType,
    key_cols: list[str],
    n_buckets: int = 16,
    compression: str | None = None,
) -> str:
    """Idempotent DDL for the target table (payload + _lsn/_deleted),
    bucket-partitioned on the first key column (the reference's warehouse
    DDL twin, Phase3-DataLoad.py:99-124).  ``compression`` maps the
    engine's ``write.parquet.compression`` table property to Iceberg's
    ``write.parquet.compression-codec`` TBLPROPERTIES key."""
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    props = (
        f" TBLPROPERTIES ('write.parquet.compression-codec'="
        f"'{compression.lower()}')"
        if compression
        else ""
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {identifier} ({cols}, _lsn BIGINT, "
        f"_deleted BOOLEAN) USING iceberg "
        f"PARTITIONED BY (bucket({n_buckets}, {key_cols[0]}))" + props
    )


def merge_sql(
    identifier: str,
    key_cols: list[str],
    payload_cols: list[str],
    changes_view: str = "_changes",
    ts_col: str = "ts",
) -> str:
    """The MERGE INTO statement applying one deduped change batch.

    ``payload_cols`` are the target's payload columns (must include
    ``ts_col``; must NOT include ``op``/``lsn``/``_lsn``/``_deleted``).
    The version comparison is ``struct(c.ts, c.lsn) > struct(t.ts, t._lsn)``
    and null-safe on the target side via coalesce-free struct ordering
    (target rows always carry ts/_lsn once inserted).
    """
    bad = {"op", "lsn", "_lsn", "_deleted"} & set(payload_cols)
    if bad:
        raise ValueError(f"payload_cols must not contain {sorted(bad)}")
    if ts_col not in payload_cols:
        raise ValueError(f"payload_cols must include the version column {ts_col!r}")
    on = " AND ".join(f"t.{k} = c.{k}" for k in key_cols)
    newer = f"struct(c.{ts_col}, c.lsn) > struct(t.{ts_col}, t._lsn)"
    upd_set = ", ".join(
        [f"t.{c} = c.{c}" for c in payload_cols]
        + ["t._lsn = c.lsn", "t._deleted = false"]
    )
    del_set = f"t.{ts_col} = c.{ts_col}, t._lsn = c.lsn, t._deleted = true"
    ins_cols = ", ".join([*payload_cols, "_lsn", "_deleted"])
    ins_vals = ", ".join(
        [f"c.{c}" for c in payload_cols] + ["c.lsn", "c.op = 'D'"]
    )
    # NOT MATCHED inserts EVERY row including deletes: a delete for a
    # never-seen key must land as a tombstone (ManifestTable contract,
    # sinks/manifest.py) or an out-of-order older update arriving later
    # would resurrect the key
    return (
        f"MERGE INTO {identifier} t\n"
        f"USING (SELECT * FROM {changes_view}) c\n"
        f"ON {on}\n"
        f"WHEN MATCHED AND {newer} AND c.op = 'D' THEN\n"
        f"  UPDATE SET {del_set}\n"
        f"WHEN MATCHED AND {newer} THEN\n"
        f"  UPDATE SET {upd_set}\n"
        f"WHEN NOT MATCHED THEN\n"
        f"  INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def evolve_sql(identifier: str, added: list[T.StructField]) -> str:
    """Additive schema evolution (sinks/manifest.py:174-195) as one Iceberg
    schema-update transaction."""
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in added)
    return f"ALTER TABLE {identifier} ADD COLUMNS ({cols})"


def widen_sql(identifier: str, widened: list[T.StructField]) -> list[str]:
    """Same-family numeric type widening (int→long, float→double — the
    promotions Iceberg's spec allows and ``ManifestTable._widens`` mirrors)
    as ``ALTER COLUMN ... TYPE`` statements, one list entry per column."""
    return [
        f"ALTER TABLE {identifier} ALTER COLUMN {f.name} "
        f"TYPE {f.dataType.simpleString()}"
        for f in widened
    ]


class IcebergTable:
    """Native-Iceberg twin of ``ManifestTable`` (same method surface).
    See module docstring: SQL text verified, execution unverified without
    the iceberg-spark-runtime jar."""

    def __init__(self, spark: SparkSession, identifier: str, key_cols: list[str]):
        if not iceberg_available(spark):
            raise NotImplementedError(
                "iceberg-spark-runtime jar not on classpath; use ManifestTable "
                "(identical semantics over Parquet + JSON manifests)"
            )
        if not key_cols:
            # key_cols drive the MERGE ON clause — a default here would
            # silently generate a wrong merge for any non-transcript table
            raise ValueError("IcebergTable requires explicit key_cols")
        self.spark = spark
        self.identifier = identifier
        self.key_cols = list(key_cols)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        identifier: str,
        schema: T.StructType,
        key_cols: list[str] | None = None,
        n_buckets: int = 16,
        tenant_id: str | None = None,
        compression: str | None = None,
    ) -> "IcebergTable":
        t = cls(spark, identifier, key_cols or ["conv_id", "turn_idx"])
        spark.sql(
            create_sql(
                identifier, schema, t.key_cols, n_buckets,
                compression=compression,
            )
        )
        return t

    def read(self, version: int | None = None) -> DataFrame:
        rdr = self.spark.read.format("iceberg")
        if version is not None:
            rdr = rdr.option("snapshot-id", str(version))
        return (
            rdr.load(self.identifier)
            .filter("NOT coalesce(_deleted, false)")
            .drop("_lsn", "_deleted")
        )

    def merge(self, changes: DataFrame, epoch_id: int, **kw: Any) -> dict[str, Any]:
        """MERGE INTO with max-version conflict predicate.  The batch is
        within-batch deduped FIRST (same ``dedup_latest`` pass as
        ManifestTable.merge): Iceberg's MERGE errors on multiple source rows
        matching one target row, and real micro-batches carry several
        updates per key.  Payload columns are everything except op/lsn;
        columns new to the target are added first via an additive
        schema-update transaction, and same-family numeric widening (the
        same promotions ``ManifestTable._widens`` accepts) is applied via
        ``ALTER COLUMN ... TYPE`` before the MERGE; any other type conflict
        raises before any statement runs."""
        from ..operators.dedup import dedup_latest
        from .manifest import ManifestTable, SchemaEvolutionError

        target_fields = {
            f.name: f for f in self.spark.table(self.identifier).schema.fields
        }
        payload = [f for f in changes.schema.fields if f.name not in ("op", "lsn")]
        added = [f for f in payload if f.name not in target_fields]
        widened, conflicts = [], []
        for f in payload:
            have = target_fields.get(f.name)
            if have is None or f.dataType == have.dataType:
                continue
            if ManifestTable._widens(have.dataType, f.dataType):
                widened.append(f)  # table column widens to the batch type
            elif ManifestTable._widens(f.dataType, have.dataType):
                pass  # batch is narrower: MERGE up-casts the source side
            else:
                conflicts.append(f.name)
        if conflicts:
            raise SchemaEvolutionError(
                f"type conflict on {conflicts}: additive columns and "
                f"same-family numeric widening only"
            )
        if added:
            self.spark.sql(evolve_sql(self.identifier, added))
        for stmt in widen_sql(self.identifier, widened):
            self.spark.sql(stmt)
        deduped = dedup_latest(changes, self.key_cols, ["ts", "lsn"])
        deduped.createOrReplaceTempView("_changes")
        self.spark.sql(
            merge_sql(self.identifier, self.key_cols, [f.name for f in payload])
        )
        return {"status": "Success", "epoch_id": epoch_id}
