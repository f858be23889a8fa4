"""Iceberg connector SQL generation (sinks/iceberg.py).

The Iceberg transaction layer cannot run in this sandbox (no
iceberg-spark-runtime jar), so these tests pin the exact statement text the
connector would submit AND statically validate it with Spark's own SQL
parser — catching the classic MERGE authoring bugs (bare tuple comparison,
UPDATE SET * with source-only columns) without a live catalog.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.sinks.iceberg import (
    create_sql,
    evolve_sql,
    merge_sql,
)

PAYLOAD = ["ts", "conv_id", "turn_idx", "role", "text", "tool"]
KEYS = ["conv_id", "turn_idx"]


def _parse(spark, sql: str) -> None:
    """Statement must parse under Spark's SQL grammar (no execution)."""
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_merge_sql_golden(spark):
    sql = merge_sql("cat.db.transcripts", KEYS, PAYLOAD)
    assert sql == (
        "MERGE INTO cat.db.transcripts t\n"
        "USING (SELECT * FROM _changes) c\n"
        "ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx\n"
        "WHEN MATCHED AND struct(c.ts, c.lsn) > struct(t.ts, t._lsn) AND c.op = 'D' THEN\n"
        "  UPDATE SET t.ts = c.ts, t._lsn = c.lsn, t._deleted = true\n"
        "WHEN MATCHED AND struct(c.ts, c.lsn) > struct(t.ts, t._lsn) THEN\n"
        "  UPDATE SET t.ts = c.ts, t.conv_id = c.conv_id, t.turn_idx = c.turn_idx, "
        "t.role = c.role, t.text = c.text, t.tool = c.tool, t._lsn = c.lsn, "
        "t._deleted = false\n"
        "WHEN NOT MATCHED THEN\n"
        "  INSERT (ts, conv_id, turn_idx, role, text, tool, _lsn, _deleted) "
        "VALUES (c.ts, c.conv_id, c.turn_idx, c.role, c.text, c.tool, c.lsn, c.op = 'D')"
    )
    _parse(spark, sql)


def test_merge_sql_inserts_tombstones_for_unseen_deletes(spark):
    """A delete for a never-seen key must INSERT a tombstone (matching the
    ManifestTable contract) — otherwise an out-of-order older update in a
    later epoch would resurrect the key."""
    sql = merge_sql("t", KEYS, PAYLOAD)
    assert "WHEN NOT MATCHED THEN" in sql          # no op != 'D' guard
    assert "c.op = 'D')" in sql                    # tombstone flag on insert


def test_merge_sql_never_star_or_tuple(spark):
    sql = merge_sql("t", KEYS, PAYLOAD)
    # the two authoring bugs this generator exists to prevent
    assert "SET *" not in sql and "INSERT *" not in sql
    # bare tuple comparison is not Spark SQL — only struct(...) > struct(...)
    assert "AND (c.ts, c.lsn) >" not in sql
    assert "struct(c.ts, c.lsn) > struct(t.ts, t._lsn)" in sql


def test_merge_sql_rejects_reserved_payload():
    with pytest.raises(ValueError, match="op"):
        merge_sql("t", KEYS, PAYLOAD + ["op"])
    with pytest.raises(ValueError, match="version column"):
        merge_sql("t", KEYS, ["conv_id", "turn_idx", "text"])  # no ts


def test_create_and_evolve_sql(spark):
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    ddl = create_sql("cat.db.transcripts", schema, KEYS, n_buckets=8)
    assert "CREATE TABLE IF NOT EXISTS cat.db.transcripts" in ddl
    assert "_lsn BIGINT" in ddl and "_deleted BOOLEAN" in ddl
    assert "PARTITIONED BY (bucket(8, conv_id))" in ddl
    assert "TBLPROPERTIES" not in ddl
    _parse(spark, ddl)

    # the engine's write.parquet.compression property maps to Iceberg's
    # TBLPROPERTIES key in the twin DDL
    zddl = create_sql(
        "cat.db.transcripts", schema, KEYS, n_buckets=8, compression="ZSTD"
    )
    assert (
        "TBLPROPERTIES ('write.parquet.compression-codec'='zstd')" in zddl
    )
    _parse(spark, zddl)

    alter = evolve_sql(
        "cat.db.transcripts", [T.StructField("tool_meta", T.StringType())]
    )
    assert alter == "ALTER TABLE cat.db.transcripts ADD COLUMNS (tool_meta string)"
    _parse(spark, alter)


def test_widen_sql_golden(spark):
    from event_driven_etl_msc_research_spark.sinks.iceberg import widen_sql

    stmts = widen_sql(
        "cat.db.transcripts",
        [
            T.StructField("turn_idx", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ],
    )
    assert stmts == [
        "ALTER TABLE cat.db.transcripts ALTER COLUMN turn_idx TYPE bigint",
        "ALTER TABLE cat.db.transcripts ALTER COLUMN score TYPE double",
    ]
    for s in stmts:
        _parse(spark, s)
