"""Explicit ALTER TABLE ADD COLUMN / ALTER COLUMN TYPE DDL
(`ManifestTable.add_column` / `widen_column`): the metadata-only,
schema-ahead-of-data twins of the merge path's additive evolution and
type widening.  Zero files rewritten; readers null-fill / up-cast
existing files; the change feed walks through both commits; same name
guards as merge evolution (reserved, existing, tombstoned); widening is
restricted to Iceberg-safe numeric promotions and never touches key or
version columns.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import (
    ManifestTable,
    SchemaEvolutionError,
)

BATCH_COLS = ["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"]


def _batch(spark, rows, extra=None):
    cols = BATCH_COLS + (list(extra) if extra else [])
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    fields = [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
    ] + [T.StructField(c, T.DoubleType()) for c in (extra or [])]
    return spark.createDataFrame(pdf, T.StructType(fields))


@pytest.fixture()
def table(spark, tmp_root):
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "ddl"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    rows = [("U", i, 1000 + i, f"c{i % 3}", i // 3, "user", f"t{i}", None)
            for i in range(6)]
    t.merge(_batch(spark, rows), 0, mode="delta")
    return t


def test_add_column_metadata_only_then_populated(spark, table):
    v0 = table.current_version()
    st = table.add_column("score", "double")
    assert st["status"] == "Success"
    m0, m1 = table.manifest(v0), table.manifest()
    assert m1["files"] == m0["files"]
    assert (m1.get("delta_files") or {}) == (m0.get("delta_files") or {})
    # readers null-fill existing files; change feed walks through
    assert table.read().filter(F.col("score").isNotNull()).count() == 0
    assert table.changes(v0).count() == 0
    # the next merge populates it
    rows = [("U", 100, 2000, "c0", 0, "user", "upd", None, 0.5)]
    table.merge(_batch(spark, rows, extra=["score"]), 1, mode="delta")
    got = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in table.read().collect()
    }
    assert got[("c0", 0)] == 0.5
    assert sum(v is not None for v in got.values()) == 1


def test_add_column_guards(spark, table):
    with pytest.raises(ValueError, match="already exists"):
        table.add_column("text", "string")
    with pytest.raises(ValueError, match="reserved"):
        table.add_column("_lsn", "long")
    with pytest.raises(ValueError, match="invalid column name"):
        table.add_column("bad name", "string")
    table.drop_column("tool")
    with pytest.raises(SchemaEvolutionError, match="previously dropped"):
        table.add_column("tool", "string")
    # a full rewrite frees the name
    table.compact(min_delta_files=0)
    assert table.add_column("tool", "string")["status"] == "Success"


def test_widen_column_upcasts_existing_files(spark, tmp_root):
    schema = T.StructType(
        [f for f in TRANSCRIPT_SCHEMA.fields] + [T.StructField("n", T.IntegerType())]
    )
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "widen"), schema, n_buckets=2
    )
    rows = [("U", 1, 1000, "a", 0, "user", "x", None, 7)]
    pdf = pd.DataFrame(rows, columns=BATCH_COLS + ["n"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    bsch = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("n", T.IntegerType()),
        ]
    )
    t.merge(spark.createDataFrame(pdf, bsch), 0, mode="delta")
    st = t.widen_column("n", "bigint")
    assert st["status"] == "Success"
    assert t.schema()["n"].dataType == T.LongType()
    # the pre-widening row reads back up-cast, value intact
    assert t.read().select("n").collect()[0][0] == 7
    # a wide batch now lands without evolution drama
    big = 2**40
    pdf2 = pd.DataFrame(
        [("U", 2, 2000, "b", 0, "user", "y", None, big)],
        columns=BATCH_COLS + ["n"],
    )
    pdf2["ts"] = pd.to_datetime(pdf2["ts"], unit="s", utc=True)
    bsch2 = T.StructType(
        [f if f.name != "n" else T.StructField("n", T.LongType()) for f in bsch.fields]
    )
    t.merge(spark.createDataFrame(pdf2, bsch2), 1, mode="delta")
    got = {r["conv_id"]: r["n"] for r in t.read().collect()}
    assert got == {"a": 7, "b": big}
    # idempotent re-widen -> Skipped
    assert t.widen_column("n", "bigint")["status"] == "Skipped"


def test_widen_column_guards(spark, table):
    with pytest.raises(ValueError, match="no column"):
        table.widen_column("ghost", "bigint")
    with pytest.raises(ValueError, match="key/version"):
        table.widen_column("turn_idx", "bigint")
    with pytest.raises(ValueError, match="key/version"):
        table.widen_column("ts", "bigint")
    with pytest.raises(SchemaEvolutionError, match="safe promotions"):
        table.widen_column("text", "bigint")  # cross-family


def test_widen_narrowing_rejected(spark, tmp_root):
    schema = T.StructType(
        [f for f in TRANSCRIPT_SCHEMA.fields] + [T.StructField("n", T.LongType())]
    )
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "narrow"), schema, n_buckets=2
    )
    with pytest.raises(SchemaEvolutionError, match="safe promotions"):
        t.widen_column("n", "int")
