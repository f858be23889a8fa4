"""DDL racing a concurrent merge (driven deterministically through the
``before_publish`` hook, like the concurrent-writers suite): the merge
stages its batch under the schema it read, loses the manifest race to a
metadata-only DDL commit, and REBASES.  Each verb must land in a state
that reads correctly — or fail loudly — never silently corrupt:

* add_column: the rebase re-derives evolution against the winner's
  schema; the staged files simply lack the new column and readers
  null-fill it (the same mechanism merge evolution relies on).
* widen_column: staged files carry the narrow physical type; reads go
  through the widened manifest schema and up-cast (pinned by the
  evolution suite for the merge-driven path).
* rename_column: the staged batch still carries the RETIRED name, which
  rename tombstones against resurrection — the rebase must reject it
  loudly (SchemaEvolutionError), exactly like a change stream that keeps
  emitting the old name.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import (
    ManifestTable,
    SchemaEvolutionError,
)

BATCH_COLS = ["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"]
BATCH_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
    ]
)


def _batch(spark, rows):
    pdf = pd.DataFrame(rows, columns=BATCH_COLS)
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    return spark.createDataFrame(pdf, BATCH_SCHEMA)


def _two(spark, tmp_root):
    root = os.path.join(tmp_root, "race")
    a = ManifestTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=2)
    b = ManifestTable(spark, root)
    a.merge(
        _batch(spark, [("U", i, 100 + i, f"c{i % 3}", i // 3, "user", f"x{i}", None)
                       for i in range(6)]),
        0,
        mode="delta",
    )
    return a, b


def _one_shot(fn):
    fired = {"done": False}

    def hook(_m):
        if not fired["done"]:
            fired["done"] = True
            fn()

    return hook


def test_merge_racing_add_column(spark, tmp_root):
    a, b = _two(spark, tmp_root)
    st = a.merge(
        _batch(spark, [("U", 50, 900, "z", 0, "user", "raced", None)]),
        1,
        mode="delta",
        before_publish=_one_shot(lambda: b.add_column("score", "double")),
    )
    assert st["status"] == "Success"
    assert "score" in [f.name for f in a.schema().fields]
    got = {r["conv_id"]: r["score"] for r in a.read().collect()}
    assert got["z"] is None  # raced rows null-fill the winner's column
    assert len(got) == 4


def test_merge_racing_widen_column(spark, tmp_root):
    root = os.path.join(tmp_root, "widen_race")
    schema = T.StructType(
        list(TRANSCRIPT_SCHEMA.fields) + [T.StructField("n", T.IntegerType())]
    )
    bsch = T.StructType(list(BATCH_SCHEMA.fields) + [T.StructField("n", T.IntegerType())])

    def nb(rows):
        pdf = pd.DataFrame(rows, columns=BATCH_COLS + ["n"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
        return spark.createDataFrame(pdf, bsch)

    a = ManifestTable.create(spark, root, schema, n_buckets=2)
    b = ManifestTable(spark, root)
    a.merge(nb([("U", 1, 100, "a", 0, "user", "x", None, 7)]), 0, mode="delta")
    st = a.merge(
        nb([("U", 2, 200, "b", 0, "user", "y", None, 9)]),
        1,
        mode="delta",
        before_publish=_one_shot(lambda: b.widen_column("n", "bigint")),
    )
    assert st["status"] == "Success"
    assert a.schema()["n"].dataType == T.LongType()
    got = {r["conv_id"]: r["n"] for r in a.read().collect()}
    assert got == {"a": 7, "b": 9}  # narrow staged file reads up-cast


def test_merge_racing_rename_fails_loudly(spark, tmp_root):
    a, b = _two(spark, tmp_root)
    with pytest.raises(SchemaEvolutionError):
        a.merge(
            _batch(spark, [("U", 60, 950, "q", 0, "user", "old-name", None)]),
            2,
            mode="delta",
            before_publish=_one_shot(lambda: b.rename_column("text", "body")),
        )
    # nothing published under the epoch; the table stays healthy under
    # the NEW name
    assert not a.epoch_applied(2)
    assert "body" in [f.name for f in a.schema().fields]
    renamed = _batch(
        spark, [("U", 61, 960, "q", 0, "user", "new-name", None)]
    ).withColumnRenamed("text", "body")
    assert a.merge(renamed, 2, mode="delta")["status"] == "Success"
    assert a.read().filter("body = 'new-name'").count() == 1
