"""General MERGE INTO with user clauses (`ManifestTable.merge_into`):
the Delta/Iceberg MERGE surface (WHEN MATCHED [AND cond] UPDATE/DELETE,
WHEN NOT MATCHED INSERT, WHEN NOT MATCHED BY SOURCE DELETE) compiled to
one change batch through the engine's merge path — exactly-once by
epoch, CDC-consistent version stamps, change-feed visible.  The key
contracts pinned here:

- matched verbs stamp (t.ts, t._lsn + 1): they outrank exactly the
  version they read and lose to genuinely newer WAL changes;
- an insert over a DELETE TOMBSTONE stamps (greatest(insert ts,
  tombstone ts), tombstone lsn + 1) so the MERGE insert wins (Iceberg
  DELETE-then-MERGE re-insert) while an out-of-order OLDER WAL change
  still cannot shadow it;
- duplicate source keys are a cardinality violation (like Delta).

Parameterized over both storage backends via the table fixture.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable


def _batch(spark, rows):
    cols = ["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    return spark.createDataFrame(
        pdf,
        T.StructType(
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
        ),
    )


def _source(spark, rows):
    """Source frame: (conv_id, turn_idx, text, ts-seconds)."""
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    return spark.createDataFrame(
        pdf,
        T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("text", T.StringType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )


@pytest.fixture()
def table(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "mi_tbl")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=2,
        storage=storage_factory(root),
    )
    rows = [
        ("U", 10 + i, 1000 + i, f"c{i}", 0, "user", f"text-{i}", None)
        for i in range(4)
    ]
    t.merge(_batch(spark, rows), 0, mode="delta")
    # c3 is deleted: its key survives only as a tombstone
    t.delete_where("conv_id = 'c3'", epoch_id=1)
    return t


def _state(t):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["role"])
        for r in t.read().collect()
    }


def test_merge_into_update_delete_insert(spark, table):
    src = _source(
        spark,
        [
            ("c0", 0, "patched", 9000),   # matched → update
            ("c1", 0, "whatever", 9000),  # matched → delete (condition)
            ("c9", 0, "fresh", 9000),     # no key anywhere → insert
            ("c3", 0, "revived", 9000),   # tombstoned → insert over tombstone
        ],
    )
    res = table.merge_into(
        src,
        epoch_id=2,
        when_matched_delete="t.conv_id = 'c1'",
        when_matched_update={"text": "s.text", "role": "'editor'"},
        when_not_matched_insert={
            "text": "s.text", "role": "'import'", "ts": "s.ts",
        },
    )
    assert res["status"] == "Success"
    st = _state(table)
    assert st[("c0", 0)] == ("patched", "editor")
    assert ("c1", 0) not in st
    assert st[("c9", 0)] == ("fresh", "import")
    assert st[("c3", 0)] == ("revived", "import")
    assert st[("c2", 0)] == ("text-2", "user")  # untouched

    # exactly-once: redelivery of the same epoch is a no-op
    assert table.merge_into(
        src, epoch_id=2, when_matched_update={"text": "s.text"},
    )["status"] == "Skipped"


def test_merge_into_version_stamps(spark, table):
    """Matched update stamps (t.ts, t._lsn+1); insert-over-tombstone
    outranks the tombstone; both still lose to genuinely newer WAL
    changes and beat out-of-order older ones."""
    src = _source(spark, [("c0", 0, "patched", 500), ("c3", 0, "revived", 500)])
    table.merge_into(
        src,
        epoch_id=2,
        when_matched_update={"text": "s.text"},
        when_not_matched_insert={"text": "s.text", "ts": "s.ts"},
    )
    st = _state(table)
    assert st[("c0", 0)][0] == "patched"
    # insert over tombstone wins even though s.ts (500) predates the
    # tombstone's ts: the stamp is greatest(insert ts, tombstone ts)
    assert st[("c3", 0)][0] == "revived"

    # an out-of-order OLDER WAL change cannot shadow either verb
    table.merge(
        _batch(
            spark,
            [
                ("U", 5, 900, "c0", 0, "user", "stale", None),
                ("U", 5, 900, "c3", 0, "user", "stale", None),
            ],
        ),
        3,
        mode="delta",
    )
    st = _state(table)
    assert st[("c0", 0)][0] == "patched"
    assert st[("c3", 0)][0] == "revived"

    # a genuinely newer WAL change takes over
    table.merge(
        _batch(spark, [("U", 999, 99000, "c0", 0, "user", "newer", None)]),
        4,
        mode="delta",
    )
    assert _state(table)[("c0", 0)][0] == "newer"


def test_merge_into_by_source_delete(spark, table):
    """WHEN NOT MATCHED BY SOURCE DELETE: live target rows absent from
    the source are deleted (the sync-from-snapshot idiom)."""
    src = _source(spark, [("c0", 0, "keep", 9000), ("c2", 0, "keep", 9000)])
    table.merge_into(
        src,
        epoch_id=2,
        when_matched_update={"text": "s.text"},
        not_matched_by_source_delete=True,
    )
    st = _state(table)
    assert set(st) == {("c0", 0), ("c2", 0)}
    assert st[("c0", 0)][0] == "keep"


def test_merge_into_conditions_and_feed(spark, table):
    """matched_condition narrows the update; the change feed reports the
    merge's verbs like any other epoch."""
    v0 = table.current_version()
    src = _source(
        spark,
        [("c0", 0, "even", 9000), ("c1", 0, "odd", 9000)],
    )
    table.merge_into(
        src,
        epoch_id=2,
        when_matched_update={"text": "s.text"},
        matched_condition="t.text = 'text-0'",
    )
    st = _state(table)
    assert st[("c0", 0)][0] == "even"
    assert st[("c1", 0)][0] == "text-1"  # condition excluded it
    ch = {
        (r["conv_id"], r["_change_type"])
        for r in table.changes(v0).collect()
    }
    assert ch == {("c0", "update")}


def test_merge_into_guards(spark, table):
    src = _source(spark, [("c0", 0, "x", 9000), ("c0", 0, "y", 9000)])
    with pytest.raises(ValueError, match="cardinality"):
        table.merge_into(
            src, epoch_id=2, when_matched_update={"text": "s.text"},
        )
    with pytest.raises(ValueError, match="at least one clause"):
        table.merge_into(src.limit(1), epoch_id=2)
    with pytest.raises(ValueError, match="unreachable"):
        table.merge_into(
            src.limit(1),
            epoch_id=2,
            when_matched_delete=True,
            when_matched_update="all",
        )
    with pytest.raises(ValueError, match="version column"):
        table.merge_into(
            src.limit(1).drop("ts"),
            epoch_id=2,
            when_not_matched_insert={"text": "s.text"},
        )
    with pytest.raises(ValueError, match="key columns"):
        table.merge_into(
            src.limit(1).drop("turn_idx"),
            epoch_id=2,
            when_matched_update="all",
        )


def test_merge_into_cow_mode(spark, table):
    """The compiled batch goes through the ordinary merge path, so CoW
    mode works identically."""
    src = _source(spark, [("c0", 0, "cow", 9000), ("c9", 0, "fresh", 9000)])
    with pytest.raises(ValueError, match='insert "all"'):
        # "all" requires the source to carry every payload column; this
        # source lacks role/tool
        table.merge_into(
            src, epoch_id=2, when_not_matched_insert="all",
        )
    table.merge_into(
        src,
        epoch_id=2,
        mode="cow",
        when_matched_update={"text": "s.text"},
        when_not_matched_insert={"text": "s.text"},
    )
    st = _state(table)
    assert st[("c0", 0)][0] == "cow"
    assert st[("c9", 0)] == ("fresh", None)

def test_merge_into_schema_evolution(spark, table):
    """evolve_schema=True (Delta withSchemaEvolution parity): extra
    source columns flow through "all" clauses and dict assignments as
    additive evolution; untouched rows read null; default is strict."""
    src = _source(
        spark, [("c0", 0, "patched", 9000), ("c9", 0, "fresh", 9000)]
    ).withColumn("score", F.lit(7).cast("int"))

    # default: dict assigning an unknown column is rejected
    with pytest.raises(ValueError, match="evolve_schema=True"):
        table.merge_into(
            src, epoch_id=2, when_matched_update={"score": "s.score"},
        )

    table.merge_into(
        src,
        epoch_id=2,
        when_matched_update={"text": "s.text", "score": "s.score * 10"},
        when_not_matched_insert={
            "text": "s.text", "ts": "s.ts", "score": "s.score",
        },
        evolve_schema=True,
    )
    assert "score" in [f.name for f in table.schema().fields]
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["score"])
        for r in table.read().collect()
    }
    assert got[("c0", 0)] == ("patched", 70)   # update expression
    assert got[("c9", 0)] == ("fresh", 7)      # insert expression
    assert got[("c1", 0)] == ("text-1", None)  # untouched → null

    # the evolved column is ordinary payload afterwards: WAL merges and
    # further merge_intos see it like any other column
    table.merge_into(
        _source(spark, [("c1", 0, "later", 9500)]).withColumn(
            "score", F.lit(3).cast("int")
        ),
        epoch_id=3,
        when_matched_update={"text": "s.text", "score": "s.score"},
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in table.read().collect()
    }
    assert got[("c1", 0)] == 3


def test_merge_into_evolution_all_clauses_and_guards(spark, table):
    """"all" clauses copy extras only under evolve_schema; reserved and
    tombstoned names are rejected before any job."""
    src = (
        _source(spark, [("c0", 0, "x", 9000)])
        .withColumn("extra", F.lit("e"))
        .withColumn("role", F.lit("user"))
    )

    # strict default: "all" silently ignores the extra column
    table.merge_into(
        src, epoch_id=2, when_matched_update={"text": "s.text"},
    )
    assert "extra" not in [f.name for f in table.schema().fields]

    with pytest.raises(ValueError, match="reserved"):
        table.merge_into(
            src.withColumnRenamed("extra", "_bucket"),
            epoch_id=3,
            when_matched_update={"_bucket": "s._bucket"},
            evolve_schema=True,
        )

    # a dropped column's name is tombstoned until a full rewrite
    table.drop_column("tool")
    with pytest.raises(ValueError, match="physicalize"):
        table.merge_into(
            src.withColumnRenamed("extra", "tool"),
            epoch_id=3,
            when_matched_update={"tool": "s.tool"},
            evolve_schema=True,
        )

    # update "all" + evolve: extras ride along for matched rows
    table.merge_into(
        src, epoch_id=4, when_matched_update="all", evolve_schema=True,
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["extra"]
        for r in table.read().collect()
    }
    assert got[("c0", 0)] == "e"
    assert got[("c1", 0)] is None
