"""The table as a Spark streaming source (`sources/table_source.py`,
PySpark 4 Python Data Source API, format "edem_cdc"): offsets are
snapshot versions persisted in the ordinary structured-streaming
checkpoint; micro-batches ship exactly the delta files the covered
commits appended (the change-feed candidates walk — compactions and
metadata commits contribute nothing); rows are change events
(op, lsn, payload) so `CDCEngine.replay_stream` consumes them directly
— STREAMING table-to-table replication with Spark-managed exactly-once.
The batch form ships the whole live log (bootstrap).  Delta streaming-
source / CDF-reader parity for this engine.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import (
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable
from event_driven_etl_msc_research_spark.sources.table_source import (
    register_cdc_source,
)
from event_driven_etl_msc_research_spark.streaming.engine import CDCEngine

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
    pdf = pd.DataFrame(rows, columns=[f.name for f in BATCH_SCHEMA.fields])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    return spark.createDataFrame(pdf, BATCH_SCHEMA)


def _rows(n, start_key=0, lsn0=0, ts0=1000, text="t"):
    return [
        ("U", lsn0 + i, ts0 + i, f"c{(start_key + i) % 3}",
         (start_key + i) // 3, "user", f"{text}-{start_key + i}", None)
        for i in range(n)
    ]


def _state(t):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.read().collect()
    )


@pytest.fixture()
def table(spark, tmp_root):
    register_cdc_source(spark)
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "a"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    t.merge(_batch(spark, _rows(9)), 0, mode="delta")
    t.merge(
        _batch(spark, [("D", 50, 900, "c0", 0, None, None, None)]),
        1,
        mode="delta",
    )
    return t


def _stream(spark, root, starting=None):
    r = spark.readStream.format("edem_cdc").option("path", root)
    if starting is not None:
        r = r.option("startingVersion", starting)
    return r.load()


def test_batch_read_ships_the_whole_log(spark, table):
    df = spark.read.format("edem_cdc").option("path", table.root).load()
    assert df.columns[:2] == ["op", "lsn"]
    assert df.count() == 10  # 9 upserts + 1 tombstone
    assert df.filter("op = 'D'").count() == 1
    # replaying the log through a fresh engine reproduces the table
    fresh = ManifestTable.create(
        spark, table.root + "_replay", TRANSCRIPT_SCHEMA, n_buckets=4
    )
    fresh.merge(df, epoch_id=0, mode="delta")
    assert _state(fresh) == _state(table)
    # batch time travel: version=1's log has the same rows here; version
    # of the FIRST commit lacks the tombstone
    v1 = (
        spark.read.format("edem_cdc")
        .option("path", table.root)
        .option("version", 1)
        .load()
    )
    assert v1.filter("op = 'D'").count() == 0


def test_streaming_table_to_table_replication(spark, table, tmp_root):
    eng_b = CDCEngine(
        spark,
        os.path.join(tmp_root, "b"),
        change_schema=CHANGE_EVENT_SCHEMA,
        n_buckets=2,
        merge_mode="delta",
    )
    cp = os.path.join(tmp_root, "cp")
    eng_b.replay_stream(_stream(spark, table.root, starting=0), cp)
    assert _state(eng_b.table) == _state(table)

    # new upstream commits + a compaction in range: the next run of the
    # SAME checkpoint ships only the new versions, across the rewrite
    table.merge(_batch(spark, _rows(4, start_key=20, lsn0=100, ts0=2000)), 2, mode="delta")
    table.compact()
    table.merge(_batch(spark, _rows(3, start_key=30, lsn0=200, ts0=3000)), 3, mode="delta")
    eng_b.replay_stream(_stream(spark, table.root, starting=0), cp)
    assert _state(eng_b.table) == _state(table)
    # exactly-once end to end: a third drain with nothing new is a no-op
    v = eng_b.table.current_version()
    eng_b.replay_stream(_stream(spark, table.root, starting=0), cp)
    assert eng_b.table.current_version() == v


def test_default_start_tails_from_head(spark, table, tmp_root):
    # no startingVersion: the stream's initial offset is the head when the
    # QUERY first runs (checkpointed then), so history never ships — only
    # commits after the first drain do
    eng_b = CDCEngine(
        spark,
        os.path.join(tmp_root, "b2"),
        change_schema=CHANGE_EVENT_SCHEMA,
        n_buckets=2,
        merge_mode="delta",
    )
    cp = os.path.join(tmp_root, "cp2")
    eng_b.replay_stream(_stream(spark, table.root), cp)  # pins head, ships 0
    assert _state(eng_b.table) == []
    table.merge(
        _batch(spark, [("U", 300, 5000, "z", 0, "user", "tail-only", None)]),
        5,
        mode="delta",
    )
    eng_b.replay_stream(_stream(spark, table.root), cp)
    assert _state(eng_b.table) == [("z", 0, "tail-only")]


def test_rename_shadow_folds_in_flight(spark, table, tmp_root):
    # files written BEFORE a rename carry the old physical name; the
    # source folds them to the stream's current-name schema
    table.rename_column("text", "body")
    table.merge(
        _batch(spark, [("U", 400, 6000, "c9", 0, "user", "after", None)])
        .withColumnRenamed("text", "body"),
        6,
        mode="delta",
    )
    df = spark.read.format("edem_cdc").option("path", table.root).load()
    assert "body" in df.columns and "text" not in df.columns
    vals = {r["body"] for r in df.collect()}
    assert "t-0" in vals and "after" in vals  # old-named file folded


def test_cow_range_fails_with_clear_error(spark, table, tmp_root):
    stream = _stream(spark, table.root, starting=0)
    table.merge(
        _batch(spark, [("U", 500, 7000, "q", 0, "user", "cowrow", None)]),
        7,
        mode="cow",
    )
    eng_b = CDCEngine(
        spark,
        os.path.join(tmp_root, "b3"),
        change_schema=CHANGE_EVENT_SCHEMA,
        n_buckets=2,
        merge_mode="delta",
    )
    with pytest.raises(Exception, match="CoW rewrite, rollback, or expired"):
        eng_b.replay_stream(stream, os.path.join(tmp_root, "cp3"))


def test_missing_path_option(spark):
    register_cdc_source(spark)
    with pytest.raises(Exception, match="requires .option"):
        spark.read.format("edem_cdc").load().count()


def test_engine_stream_changes_sugar(spark, table, tmp_root):
    """`eng_a.stream_changes()` -> `eng_b.replay_stream` is the one-call
    streaming replication API (registers the format itself)."""
    eng_a = CDCEngine(
        spark,
        table.root,  # attach to the existing table
        change_schema=CHANGE_EVENT_SCHEMA,
        n_buckets=2,
        merge_mode="delta",
    )
    eng_b = CDCEngine(
        spark,
        os.path.join(tmp_root, "b4"),
        change_schema=CHANGE_EVENT_SCHEMA,
        n_buckets=2,
        merge_mode="delta",
    )
    eng_b.replay_stream(
        eng_a.stream_changes(starting_version=0),
        os.path.join(tmp_root, "cp4"),
    )
    assert _state(eng_b.table) == _state(table)


def test_live_continuous_streaming_replication(spark, table, tmp_root):
    """CONTINUOUS mirror: a processingTime-triggered query over the
    edem_cdc source picks up upstream commits made WHILE it runs — the
    live cross-region replication topology, all stock Structured
    Streaming machinery."""
    import time as _time

    eng_b = CDCEngine(
        spark,
        os.path.join(tmp_root, "b5"),
        change_schema=CHANGE_EVENT_SCHEMA,
        n_buckets=2,
        merge_mode="delta",
    )
    q = eng_b.replay_stream(
        _stream(spark, table.root, starting=0),
        os.path.join(tmp_root, "cp5"),
        available_now=False,
        processing_time="1 seconds",
    )
    try:
        deadline = _time.monotonic() + 120
        while _time.monotonic() < deadline and not eng_b.table.current_version():
            _time.sleep(0.3)
        assert _state(eng_b.table) == _state(table)  # history shipped

        # commit upstream WHILE the mirror tail runs
        table.merge(
            _batch(spark, _rows(4, start_key=50, lsn0=900, ts0=9000, text="live")),
            9,
            mode="delta",
        )
        exp = _state(table)
        while _time.monotonic() < deadline:
            if _state(eng_b.table) == exp:
                break
            _time.sleep(0.5)
        assert _state(eng_b.table) == exp
    finally:
        q.stop()
        q.awaitTermination(30)
        eng_b.lineage.flush()


def test_empty_table_and_empty_range_read_cleanly(spark, tmp_root):
    register_cdc_source(spark)
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "empty"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    df = spark.read.format("edem_cdc").option("path", t.root).load()
    assert df.count() == 0
    assert df.columns[:2] == ["op", "lsn"]


def test_branch_option_streams_the_staged_chain(spark, table, tmp_root):
    """WAP audit topology: a write branch's staged commits are readable
    through the source WITHOUT publishing — and main's stream is isolated
    from them."""
    b = table.create_branch("audit")
    b.merge(
        _batch(spark, [("U", 700, 8000, "staged", 0, "user", "branch-only", None)]),
        10,
        mode="delta",
    )
    main_df = spark.read.format("edem_cdc").option("path", table.root).load()
    br_df = (
        spark.read.format("edem_cdc")
        .option("path", table.root)
        .option("branch", "audit")
        .load()
    )
    main_texts = {r["text"] for r in main_df.collect()}
    br_texts = {r["text"] for r in br_df.collect()}
    assert "branch-only" not in main_texts
    assert "branch-only" in br_texts and main_texts <= br_texts


def test_lagging_stream_past_retention_fails_loudly(spark, table, tmp_root):
    """A consumer that lags until its unsynced delta files are folded by
    compaction AND collected by vacuum must error clearly (the candidates
    walk verifies file presence) — never silently skip shipped-from-birth
    rows.  Same contract as Delta's source when history is VACUUMed."""
    eng_b = CDCEngine(
        spark,
        os.path.join(tmp_root, "b6"),
        change_schema=CHANGE_EVENT_SCHEMA,
        n_buckets=2,
        merge_mode="delta",
    )
    cp = os.path.join(tmp_root, "cp6")
    eng_b.replay_stream(_stream(spark, table.root, starting=0), cp)
    assert _state(eng_b.table) == _state(table)

    # the consumer now lags: more epochs land, get folded, and the folded
    # delta files are vacuumed away
    table.merge(_batch(spark, _rows(4, start_key=20, lsn0=100, ts0=2000)), 2, mode="delta")
    table.compact()
    table.expire_snapshots(keep_last=1)
    table.vacuum(keep_versions=1, grace_s=0)
    with pytest.raises(Exception, match="lagged past the table's retention"):
        eng_b.replay_stream(_stream(spark, table.root, starting=0), cp)
    # the mirror is untouched at its last good state
    assert eng_b.table.current_version() is not None
