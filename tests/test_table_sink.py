"""The table as a Spark WRITE target (`sources/table_sink.py`, PySpark 4
Python Data Source API, format "edem_cdc"): executor tasks stream
bucket-pure parquet delta files directly (vectorized driver-replica
xxhash64 bucket assignment, zero shuffle), the Spark-free driver commit
audits footers then publishes through `ManifestTable.commit_delta_files`
— exactly-once by (scope, batchId).  With the source half this closes
the Delta-style loop: `readStream.format("edem_cdc")` →
`writeStream.format("edem_cdc")` is full streaming table-to-table
replication with no engine import in the query."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable
from event_driven_etl_msc_research_spark.sources.table_source import (
    register_cdc_source,
)

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


def _batch(spark, rows, schema=BATCH_SCHEMA):
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    return spark.createDataFrame(pdf, schema)


def _rows(n, start_key=0, lsn0=0, ts0=1000, text="t"):
    return [
        ("U", lsn0 + i, ts0 + i, f"c{(start_key + i) % 5}",
         (start_key + i) // 5, "user", f"{text}-{start_key + i}", None)
        for i in range(n)
    ]


def _state(t):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.read().collect()
    )


@pytest.fixture()
def table(spark, tmp_root):
    register_cdc_source(spark)
    return ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=4
    )


def _write(df, root, epoch, **opts):
    w = df.write.format("edem_cdc").option("path", root).mode("append")
    if epoch is not None:
        w = w.option("epochId", epoch)
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()


def test_batch_sink_matches_merge_oracle(spark, table, tmp_root):
    """Writing change events through the sink produces the same visible
    state as merge(mode='delta') of the same events — including
    tombstones, within-batch duplicate keys, and out-of-order versions."""
    rows = (
        _rows(23)
        + [("D", 100, 5000, "c1", 0, None, None, None)]
        # late (older-version) duplicate for an existing key: must lose
        + [("U", 1, 10, "c0", 0, "user", "stale", None)]
    )
    df = _batch(spark, rows).repartition(6)  # multi-task write
    _write(df, table.root, epoch=0)

    oracle = ManifestTable.create(
        spark, os.path.join(tmp_root, "o"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    oracle.merge(_batch(spark, rows), 0, mode="delta")
    assert _state(table) == _state(oracle)
    # metadata-only commit: base files untouched, deltas appended
    m = table.manifest()
    assert m.get("delta_files")
    assert not m["files"]


def test_batch_sink_requires_epoch_and_is_exactly_once(spark, table):
    df = _batch(spark, _rows(8))
    with pytest.raises(Exception, match="epochId"):
        _write(df, table.root, epoch=None)
    _write(df, table.root, epoch=7)
    v = table.current_version()
    state = _state(table)
    # same idempotence token: a retry is a no-op AND its staged bytes are
    # dropped (no orphan growth)
    data_dirs = lambda: {
        d for d in os.listdir(os.path.join(table.root, "data"))
    }
    before = data_dirs()
    _write(df, table.root, epoch=7)
    assert table.current_version() == v
    assert _state(table) == state
    assert data_dirs() == before
    # a different token commits again
    _write(_batch(spark, _rows(4, start_key=50, lsn0=200, ts0=9000)),
           table.root, epoch=8)
    assert table.current_version() == v + 1
    assert len(_state(table)) == len(state) + 4


def test_sink_bucket_purity_and_pruned_lookup(spark, table):
    """Files written by the sink carry the same bucket assignment as
    merge() would compute, so bucket-pinned point lookups read only the
    pinned bucket's files."""
    _write(_batch(spark, _rows(30)).repartition(4), table.root, epoch=0)
    from event_driven_etl_msc_research_spark.hashing import spark_bucket

    m = table.manifest()
    for b, paths in (m.get("delta_files") or {}).items():
        for rel in paths:
            pdf = pd.read_parquet(os.path.join(table.root, rel))
            assert (pdf["_bucket"] == int(b)).all()
            got = {
                spark_bucket(c, T.StringType(), 4)
                for c in pdf["conv_id"].tolist()
            }
            assert got == {int(b)}
    rows = table.read(where={"conv_id": ("c3", "c3")}).collect()
    assert sorted(r["text"] for r in rows) == sorted(
        f"t-{i}" for i in range(30) if i % 5 == 3
    )


def test_sink_schema_evolution_additive(spark, table):
    """A batch carrying a new payload column evolves the table exactly
    like merge() does (additive, nullable); older rows read NULL."""
    _write(_batch(spark, _rows(6)), table.root, epoch=0)
    ev_schema = T.StructType(
        BATCH_SCHEMA.fields
        + [T.StructField("tool_meta", T.StringType())]
    )
    rows = [
        ("U", 100 + i, 5000 + i, f"e{i}", 0, "assistant", f"n-{i}", None,
         f"meta-{i}")
        for i in range(4)
    ]
    _write(_batch(spark, rows, ev_schema), table.root, epoch=1)
    out = table.read()
    assert "tool_meta" in out.columns
    got = {
        (r["conv_id"], r["tool_meta"])
        for r in out.select("conv_id", "tool_meta").collect()
    }
    assert ("e2", "meta-2") in got
    assert all(tm is None for c, tm in got if c.startswith("c"))


def test_sink_refusals(spark, table, tmp_root):
    df = _batch(spark, _rows(3))
    with pytest.raises(Exception, match="append-only"):
        (df.write.format("edem_cdc").option("path", table.root)
         .option("epochId", 0).mode("overwrite").save())
    with pytest.raises(Exception, match="option\\('path'"):
        df.write.format("edem_cdc").option("epochId", 0).mode("append").save()
    with pytest.raises(Exception, match="no table at"):
        _write(df, os.path.join(tmp_root, "missing"), epoch=0)
    with pytest.raises(Exception, match="missing"):
        _write(df.drop("op", "lsn"), table.root, epoch=0)
    with pytest.raises(Exception, match="key columns"):
        _write(df.drop("conv_id"), table.root, epoch=0)
    # CHECK-constrained tables are refused loudly (sink can't validate)
    c = ManifestTable.create(
        spark, os.path.join(tmp_root, "c"), TRANSCRIPT_SCHEMA, n_buckets=2,
        constraints={"turn_nonneg": "turn_idx >= 0"},
    )
    with pytest.raises(Exception, match="CHECK constraints"):
        _write(df, c.root, epoch=0)


def test_streaming_sink_replicates_table_to_table(spark, table, tmp_root):
    """The full Delta-style loop: source-tail A, sink-write B, no engine
    import in the query; resume ships only the new commits; a third drain
    with nothing new is a version no-op (exactly-once end to end)."""
    a = ManifestTable.create(
        spark, os.path.join(tmp_root, "a"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    a.merge(_batch(spark, _rows(9)), 0, mode="delta")
    a.merge(_batch(spark, [("D", 50, 9000, "c0", 0, None, None, None)]),
            1, mode="delta")
    cp = os.path.join(tmp_root, "cp")

    def drain():
        (spark.readStream.format("edem_cdc").option("path", a.root)
         .option("startingVersion", 0).load()
         .writeStream.format("edem_cdc").option("path", table.root)
         .option("checkpointLocation", cp)
         .trigger(availableNow=True).start().awaitTermination())

    drain()
    assert _state(table) == _state(a)
    a.merge(_batch(spark, _rows(5, start_key=20, lsn0=100, ts0=2000)),
            2, mode="delta")
    a.compact()
    drain()
    assert _state(table) == _state(a)
    v = table.current_version()
    drain()
    assert table.current_version() == v


def test_aborted_staging_is_vacuum_garbage(spark, table):
    """A crashed/aborted attempt leaves only unreferenced task dirs that
    vacuum removes; committed files survive."""
    _write(_batch(spark, _rows(10)), table.root, epoch=0)
    state = _state(table)
    # simulate an orphaned task attempt: a stray staging dir with a file
    orphan = os.path.join(table.root, "data", "s-deadbeef", "_pb=0")
    os.makedirs(orphan)
    src_rel = next(iter(table.manifest()["delta_files"].values()))[0]
    import shutil

    shutil.copy(os.path.join(table.root, src_rel),
                os.path.join(orphan, "part-0.parquet"))
    removed = table.vacuum(grace_s=0)
    assert any("s-deadbeef" in r for r in removed)
    assert _state(table) == state


def _stage_copies(root, rel_files, tag):
    """Copy committed delta files into fresh task-style staging dirs —
    simulating a second external writer's durable-but-uncommitted output
    (bucket-pure by construction: the donor has the same key/buckets)."""
    import shutil

    import pyarrow.parquet as pq

    staged, rows = {}, {}
    for i, rel in enumerate(sorted(rel_files)):
        b = int(rel.split("_pb=")[1].split("/")[0])
        new_rel = f"data/s{tag}-{i:x}/_pb={b}/part-0.parquet"
        dst = os.path.join(root, new_rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy(os.path.join(root, rel), dst)
        staged.setdefault(b, []).append(new_rel)
        n = pq.ParquetFile(dst).metadata.num_rows
        rows[str(b)] = rows.get(str(b), 0) + n
    return staged, rows


def _delta_rels(t):
    return {p for ps in (t.manifest().get("delta_files") or {}).values()
            for p in ps}


def test_external_commit_race_both_writers_survive(spark, table):
    """Two external writers committing different epochs race on the same
    version: the loser's first publish hits ManifestConflict, its retry
    re-assembles against the winner's manifest, and BOTH batches land
    (the round-4 merge-race guarantee extended to the Spark-free verb)."""
    _write(_batch(spark, _rows(10)), table.root, epoch=0)
    before = _delta_rels(table)
    _write(_batch(spark, _rows(6, start_key=40, lsn0=100, ts0=5000)),
           table.root, epoch=1)
    batch2 = _delta_rels(table) - before

    sA, rA = _stage_copies(table.root, sorted(before), "racea")
    sB, rB = _stage_copies(table.root, batch2, "raceb")
    payload = table.schema()

    a = ManifestTable(None, table.root)
    b = ManifestTable(None, table.root)
    real_publish = a._publish
    fired = {"done": False}

    def hooked(manifest):
        if not fired["done"]:
            fired["done"] = True
            # B commits the contested version while A is mid-publish
            b.commit_delta_files(sB, rB, {}, 11, payload, epoch_scope="x")
        real_publish(manifest)

    a._publish = hooked
    res = a.commit_delta_files(sA, rA, {}, 10, payload, epoch_scope="x")
    assert res["status"] == "Success"
    assert fired["done"]
    m = table.manifest()
    for key in ("x:10", "x:11"):
        assert key in m["applied_epochs"], m["applied_epochs"]
    live = _delta_rels(table)
    for bb, ps in {**sA, **sB}.items():
        for p in ps:
            assert p in live
    # the duplicated rows fold away at read time (same keys, max version)
    assert len(_state(table)) == 16


def test_external_commit_same_epoch_race_skips(spark, table):
    """Both writers carry the SAME idempotence token: the loser's retry
    sees the epoch applied and returns Skipped — never a double apply."""
    _write(_batch(spark, _rows(8)), table.root, epoch=0)
    staged_a, rows_a = _stage_copies(table.root, _delta_rels(table), "dupa")
    staged_b, rows_b = _stage_copies(table.root, _delta_rels(table), "dupb")
    payload = table.schema()

    a = ManifestTable(None, table.root)
    b = ManifestTable(None, table.root)
    real_publish = a._publish
    fired = {"done": False}

    def hooked(manifest):
        if not fired["done"]:
            fired["done"] = True
            b.commit_delta_files(staged_b, rows_b, {}, 5, payload,
                                 epoch_scope="y")
        real_publish(manifest)

    a._publish = hooked
    res = a.commit_delta_files(staged_a, rows_a, {}, 5, payload,
                               epoch_scope="y")
    assert res["status"] == "Skipped"
    assert "concurrent writer" in res["reason"]
    # only B's files are referenced; A's stay orphans for vacuum
    live = _delta_rels(table)
    assert all(p in live for ps in staged_b.values() for p in ps)
    assert all(p not in live for ps in staged_a.values() for p in ps)


def test_external_commit_lost_to_rebucket_raises(spark, table):
    """A bucket-layout change mid-commit makes the staged files
    mis-bucketed; the Spark-free verb cannot restage, so it must raise
    instead of publishing wrong buckets (unlike merge, which restages)."""
    _write(_batch(spark, _rows(8)), table.root, epoch=0)
    staged, rows = _stage_copies(table.root, _delta_rels(table), "rb")
    payload = table.schema()

    a = ManifestTable(None, table.root)
    real_publish = a._publish
    fired = {"done": False}

    def hooked(manifest):
        if not fired["done"]:
            fired["done"] = True
            ManifestTable(spark, table.root).rebucket(8)
        real_publish(manifest)

    a._publish = hooked
    with pytest.raises(RuntimeError, match="bucket-layout"):
        a.commit_delta_files(staged, rows, {}, 9, payload, epoch_scope="z")
    # table stays healthy on the new layout; the staged copies are orphans
    assert table.manifest()["n_buckets"] == 8
    assert len(_state(table)) == 8
