"""Snapshot history + expiry (round-4 directive #6): ``ManifestTable.history``
returns the audit-shaped snapshots table; ``expire_snapshots(older_than)``
deletes old manifest OBJECTS so the next ``vacuum`` can release the data files
only they referenced.  Parameterized over both storage backends."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable


def _changes_df(spark, rows):
    cols = ["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"]
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
    ]
    return spark.createDataFrame(pdf, T.StructType(fields))


@pytest.fixture()
def table(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "hist_tbl")
    return ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=4,
        storage=storage_factory(root),
    )


def _rows(base, n=12):
    return [
        ("I", base + i, 1000 + base + i, f"c{i % 5}", i // 5, "user",
         f"t{base + i}", None)
        for i in range(n)
    ]


def test_history_tracks_operations_and_file_diffs(spark, table):
    table.merge(_changes_df(spark, _rows(0)), 1, mode="delta")
    table.merge(_changes_df(spark, _rows(100)), 2, mode="delta")
    table.compact()
    table.rebucket(8)

    h = {r["version"]: r for r in table.history().collect()}
    assert [h[v]["operation"] for v in sorted(h)] == [
        "create", "merge", "merge", "compact", "rebucket"
    ]
    assert h[0]["parent"] is None and h[0]["n_files"] == 0
    assert h[1]["parent"] == 0 and h[1]["epoch_id"] == "batch:1"
    # delta merges only ADD files; compact/rebucket replace them
    assert h[1]["added_files"] > 0 and h[1]["removed_files"] == 0
    assert h[2]["added_files"] > 0 and h[2]["removed_files"] == 0
    assert h[3]["operation"] == "compact" and h[3]["removed_files"] > 0
    assert h[4]["removed_files"] == h[3]["n_files"]  # full rewrite
    assert h[4]["total_rows"] == 12  # both epochs upsert the same 12 keys
    # committed_at is monotone over the chain
    times = [h[v]["committed_at"] for v in sorted(h)]
    assert times == sorted(times)


def test_expire_snapshots_releases_data_and_blocks_time_travel(spark, table):
    for e in range(1, 5):
        table.merge(_changes_df(spark, _rows(100 * e, n=6)), e)
    assert table.current_version() == 4
    n_live = table.read().count()

    cutoff = time.time() + 1  # everything committed so far is "old"
    expired = table.expire_snapshots(older_than_ts=cutoff, keep_last=2)
    assert expired == [0, 1, 2]
    # survivors: current + one parent; current state unaffected
    assert sorted(table._list_versions()) == [3, 4]
    assert table.read().count() == n_live
    assert table.read(version=3).count() > 0  # retained parent still readable
    with pytest.raises(FileNotFoundError):
        table.read(version=1).collect()

    # history over the gap: v3's parent (v2) is expired → null diffs
    h = {r["version"]: r for r in table.history().collect()}
    assert set(h) == {3, 4}
    assert h[3]["added_files"] is None and h[3]["removed_files"] is None
    assert h[4]["added_files"] is not None

    # expiry RELEASES files: vacuum with keep_versions beyond the surviving
    # chain still only protects surviving manifests' files
    removed = table.vacuum(keep_versions=10, grace_s=0.0)
    assert removed  # v1/v2's superseded bucket rewrites are now collectable
    assert table.read().count() == n_live
    assert table.read(version=3).count() > 0

    # idempotent / keep_last floor: nothing left to expire
    assert table.expire_snapshots(older_than_ts=cutoff, keep_last=2) == []
    # keep_last=1 with no cutoff expires all but current
    assert table.expire_snapshots() == [3]
    assert table._list_versions() == [4]


def test_expire_accepts_iso_string(spark, table):
    table.merge(_changes_df(spark, _rows(0, n=4)), 1)
    assert table.expire_snapshots(older_than_ts="2000-01-01") == []
    assert table.expire_snapshots(older_than_ts="2100-01-01") == [0]


def test_files_and_partitions_metadata_tables(spark, table):
    """files(): one row per data file with bucket/kind/bytes/stats;
    partitions(): per-bucket base/delta rollup consistent with the manifest
    — the compaction-planning surface."""
    import json

    table.merge(_changes_df(spark, _rows(0, n=12)), 1)
    table.merge(_changes_df(spark, _rows(100, n=6)), 2, mode="delta")

    f = table.files().collect()
    m = table.manifest()
    n_base = sum(len(ps) for ps in m["files"].values())
    n_delta = sum(len(ps) for ps in (m.get("delta_files") or {}).values())
    assert len(f) == n_base + n_delta > 0
    kinds = {r["kind"] for r in f}
    assert kinds == {"base", "delta"}
    for r in f:
        assert r["size_bytes"] and r["size_bytes"] > 0
        assert r["file_path"].startswith("data/")
        assert r["written_at"] is not None
        st = json.loads(r["stats_json"])
        # stats carry the configured cols with [min, max, null_count]
        # bounds plus the per-file ::rows count
        assert "conv_id" in st and len(st["conv_id"]) == 3
        assert st["::rows"][0] > 0

    p = {r["bucket"]: r for r in table.partitions().collect()}
    assert sum(r["base_files"] for r in p.values()) == n_base
    assert sum(r["delta_files"] for r in p.values()) == n_delta
    assert sum(r["delta_rows"] for r in p.values()) == 6
    # bytes rollup matches the per-file table
    assert sum(r["base_bytes"] or 0 for r in p.values()) == sum(
        r["size_bytes"] for r in f if r["kind"] == "base"
    )

    # time travel: the pre-delta snapshot has no delta files
    f1 = table.files(version=table.current_version() - 1).collect()
    assert {r["kind"] for r in f1} == {"base"}

    # after compaction the deltas fold away
    table.compact()
    assert {r["kind"] for r in table.files().collect()} == {"base"}
    assert all(
        r["delta_files"] == 0 and r["delta_rows"] == 0
        for r in table.partitions().collect()
    )


def test_read_as_of_timestamp(spark, table):
    import datetime as dt

    table.merge(_changes_df(spark, _rows(0, n=4)), 1)
    t1 = dt.datetime.now(tz=dt.timezone.utc)
    v1 = table.current_version()
    time.sleep(0.05)
    new_rows = [("I", 200 + i, 2000 + i, f"x{i}", 0, "user", f"new{i}", None)
                for i in range(4)]
    table.merge(_changes_df(spark, new_rows), 2, mode="delta")

    # as_of between the commits resolves to the first snapshot
    assert table.read(as_of=t1).count() == table.read(version=v1).count() == 4
    # ISO string and epoch-seconds forms; "now" resolves to current
    assert table.read(as_of=dt.datetime.now(tz=dt.timezone.utc)).count() == 8
    assert table.read(as_of=t1.isoformat()).count() == 4
    assert table.read(as_of=t1.timestamp()).count() == 4
    # before the table existed → loud error
    with pytest.raises(FileNotFoundError, match="no surviving snapshot"):
        table.read(as_of="2000-01-01")
    # selectors are mutually exclusive
    with pytest.raises(ValueError, match="mutually exclusive"):
        table.read(version=0, as_of=t1)


def test_rollback_to_snapshot(spark, table):
    table.merge(_changes_df(spark, _rows(0, n=4)), 1)
    good = table.current_version()
    table.tag("good", good)
    new_rows = [("I", 200 + i, 2000 + i, f"x{i}", 0, "user", f"new{i}", None)
                for i in range(4)]
    table.merge(_changes_df(spark, new_rows), 2, mode="delta")
    bad = table.current_version()
    assert table.read().count() == 8

    res = table.rollback_to(tag="good")
    assert res["status"] == "Success" and res["rolled_back_to"] == good
    assert table.current_version() == bad + 1
    assert table.read().count() == 4
    # nothing deleted: the bad snapshot is still inspectable
    assert table.read(version=bad).count() == 8
    h = {r["version"]: r["operation"] for r in table.history().collect()}
    assert h[bad + 1] == "rollback"

    # the ledger is the target's: the rolled-back epoch re-applies cleanly
    r = table.merge(_changes_df(spark, new_rows), 2, mode="delta")
    assert r["status"] == "Success"
    assert table.read().count() == 8

    # change feed across a rollback must see the deletions (no fast path)
    table.rollback_to(version=good)
    ch = table.changes(bad)
    kinds = {r["_change_type"] for r in ch.collect()}
    assert kinds == {"delete"}
    assert ch.count() == 4

    # misuse
    with pytest.raises(ValueError, match="exactly one"):
        table.rollback_to()
    with pytest.raises(ValueError, match="exactly one"):
        table.rollback_to(version=good, tag="good")
    assert table.rollback_to(version=table.current_version())["status"] == "NoChange"


def test_vacuum_dry_run_reports_without_deleting(spark, table):
    table.merge(_changes_df(spark, _rows(0, n=4)), 1)
    table.merge(_changes_df(spark, _rows(0, n=4)), 2)  # CoW rewrite → orphans
    would = table.vacuum(keep_versions=1, grace_s=0.0, dry_run=True)
    assert would  # superseded bucket rewrites are collectable
    assert set(table.storage.list_dirs("data")) >= set(would)  # nothing gone
    removed = table.vacuum(keep_versions=1, grace_s=0.0)
    assert sorted(removed) == sorted(would)
    assert not set(table.storage.list_dirs("data")) & set(removed)


def test_check_fsck(spark, tmp_root):
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = _os.path.join(tmp_root, "fsck")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=2
    )
    t.merge(_changes_df(spark, _rows(0, n=8)), 1)
    t.merge(
        _changes_df(
            spark,
            [("I", 50 + i, 1500 + i, f"y{i}", 0, "user", f"t{i}", None)
             for i in range(4)],
        ),
        2,
        mode="delta",
    )
    r = t.check(verify_rows=True)
    assert r["status"] == "Success" and not r["missing_files"]
    assert r["files"] > 0 and not r["row_mismatches"]

    # simulate restore corruption: replace one referenced delta file with a
    # short parquet → row mismatch; then remove it entirely → missing file
    victim = next(
        p for ps in t.manifest()["delta_files"].values() for p in ps
    )
    vpath = _os.path.join(root, victim)
    pq.write_table(pa.table({"x": [1]}), vpath)
    r = t.check(verify_rows=True)
    assert r["status"] == "Corrupt" and r["row_mismatches"]
    assert r["row_mismatches"][0]["kind"] == "delta"

    _os.remove(vpath)
    r = t.check()
    assert r["status"] == "Corrupt" and r["missing_files"] == [victim]
