"""Optimistic-concurrency manifest commits (two writers, one table).

``_publish`` claims a version with an atomic hard-link (put-if-absent); a
losing ``merge`` rebases onto the winner's manifest and retries.  Interleaving
is driven deterministically through the ``before_publish`` hook: writer A
stages, then — before A's commit — writer B runs a full merge and wins the
version; A must detect the conflict and still commit correctly.
"""

from __future__ import annotations

import os

import pandas as pd
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


def _state(table):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()
    }


def _one_shot(fn):
    fired = {"done": False}

    def hook(_m):
        if not fired["done"]:
            fired["done"] = True
            fn()

    return hook


def _two_tables(spark, tmp_root, name, storage_factory):
    root = os.path.join(tmp_root, name)
    a = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=4,
        storage=storage_factory(root),
    )
    # second writer handle on the same root (own storage handle, as two
    # processes would hold two clients)
    b = ManifestTable(spark, root, storage=storage_factory(root))
    return a, b


def test_interleaved_delta_merges_both_commit(spark, tmp_root, storage_factory):
    a, b = _two_tables(spark, tmp_root, storage_factory=storage_factory, name="t_delta")
    rows_a = [("I", 1, 100, "convA", 0, "user", "a0", None)]
    rows_b = [("I", 2, 100, "convB", 0, "user", "b0", None)]

    rb = a.merge(
        _changes_df(spark, rows_a),
        epoch_id=1,
        mode="delta",
        before_publish=_one_shot(
            lambda: b.merge(_changes_df(spark, rows_b), epoch_id=2, mode="delta")
        ),
    )
    assert rb["status"] == "Success"
    m = a.manifest()
    assert m["version"] == 2  # both commits landed, no version collision
    assert {"b:1", "b:2"} <= set(m["applied_epochs"]) or {
        "batch:1",
        "batch:2",
    } <= set(m["applied_epochs"])
    assert _state(a) == {("convA", 0): "a0", ("convB", 0): "b0"}


def test_interleaved_cow_disjoint_buckets_rebases(spark, tmp_root, storage_factory):
    a, b = _two_tables(spark, tmp_root, storage_factory=storage_factory, name="t_cow")
    # seed so both writers hit the non-initial CoW path
    seed = [(f"c{i}", i) for i in range(8)]
    a.merge(
        _changes_df(
            spark, [("I", i, 50, c, t, "user", "seed", None) for i, (c, t) in enumerate(seed)]
        ),
        epoch_id=0,
    )
    # find two convs in different buckets
    from event_driven_etl_msc_research_spark.sinks.manifest import _bucket_expr

    buckets = {
        r["conv_id"]: r["b"]
        for r in spark.createDataFrame([(c,) for c, _ in seed], "conv_id string")
        .select("conv_id", _bucket_expr(4).alias("b"))
        .collect()
    }
    ca = next(c for c, bk in buckets.items() if bk != buckets["c0"])
    r = a.merge(
        _changes_df(spark, [("U", 100, 200, ca, int(ca[1:]), "user", "A", None)]),
        epoch_id=1,
        before_publish=_one_shot(
            lambda: b.merge(
                _changes_df(
                    spark, [("U", 101, 200, "c0", 0, "user", "B", None)]
                ),
                epoch_id=2,
            )
        ),
    )
    assert r["status"] == "Success"
    m = a.manifest()
    assert m["version"] == 3
    st = _state(a)
    assert st[(ca, int(ca[1:]))] == "A" and st[("c0", 0)] == "B"


def test_interleaved_cow_same_bucket_redoes_merge(spark, tmp_root, storage_factory):
    a, b = _two_tables(spark, tmp_root, storage_factory=storage_factory, name="t_cow_conflict")
    a.merge(
        _changes_df(spark, [("I", 0, 50, "k", 0, "user", "seed", None)]),
        epoch_id=0,
    )
    # both writers touch conv "k"'s bucket; B updates turn 1, A updates turn 0
    r = a.merge(
        _changes_df(spark, [("U", 100, 200, "k", 0, "user", "A", None)]),
        epoch_id=1,
        before_publish=_one_shot(
            lambda: b.merge(
                _changes_df(spark, [("I", 101, 200, "k", 1, "user", "B", None)]),
                epoch_id=2,
            )
        ),
    )
    assert r["status"] == "Success"
    assert _state(a) == {("k", 0): "A", ("k", 1): "B"}


def test_duplicate_epoch_across_writers_is_skipped(spark, tmp_root, storage_factory):
    a, b = _two_tables(spark, tmp_root, storage_factory=storage_factory, name="t_dup")
    df_rows = [("I", 1, 100, "x", 0, "user", "once", None)]
    r = a.merge(
        _changes_df(spark, df_rows),
        epoch_id=7,
        mode="delta",
        before_publish=_one_shot(
            lambda: b.merge(_changes_df(spark, df_rows), epoch_id=7, mode="delta")
        ),
    )
    # B committed epoch 7 first; A's retry must detect it and skip
    assert r["status"] == "Skipped"
    assert _state(a) == {("x", 0): "once"}
    assert a.manifest()["applied_epochs"].count("batch:7") == 1


def test_vacuum_grace_protects_inflight_staging(spark, tmp_root, storage_factory):
    """A concurrent writer's staging dir is unreferenced until its manifest
    publishes; vacuum's grace window must leave young unreferenced dirs
    alone (deleting them mid-write would corrupt the other writer's
    commit), while grace_s=0 reclaims them eagerly."""
    import time as _time

    a, b = _two_tables(spark, tmp_root, storage_factory=storage_factory, name="t_grace")
    a.merge(
        _changes_df(spark, [("I", 0, 50, "x", 0, "user", "seed", None)]),
        epoch_id=0,
    )
    # simulate writer B's in-flight staging: stage files, never publish
    class _Abort(Exception):
        pass

    def crash(_m):
        raise _Abort()

    try:
        b.merge(
            _changes_df(spark, [("I", 1, 60, "y", 0, "user", "inflight", None)]),
            epoch_id=1,
            before_publish=crash,
        )
    except _Abort:
        pass
    data_dir = os.path.join(a.root, "data")
    orphans_before = {
        d for d in os.listdir(data_dir)
    } - {
        p.split("/")[1]
        for ps in a.manifest()["files"].values()
        for p in ps
    }
    assert orphans_before  # the aborted attempt staged files

    removed = a.vacuum(keep_versions=1)  # default grace: must NOT touch them
    assert removed == []

    removed = a.vacuum(keep_versions=1, grace_s=0)  # eager: reclaims
    assert set(removed) >= orphans_before


def test_rebucket_wins_race_against_delta_merge(spark, tmp_root, storage_factory):
    """If rebucket() wins the manifest race against an in-flight delta merge,
    the merge's staged files are hashed under the OLD bucket count — a naive
    delta rebase would republish the stale n_buckets and mis-bucket data
    (breaking only_bucket point-lookup pruning).  The merge must detect the
    layout change and redo itself against the fresh manifest."""
    a, b = _two_tables(spark, tmp_root, storage_factory=storage_factory, name="t_rebucket_race")
    seed = [(f"c{i}", i) for i in range(8)]
    a.merge(
        _changes_df(
            spark,
            [("I", i, 50, c, t, "user", "seed", None) for i, (c, t) in enumerate(seed)],
        ),
        epoch_id=0,
    )
    r = a.merge(
        _changes_df(spark, [("I", 100, 200, "newconv", 0, "user", "late", None)]),
        epoch_id=1,
        mode="delta",
        before_publish=_one_shot(lambda: b.rebucket(9)),
    )
    assert r["status"] == "Success"
    m = a.manifest()
    # the rebucketed layout survives — the losing merge must NOT revert it
    assert m["n_buckets"] == 9
    st = _state(a)
    assert st[("newconv", 0)] == "late"
    assert len(st) == 9
    # point-lookup pruning still finds the key merged after the rebucket
    got = {
        (row["conv_id"], row["turn_idx"]): row["text"]
        for row in a.read(where={"conv_id": ("newconv", "newconv")}).collect()
    }
    assert got == {("newconv", 0): "late"}
    # every delta file must live in the bucket dir matching the NEW layout:
    # re-reading each delta bucket's files, all rows hash to that bucket
    from event_driven_etl_msc_research_spark.sinks.manifest import _bucket_expr

    for bkt, paths in (m.get("delta_files") or {}).items():
        rows = (
            spark.read.parquet(*[os.path.join(a.root, p) for p in paths])
            .select(_bucket_expr(m["n_buckets"]).alias("b"))
            .distinct()
            .collect()
        )
        assert {row["b"] for row in rows} == {int(bkt)}


def test_rebucket_wins_race_against_cow_merge(spark, tmp_root, storage_factory):
    """Same race on the CoW path: the existing touched-bucket staleness check
    fires (rebucket rewrites every file), and the redo must publish under the
    winner's NEW bucket count."""
    a, b = _two_tables(spark, tmp_root, storage_factory=storage_factory, name="t_rebucket_race_cow")
    a.merge(
        _changes_df(spark, [("I", 0, 50, "k", 0, "user", "seed", None)]),
        epoch_id=0,
    )
    r = a.merge(
        _changes_df(spark, [("U", 100, 200, "k", 0, "user", "A", None)]),
        epoch_id=1,
        before_publish=_one_shot(lambda: b.rebucket(7)),
    )
    assert r["status"] == "Success"
    m = a.manifest()
    assert m["n_buckets"] == 7
    assert _state(a) == {("k", 0): "A"}


def test_compact_loses_race_to_merge_and_skips(spark, tmp_root,
                                               storage_factory):
    """Compaction is pure maintenance: losing the publish race to an
    ingest commit returns Skipped — the ingest wins, nothing blocks or
    retries, the fold simply re-runs at the next cadence; the aborted
    compaction's staged files are vacuum garbage."""
    a, b = _two_tables(
        spark, tmp_root, storage_factory=storage_factory, name="t_cmpr"
    )
    rows = [("I", i, 100 + i, f"conv{i % 3}", i // 3, "user", f"t{i}", None)
            for i in range(9)]
    a.merge(_changes_df(spark, rows), epoch_id=1, mode="delta")
    late = [("I", 50, 900, "convL", 0, "user", "late", None)]

    st = a.compact(
        before_publish=_one_shot(
            lambda: b.merge(_changes_df(spark, late), epoch_id=2,
                            mode="delta")
        )
    )
    assert st["status"] == "Skipped"
    assert "concurrent writer" in st["reason"]
    # the ingest won; state includes the late row, nothing lost
    exp = {(f"conv{i % 3}", i // 3): f"t{i}" for i in range(9)}
    exp[("convL", 0)] = "late"
    assert _state(a) == exp
    # the compaction's staged dir is unreferenced → vacuum garbage
    removed = a.vacuum(grace_s=0)
    assert any("compact" in d for d in removed), removed
    assert _state(a) == exp
    # the next cadence folds cleanly
    st = a.compact()
    assert st["status"] == "Success"
    assert _state(a) == exp
    assert not a.manifest().get("delta_files")


def test_merge_loses_race_to_compact_and_rebases(spark, tmp_root,
                                                 storage_factory):
    """The other direction: an ingest commit losing the publish race to a
    compaction rebases onto the compacted manifest and still lands —
    ingest never fails because maintenance ran."""
    a, b = _two_tables(
        spark, tmp_root, storage_factory=storage_factory, name="t_mcr"
    )
    rows = [("I", i, 100 + i, f"conv{i % 3}", i // 3, "user", f"t{i}", None)
            for i in range(9)]
    a.merge(_changes_df(spark, rows), epoch_id=1, mode="delta")
    late = [("I", 50, 900, "convL", 0, "user", "late", None)]

    st = a.merge(
        _changes_df(spark, late),
        epoch_id=2,
        mode="delta",
        before_publish=_one_shot(lambda: b.compact()),
    )
    assert st["status"] == "Success"
    exp = {(f"conv{i % 3}", i // 3): f"t{i}" for i in range(9)}
    exp[("convL", 0)] = "late"
    assert _state(a) == exp
    m = a.manifest()
    # the rebased merge's delta rides on top of the compacted base, and
    # the compaction holds the version just below it
    assert m.get("delta_files")
    assert "compact:" in str(a.manifest(m["version"] - 1)["epoch_id"]), (
        "compaction should hold the prior version"
    )
