"""Write branches (Iceberg BRANCH / write-audit-publish analogue):
create_branch → write on the branch → audit with ordinary reads → atomic
fast_forward publish (or drop_branch to abandon).  Parameterized over both
storage backends; covers isolation, the exactly-once ledger carry, the
change-feed fast path across a publish, vacuum protection for live
branches, garbage collection after a drop, conflict on a diverged main,
and the misuse surface.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import (
    ManifestConflict,
    ManifestTable,
)

DAY = 86_400


def _changes(spark, day, convs, lsn0):
    rows = [
        ("I", lsn0 + i, day * DAY + i, c, i, "user", f"d{day}-{c}-{i}", None)
        for c in convs
        for i in range(2)
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"],
    )
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


def _texts(df):
    return sorted(r["text"] for r in df.select("text").collect())


def test_branch_isolation_publish_and_ledger_carry(
    spark, tmp_root, storage_factory
):
    root = os.path.join(tmp_root, "t")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=2, storage=storage_factory(root)
    )
    t.merge(_changes(spark, 1, ["a"], 0), 0)
    base = t.current_version()

    b = t.create_branch("audit")
    assert t.branches() == {"audit": {"base": base, "head": base}}
    # the branch handle reads the fork-base state before any branch commit
    assert _texts(b.read()) == _texts(t.read(version=base))

    # two delta commits on the branch; main is untouched
    b.merge(_changes(spark, 2, ["b"], 10), 1, mode="delta")
    b.merge(_changes(spark, 3, ["c"], 20), 2, mode="delta")
    assert t.current_version() == base
    assert len(_texts(t.read())) == 2
    assert len(_texts(b.read())) == 6
    # branch time travel below the fork falls through to the main chain
    assert _texts(b.read(version=base)) == _texts(t.read(version=base))

    # publish: ONE squash commit, state equals the branch head
    res = t.fast_forward("audit")
    assert res["status"] == "Success"
    assert res["branch_commits"] == 2
    assert t.current_version() == base + 1
    assert _texts(t.read()) == _texts(b.read())
    h = {r["version"]: r["operation"] for r in t.history().collect()}
    assert h[base + 1] == "publish"

    # the exactly-once ledger carried: re-merging a branch epoch on main
    # is a ledger no-op, not a double apply
    res = t.merge(_changes(spark, 3, ["c"], 20), 2, mode="delta")
    assert res["status"] == "Skipped"
    assert len(_texts(t.read())) == 6

    # published branch is disposable; its files stay referenced by main
    assert t.drop_branch("audit") is True
    assert t.drop_branch("audit") is False
    t.vacuum(keep_versions=1, grace_s=0.0)
    assert len(_texts(t.read())) == 6


def test_changes_fast_path_survives_a_publish(spark, tmp_root):
    root = os.path.join(tmp_root, "fp")
    t = ManifestTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=2)
    t.merge(_changes(spark, 1, ["a"], 0), 0)
    base = t.current_version()
    b = t.create_branch("wap")
    b.merge(_changes(spark, 2, ["b"], 10), 1, mode="delta")
    t.fast_forward("wap")
    t.drop_branch("wap")
    ma, mb = t.manifest(base), t.manifest()
    # delta-only branch work → the publish step's files diff IS its delta
    # files, so the candidate fast path walks through the squash commit
    cand = t._append_candidates(base, t.current_version(), ma, mb)
    assert cand is not None and len(cand[0]) > 0
    ch = {
        (r["conv_id"], r["turn_idx"]): r["_change_type"]
        for r in t.changes(base).collect()
    }
    assert ch == {("b", 0): "insert", ("b", 1): "insert"}


def test_publish_conflict_when_main_advances(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "cf")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=2, storage=storage_factory(root)
    )
    t.merge(_changes(spark, 1, ["a"], 0), 0)
    b = t.create_branch("stale")
    b.merge(_changes(spark, 2, ["b"], 10), 1, mode="delta")
    t.merge(_changes(spark, 3, ["c"], 20), 2, mode="delta")  # main advances
    with pytest.raises(ManifestConflict, match="main advanced"):
        t.fast_forward("stale")
    # main state is untouched by the failed publish
    assert len(_texts(t.read())) == 4
    # the branch remains usable for audit and can be abandoned
    assert len(_texts(b.read())) == 4
    assert t.drop_branch("stale") is True


def test_abandoned_branch_files_are_vacuum_garbage(spark, tmp_root):
    root = os.path.join(tmp_root, "gc")
    t = ManifestTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=2)
    t.merge(_changes(spark, 1, ["a"], 0), 0)
    b = t.create_branch("scratch")
    b.merge(_changes(spark, 2, ["b"], 10), 1, mode="delta")

    # while the branch is live, vacuum must NOT touch its staged files
    t.vacuum(keep_versions=1, grace_s=0.0)
    assert len(_texts(b.read())) == 4

    # after the drop they are ordinary unreferenced garbage
    n_dirs_before = len(t.storage.list_dirs("data"))
    t.drop_branch("scratch")
    removed = t.vacuum(keep_versions=1, grace_s=0.0)
    assert len(removed) >= 1
    assert len(t.storage.list_dirs("data")) < n_dirs_before
    assert len(_texts(t.read())) == 2  # main unharmed


def test_branch_schema_evolution_publishes(spark, tmp_root):
    root = os.path.join(tmp_root, "ev")
    t = ManifestTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=2)
    t.merge(_changes(spark, 1, ["a"], 0), 0)
    b = t.create_branch("newcol")
    batch = _changes(spark, 2, ["b"], 10).withColumn("model", F.lit("m-1"))
    b.merge(batch, 1, mode="delta")
    assert "model" in [f.name for f in b.schema().fields]
    assert "model" not in [f.name for f in t.schema().fields]
    t.fast_forward("newcol")
    assert "model" in [f.name for f in t.schema().fields]
    got = {r["conv_id"]: r["model"] for r in t.read().select("conv_id", "model").distinct().collect()}
    assert got == {"a": None, "b": "m-1"}


def test_branch_misuse_surface(spark, tmp_root):
    root = os.path.join(tmp_root, "mu")
    t = ManifestTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=2)
    t.merge(_changes(spark, 1, ["a"], 0), 0)
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("../escape")
    with pytest.raises(FileNotFoundError):
        t.branch_ref("nope")
    with pytest.raises(FileNotFoundError):
        t.fast_forward("nope")
    b = t.create_branch("once")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("once")
    # re-attach by name sees the same chain
    b2 = t.branch_ref("once")
    assert b2.current_version() == b.current_version()
    # maintenance and ref verbs are main-handle-only
    for call in (
        lambda: b.create_branch("nested"),
        lambda: b.fast_forward("once"),
        lambda: b.drop_branch("once"),
        lambda: b.tag("x"),
        lambda: b.untag("x"),
        lambda: b.vacuum(grace_s=0.0),
        lambda: b.expire_snapshots(),
    ):
        with pytest.raises(ValueError, match="main-table operation"):
            call()
    # publishing a branch with no commits is a no-op, not an error
    assert t.fast_forward("once")["status"] == "NoChange"
    t.drop_branch("once")


def test_engine_wap_tail_stages_on_branch_then_publishes(spark, tmp_root):
    """Streaming write-audit-publish: a CDCEngine(branch=...) tail stages
    every epoch on the branch while main stays empty; after fast_forward
    the main table equals a direct (branchless) replay of the same WAL."""
    import os as _os

    from event_driven_etl_msc_research_spark.datagen import (
        ChangeStreamSpec,
        generate_change_stream,
    )
    from event_driven_etl_msc_research_spark.schemas import (
        CHANGE_EVENT_SCHEMA_EVOLVED,
    )
    from event_driven_etl_msc_research_spark.streaming.engine import CDCEngine

    spec = ChangeStreamSpec(n_events=4_000, n_convs=80, segment_size=1_000, seed=5)
    log = _os.path.join(tmp_root, "log")
    generate_change_stream(log, spec)

    eng = CDCEngine(
        spark,
        _os.path.join(tmp_root, "wap_t"),
        change_schema=CHANGE_EVENT_SCHEMA_EVOLVED,
        n_buckets=4,
        merge_mode="delta",
        branch="staged",
    )
    eng.replay(log, _os.path.join(tmp_root, "wap_cp"), max_files_per_trigger=2)

    main = ManifestTable(spark, _os.path.join(tmp_root, "wap_t"))
    assert main.read().count() == 0  # main untouched until publish
    staged_rows = eng.read_table().count()
    assert staged_rows > 0
    assert main.fast_forward("staged")["status"] == "Success"
    assert main.drop_branch("staged") is True
    assert main.read().count() == staged_rows

    # equals the branchless replay of the same WAL
    direct = CDCEngine(
        spark,
        _os.path.join(tmp_root, "direct_t"),
        change_schema=CHANGE_EVENT_SCHEMA_EVOLVED,
        n_buckets=4,
        merge_mode="delta",
    )
    direct.replay(log, _os.path.join(tmp_root, "direct_cp"), max_files_per_trigger=2)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    got = sorted(map(tuple, main.read().select(*cols).collect()))
    exp = sorted(map(tuple, direct.read_table().select(*cols).collect()))
    assert got == exp
