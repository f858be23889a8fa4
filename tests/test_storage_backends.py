"""TableStorage contract + end-to-end engine replay over the object backend.

The parameterized manifest/concurrency suites prove the commit protocol on
both backends; this file pins the storage contract itself (conditional PUT,
listing metadata, prefix deletes) and proves the full streaming path —
replay → merge → compact → vacuum — runs when every metadata operation goes
through object-store verbs (no rename, no link, no mtime walk).
"""

from __future__ import annotations

import os

import pytest

from event_driven_etl_msc_research_spark.sinks.storage import (
    FakeObjectStorage,
    LocalFSStorage,
)


@pytest.fixture(params=[LocalFSStorage, FakeObjectStorage])
def store(request, tmp_root):
    st = request.param(os.path.join(tmp_root, "store"))
    st.ensure_root()
    return st


def test_put_if_absent_is_conditional(store):
    assert store.put_if_absent("_manifest/v1.json", b"one")
    assert not store.put_if_absent("_manifest/v1.json", b"two")
    assert store.get("_manifest/v1.json") == b"one"


def test_list_returns_metadata_and_sorted_keys(store):
    store.put_if_absent("data/d1/a.parquet", b"xx")
    store.put_if_absent("data/d1/b.parquet", b"yyyy")
    store.put_if_absent("data/d2/c.parquet", b"z")
    objs = store.list("data")
    assert [o.key for o in objs] == [
        "data/d1/a.parquet", "data/d1/b.parquet", "data/d2/c.parquet"
    ]
    assert {o.key: o.size for o in objs}["data/d1/b.parquet"] == 4
    assert all(o.last_modified > 0 for o in objs)
    assert store.list_dirs("data") == ["d1", "d2"]


def test_delete_prefix_scopes_to_prefix(store):
    store.put_if_absent("data/d1/a", b"1")
    store.put_if_absent("data/d10/b", b"2")  # shares the string prefix "d1"
    store.delete_prefix("data/d1")
    assert [o.key for o in store.list("data")] == ["data/d10/b"]
    # key is PUT-able again after delete
    assert store.put_if_absent("data/d1/a", b"3")


def test_get_missing_raises(store):
    with pytest.raises(FileNotFoundError):
        store.get("_manifest/nope.json")


def test_fake_store_shares_registry_per_root(tmp_root):
    root = os.path.join(tmp_root, "shared")
    a = FakeObjectStorage(root)
    b = FakeObjectStorage(root)  # second client handle, same bucket
    a.ensure_root()
    assert a.put_if_absent("_manifest/v7.json", b"winner")
    assert not b.put_if_absent("_manifest/v7.json", b"loser")
    assert b.get("_manifest/v7.json") == b"winner"


def test_engine_replay_on_object_backend(spark, tmp_root):
    """Full CDC replay with every table-metadata operation going through the
    fake object store: final state must match a replay of the same WAL on
    the POSIX backend, and compaction + vacuum must work."""
    from event_driven_etl_msc_research_spark.datagen import (
        ChangeStreamSpec,
        generate_change_stream,
    )
    from event_driven_etl_msc_research_spark.streaming.engine import CDCEngine

    wal = os.path.join(tmp_root, "wal")
    generate_change_stream(wal, ChangeStreamSpec(n_events=3000, seed=23))

    eng_obj = CDCEngine(
        spark,
        os.path.join(tmp_root, "t_obj"),
        n_buckets=4,
        merge_mode="delta",
        compact_every=2,
        vacuum_grace_s=0,
        storage=FakeObjectStorage(os.path.join(tmp_root, "t_obj")),
    )
    eng_obj.replay(wal, os.path.join(tmp_root, "cp_obj"), max_files_per_trigger=2)

    eng_fs = CDCEngine(
        spark, os.path.join(tmp_root, "t_fs"), n_buckets=4, merge_mode="delta",
        compact_every=2, vacuum_grace_s=0,
    )
    eng_fs.replay(wal, os.path.join(tmp_root, "cp_fs"), max_files_per_trigger=2)

    got = eng_obj.read_table().orderBy("conv_id", "turn_idx").collect()
    exp = eng_fs.read_table().orderBy("conv_id", "turn_idx").collect()
    assert got == exp and len(got) > 0

    # maintenance on the object backend
    t = eng_obj.table
    t.compact()
    assert (t.manifest().get("delta_files") or {}) == {}
    assert t.read().orderBy("conv_id", "turn_idx").collect() == exp
    t.vacuum(keep_versions=1, grace_s=0)
    assert t.read().orderBy("conv_id", "turn_idx").collect() == exp

    # idempotent re-replay: version unchanged
    v = t.current_version()
    eng_obj.replay(wal, os.path.join(tmp_root, "cp_obj"), max_files_per_trigger=2)
    assert t.current_version() == v
