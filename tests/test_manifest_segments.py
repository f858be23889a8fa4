"""Content-addressed segmented manifests: the metadata plane's last
O(table) recurring cost removed.

An inline manifest re-serializes the FULL per-bucket file listing + stats
on every commit — O(live files) bytes uploaded per publish and downloaded
per head read.  Above a threshold the heavy payloads split into
content-addressed segment objects grouped by bucket (Iceberg's
manifest-reuse design): a commit re-uploads only the segments whose
content changed, successive snapshots share unchanged segments on disk,
and expire_snapshots ref-count-GCs the pool.  These tests pin:

* logical equivalence — segmented and inline tables converge to identical
  state under the same DML, and the spliced view callers see is identical;
* the reuse guarantee — a merge touching one bucket re-uploads exactly the
  one segment covering it, the rest are shared by key with the parent;
* the stored-manifest size bound — the published object stays small and
  roughly constant while the table's file count grows;
* GC — segments die only when no surviving snapshot (main or branch, or a
  tag pin) references them, with a grace window protecting a concurrent
  publish's just-written segments;
* compatibility — a chain can flip segmentation on/off mid-life and every
  version stays readable (an inline manifest is its own splice).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import (
    _SEG_DIR,
    ManifestTable,
)

SEG_ON = {
    "write.manifest.segment-min-files": "0",
    "write.manifest.segments": "4",
}


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


def _batch(spark, convs, lsn0=1, text="t"):
    rows = [
        ("U", lsn0 + i, 1_700_000_000 + lsn0 + i, c, k, "user",
         f"{text}-{c}-{k}", None)
        for i, (c, k) in enumerate(
            (c, k) for c in convs for k in range(3)
        )
    ]
    # reorder to the helper's column order
    rows = [
        (op, lsn, ts, c, k, role, txt, tool)
        for (op, lsn, ts, c, k, role, txt, tool) in rows
    ]
    return _changes_df(spark, rows)


def _state(table, version=None):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read(version=version).collect()
    }


def _raw(table, version=None):
    v = table.current_version() if version is None else version
    return table._get_manifest(table._manifest_key(v), splice=False)


def _refs(raw):
    from event_driven_etl_msc_research_spark.sinks.manifest import (
        _segment_refs,
    )

    return set(_segment_refs(raw))


def _pool(table):
    return sorted(o.key for o in table.storage.list(_SEG_DIR))


@pytest.fixture()
def seg_table(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "seg")
    return ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=8,
        storage=storage_factory(root), properties=SEG_ON,
    )


CONVS = [f"conv{i:03d}" for i in range(24)]


def test_small_tables_stay_inline_by_default(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "inline")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=8,
        storage=storage_factory(root),
    )
    t.merge(_batch(spark, CONVS[:6]), epoch_id=1, mode="delta")
    raw = _raw(t)
    assert "segments" not in raw
    assert _pool(t) == []
    assert sum(len(ps) for ps in raw["delta_files"].values()) > 0


def test_segmented_state_equals_inline_state(spark, tmp_root, storage_factory):
    roots = {
        name: os.path.join(tmp_root, name) for name in ("segd", "plain")
    }
    tables = {
        "segd": ManifestTable.create(
            spark, roots["segd"], TRANSCRIPT_SCHEMA, n_buckets=8,
            storage=storage_factory(roots["segd"]), properties=SEG_ON,
        ),
        "plain": ManifestTable.create(
            spark, roots["plain"], TRANSCRIPT_SCHEMA, n_buckets=8,
            storage=storage_factory(roots["plain"]),
        ),
    }
    for t in tables.values():
        t.merge(_batch(spark, CONVS, lsn0=1), epoch_id=1, mode="delta")
        t.merge(
            _batch(spark, CONVS[:4], lsn0=1000, text="upd"),
            epoch_id=2, mode="delta",
        )
        t.delete_where("conv_id = 'conv001'", epoch_id=3)
        t.compact(min_delta_files=0)
        t.merge(_batch(spark, ["convX"], lsn0=2000), epoch_id=4, mode="cow")
    assert _state(tables["segd"]) == _state(tables["plain"])
    # every version of the segmented chain reads (time travel through
    # segmented manifests), and the spliced dict never leaks "segments"
    segd = tables["segd"]
    for v in range(segd.current_version() + 1):
        m = segd.manifest(v)
        assert "segments" not in m
        segd.read(version=v).count()
    assert "segments" in _raw(segd)
    # pruned point-lookup still works off spliced stats
    one = segd.read(where={"conv_id": ("conv002", "conv002")})
    assert one.count() == 3


def test_point_merge_reuses_unchanged_segments(spark, seg_table):
    t = seg_table
    t.merge(_batch(spark, CONVS), epoch_id=1, mode="delta")
    before = _raw(t)
    pool_before = _pool(t)
    # one conv = one bucket touched = at most ONE of the 4 segments moves
    t.merge(
        _batch(spark, [CONVS[0]], lsn0=5000, text="v2"),
        epoch_id=2, mode="delta",
    )
    after = _raw(t)
    shared = _refs(before) & _refs(after)
    assert len(shared) >= len(_refs(after)) - 1
    # the content-addressed pool grew by only the changed segment(s)
    assert len(_pool(t)) <= len(pool_before) + 1
    # a metadata-only commit changes NO files → every segment is reused
    t.set_properties({"free.form": "x"})
    assert _refs(_raw(t)) == _refs(after)


def test_stored_manifest_stays_small_as_files_grow(
    spark, tmp_root, storage_factory
):
    root = os.path.join(tmp_root, "sz")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=8,
        storage=storage_factory(root), properties=SEG_ON,
    )
    sizes = []
    for e in range(1, 5):
        t.merge(
            _batch(spark, CONVS, lsn0=e * 10_000, text=f"e{e}"),
            epoch_id=e, mode="delta",
        )
        key = t._manifest_key(t.current_version())
        sizes.append(
            next(o.size for o in t.storage.list(key.rsplit("/", 1)[0])
                 if o.key == key)
        )
    inline_bytes = len(ManifestTable._encode_manifest(t.manifest()))
    # the published object is a list of segment refs + bookkeeping: far
    # smaller than the inline listing, and ~flat while files accumulate
    assert sizes[-1] < inline_bytes / 2
    assert sizes[-1] < sizes[0] * 3


def test_expire_gc_respects_refs_tags_and_grace(spark, seg_table):
    t = seg_table
    t.merge(_batch(spark, CONVS), epoch_id=1, mode="delta")
    t.tag("keep", version=t.current_version())
    for e in range(2, 6):
        t.merge(
            _batch(spark, CONVS[: e * 3], lsn0=e * 10_000, text=f"e{e}"),
            epoch_id=e, mode="delta",
        )
    tagged_refs = _refs(_raw(t, 1))
    head_refs = _refs(_raw(t))
    pool = set(_pool(t))
    assert tagged_refs <= pool and head_refs <= pool
    # plant an orphan (a lost-race publish's leftover segment)
    t.storage.put_if_absent(f"{_SEG_DIR}/deadbeef.json", b"{}")
    # grace shields everything young — nothing may vanish
    t.expire_snapshots(keep_last=1, segment_grace_s=3600)
    assert f"{_SEG_DIR}/deadbeef.json" in _pool(t)
    # grace 0: orphans + expired-only segments die; tagged + head survive
    t.expire_snapshots(keep_last=1, segment_grace_s=0)
    left = set(_pool(t))
    assert f"{_SEG_DIR}/deadbeef.json" not in left
    assert tagged_refs <= left  # the tag pins v1's segments
    assert head_refs <= left
    assert _state(t, version=1) == _state(t, version=1)  # still readable
    # drop the tag: its exclusive segments become collectible
    t.untag("keep")
    t.expire_snapshots(keep_last=1, segment_grace_s=0)
    assert set(_pool(t)) == _refs(_raw(t))
    assert len(_state(t)) > 0


def test_branch_seed_is_zero_copy_and_gc_safe(spark, seg_table):
    t = seg_table
    t.merge(_batch(spark, CONVS), epoch_id=1, mode="delta")
    pool_before = _pool(t)
    b = t.create_branch("audit")
    # the branch seed references the fork base's segments — no new objects
    assert _pool(t) == pool_before
    assert _state(b) == _state(t)
    b.merge(_batch(spark, ["convB"], lsn0=9000), epoch_id=2, mode="delta")
    branch_refs = _refs(_raw(b))
    # GC from main must see the branch chain's refs
    t.expire_snapshots(keep_last=1, segment_grace_s=0)
    assert branch_refs <= set(_pool(t))
    assert ("convB", 1) in _state(b)
    t.drop_branch("audit")
    t.expire_snapshots(keep_last=1, segment_grace_s=0)
    assert set(_pool(t)) == _refs(_raw(t))


def test_segmentation_can_flip_mid_chain(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "flip")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=8,
        storage=storage_factory(root),
    )
    t.merge(_batch(spark, CONVS), epoch_id=1, mode="delta")
    assert "segments" not in _raw(t)
    t.set_properties(SEG_ON)  # the property commit itself segments
    assert "segments" in _raw(t)
    t.merge(_batch(spark, CONVS[:2], lsn0=7000), epoch_id=2, mode="delta")
    assert "segments" in _raw(t)
    t.set_properties({k: None for k in SEG_ON})  # back to inline
    assert "segments" not in _raw(t)
    # every historical version — inline, segmented, inline — reads fine
    states = [_state(t, version=v) for v in range(t.current_version() + 1)]
    assert states[-1] == states[-2]
    assert len(states[0]) == 0


def test_racing_writers_rebase_cleanly_under_segments(
    spark, tmp_root, storage_factory
):
    """Two writers, one segmented table: A stages, B wins the version
    race, A rebases and re-externalizes against B's head.  Both epochs
    land, the spliced state is exact, and the loser's pre-rebase segment
    orphans (if any) are GC'd by the next expire while live refs
    survive — put_if_absent makes same-content segment writes from both
    writers benign by construction."""
    root = os.path.join(tmp_root, "race")
    a = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=8,
        storage=storage_factory(root), properties=SEG_ON,
    )
    b = ManifestTable(spark, root, storage=storage_factory(root))
    a.merge(_batch(spark, CONVS), epoch_id=0, mode="delta")

    fired = {"done": False}

    def interleave(_m):
        if not fired["done"]:
            fired["done"] = True
            b.merge(
                _batch(spark, ["convB"], lsn0=9000), epoch_id=2, mode="delta"
            )

    r = a.merge(
        _batch(spark, ["convA"], lsn0=8000),
        epoch_id=1,
        mode="delta",
        before_publish=interleave,
    )
    assert r["status"] == "Success"
    m = a.manifest()
    assert m["version"] == 3  # seed + B + rebased A, no collision
    st = _state(a)
    assert ("convA", 1) in st and ("convB", 1) in st
    assert len(st) == len(CONVS) * 3 + 6
    # pool converges to exactly the surviving refs after expiry
    a.expire_snapshots(keep_last=1, segment_grace_s=0)
    assert set(_pool(a)) == _refs(_raw(a))
    assert _state(a) == st


class _GetCounter:
    """Storage wrapper metering GETs by key prefix."""

    def __init__(self, inner):
        self.inner = inner
        self.got = []

    def get(self, key):
        self.got.append(key)
        return self.inner.get(key)

    def __getattr__(self, name):
        return getattr(self.inner, name)


def test_point_lookup_splices_one_segment(
    spark, tmp_root, storage_factory
):
    root = os.path.join(tmp_root, "pt")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=8,
        storage=storage_factory(root), properties=SEG_ON,
    )
    t.merge(_batch(spark, CONVS), epoch_id=1, mode="delta")
    expect = {
        r["turn_idx"]: r["text"]
        for r in t.read().filter("conv_id = 'conv003'").collect()
    }
    assert len(expect) == 3
    n_segments = len(_refs(_raw(t)))
    assert n_segments >= 2
    # a FRESH handle (cold segment cache) point-reads: the metadata path
    # must GET the manifest + exactly ONE segment object, not all of them
    counter = _GetCounter(storage_factory(root))
    cold = ManifestTable(spark, root, storage=counter)
    got = {
        r["turn_idx"]: r["text"]
        for r in cold.read(
            where={"conv_id": ("conv003", "conv003")}
        ).collect()
    }
    assert got == expect
    seg_gets = [k for k in counter.got if k.startswith(_SEG_DIR)]
    assert len(seg_gets) <= 1, seg_gets
    # is_null pins the seed bucket the same way
    counter.got.clear()
    assert cold.read(where={"conv_id": "is_null"}).count() == 0
    assert len(
        [k for k in counter.got if k.startswith(_SEG_DIR)]
    ) <= 1
    # a non-pinned bounded read takes the full splice and stays exact
    counter.got.clear()
    n_all = cold.read(where={"turn_idx": (1, 2)}).count()
    assert n_all == len(CONVS) * 2


def test_rollback_and_changes_fast_path_under_segments(spark, seg_table):
    t = seg_table
    t.merge(_batch(spark, CONVS), epoch_id=1, mode="delta")
    t.merge(
        _batch(spark, CONVS[:3], lsn0=8000, text="new"),
        epoch_id=2, mode="delta",
    )
    v1_state = _state(t, version=1)
    # change feed over segmented manifests (the chain walk reads spliced)
    ch = t.changes(1, 2)
    assert ch.count() > 0
    assert t.rollback_to(version=1)["status"] == "Success"
    assert _state(t) == v1_state
