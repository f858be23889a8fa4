"""Long-tail soak: many small epochs through the delta tail with ALL
maintenance machinery live (compaction cadence, vacuum with eager grace,
lineage compaction, progress listener) — the file counts that would grow
without bound on a real 24/7 binlog tail must stay bounded, and the final
state must still equal the oracle."""

from __future__ import annotations

import os

from conftest import assert_pdf_equal

from event_driven_etl_msc_research_spark import CDCEngine
from event_driven_etl_msc_research_spark.datagen import (
    ChangeStreamSpec,
    generate_change_stream,
)
from event_driven_etl_msc_research_spark.oracle import oracle_final_state
from event_driven_etl_msc_research_spark.schemas import CHANGE_EVENT_SCHEMA_EVOLVED

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "tool_meta", "ts"]


def _count_files(root, sub):
    n = 0
    for dirpath, _dirs, files in os.walk(os.path.join(root, sub)):
        n += sum(1 for f in files if f.endswith((".parquet", ".json")))
    return n


def test_fifty_epoch_tail_stays_bounded(spark, tmp_root):
    spec = ChangeStreamSpec(
        n_events=10_000,
        n_convs=100,
        segment_size=200,  # 50 segments → 50 micro-batches of 1 file each
        seed=77,
        dup_segments=(),
    )
    wal = os.path.join(tmp_root, "wal")
    gen = generate_change_stream(wal, spec)
    assert len(gen.segment_paths) == 50

    tbl = os.path.join(tmp_root, "table")
    eng = CDCEngine(
        spark,
        tbl,
        change_schema=CHANGE_EVENT_SCHEMA_EVOLVED,
        n_buckets=8,
        merge_mode="delta",
        compact_every=10,
        vacuum_keep_versions=4,
        vacuum_grace_s=0,  # single-writer soak: eager GC
    )
    eng.replay(wal, os.path.join(tmp_root, "cp"), max_files_per_trigger=1,
               timeout_s=900)

    # 50 delta epochs + 5 compactions committed
    assert eng.table.current_version() >= 55
    m = eng.table.manifest()
    # delta backlog bounded by the compaction cadence (≤ compact_every
    # epochs of per-bucket delta files awaiting the next fold)
    n_delta = sum(len(ps) for ps in (m.get("delta_files") or {}).values())
    assert n_delta <= 10 * m["n_buckets"]
    # vacuum kept the data tree bounded: far fewer files than the ~55
    # versions × n_buckets a GC-less tail would accumulate
    assert _count_files(tbl, "data") < 200
    # lineage shards bounded by LineageLog.compact on the vacuum cadence
    assert _count_files(tbl, "_lineage") <= 24
    # per-epoch driver/commit cost stays FLAT over the tail (round-4
    # directive #5 done-criterion): the merge stage duration of the last
    # ten epochs must not grow past the first ten's — the signature of
    # O(accumulated-files) metadata work per epoch (sequential footer
    # scans, full-tree GC walks) is a monotonically growing epoch cost.
    # The bound is a RATIO (not wall-clock) so the overcommitted-VM noise
    # floor doesn't flake it, and JVM warmup makes early epochs the SLOW
    # side, which only tightens the check.
    merges = sorted(
        (r["epoch_id"], r["duration_s"])
        for r in eng.lineage.lineage()
        .filter("stage = 'merge' and status = 'Success'")
        .collect()
    )
    assert len(merges) >= 50
    first10 = sum(d for _, d in merges[:10]) / 10
    last10 = sum(d for _, d in merges[-10:]) / 10
    assert last10 <= 3.0 * first10, (first10, last10)

    # manifest stats stay consistent with a full read
    final = eng.read_table()
    got = final.orderBy("conv_id", "turn_idx").toPandas()
    assert_pdf_equal(got, oracle_final_state(spec), COLS)

    # one more compact folds the remaining deltas; state unchanged
    eng.table.compact()
    assert not eng.table.manifest().get("delta_files")
    got2 = eng.read_table().orderBy("conv_id", "turn_idx").toPandas()
    assert_pdf_equal(got2, oracle_final_state(spec), COLS)
