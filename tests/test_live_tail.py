"""Continuous tail mode: segments appended to the WAL WHILE the query runs
are picked up by subsequent micro-batches — the live binlog-tail behavior
(vs. the drain-and-stop AvailableNow replay covered elsewhere)."""

from __future__ import annotations

import os
import shutil
import time

from conftest import assert_pdf_equal

from event_driven_etl_msc_research_spark import CDCEngine
from event_driven_etl_msc_research_spark.datagen import (
    ChangeStreamSpec,
    generate_change_stream,
)
from event_driven_etl_msc_research_spark.oracle import oracle_final_state
from event_driven_etl_msc_research_spark.schemas import CHANGE_EVENT_SCHEMA_EVOLVED

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "tool_meta", "ts"]

SPEC = ChangeStreamSpec(
    n_events=4_000, n_convs=60, segment_size=500, seed=21, dup_segments=(1,)
)


def test_tail_picks_up_live_appends(spark, tmp_root):
    staging = os.path.join(tmp_root, "staging")
    live = os.path.join(tmp_root, "wal")
    gen = generate_change_stream(staging, SPEC)
    os.makedirs(live)
    # seed the WAL with the first half of the segments
    half = len(gen.segment_paths) // 2
    for p in gen.segment_paths[:half]:
        shutil.copy(p, live)

    eng = CDCEngine(
        spark, os.path.join(tmp_root, "table"),
        change_schema=CHANGE_EVENT_SCHEMA_EVOLVED, n_buckets=8,
    )
    q = eng.replay(
        live, os.path.join(tmp_root, "cp"),
        available_now=False, processing_time="1 seconds",
        max_files_per_trigger=4,
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline and not eng.table.current_version():
            time.sleep(0.3)
        assert eng.table.current_version() >= 1  # first half committed

        # append the rest WHILE the tail runs (atomic per-file publish, the
        # reference's raw-zone drop semantics)
        for p in gen.segment_paths[half:]:
            shutil.copy(p, live)
        target_rows = len(oracle_final_state(SPEC))
        while time.monotonic() < deadline:
            if eng.read_table().count() == target_rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
        eng.lineage.flush()

    got = eng.read_table().orderBy("conv_id", "turn_idx").toPandas()
    assert_pdf_equal(got, oracle_final_state(SPEC), COLS)
    # multiple epochs committed — the appends arrived in later micro-batches
    lin = eng.lineage.lineage().toPandas()
    assert (lin["stage"] == "merge").sum() >= 2
