"""Streaming window/watermark/stateful-dedup operators (SURVEY.md §2.9 —
capabilities the reference lacks entirely; its duplicate/late handling is
're-run duplicates rows', Phase3-Transformation.py:123)."""

from __future__ import annotations

import os

from event_driven_etl_msc_research_spark.streaming.windows import (
    dedup_stream_within_watermark,
    streaming_hourly_rollup,
    watermarked_rollup_stream,
    windowed_rollup,
)


def test_streaming_rollup_equals_batch(spark):
    sf = "/root/testdata/sf0.001"
    got = streaming_hourly_rollup(spark, sf).orderBy("hour", "event_type").toPandas()
    exp = (
        windowed_rollup(spark.read.parquet(f"{sf}/events.parquet"))
        .orderBy("hour", "event_type")
        .toPandas()
    )
    assert got.equals(exp)
    assert len(got) > 0


def _write_seg(path, rows):
    import json

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


EV_SCHEMA = (
    "ts timestamp, event_type string, value double, conv_id string, "
    "turn_idx int, lsn long"
)


def test_watermark_drops_late_event(spark, tmp_root):
    """Append mode + watermark: an event arriving later than the watermark
    delay behind max event-time must NOT appear in its (closed) window."""
    log = os.path.join(tmp_root, "wlog")
    # batch 1: events at 10:00-10:09 and one at 12:00 (advances watermark to
    # 11:30 with a 30-min delay → every 10-min window before 11:30 closes)
    _write_seg(
        os.path.join(log, "seg-0.jsonl"),
        [
            {"ts": "2024-01-01 10:00:01", "event_type": "a", "value": 1.0,
             "conv_id": "c", "turn_idx": 0, "lsn": 1},
            {"ts": "2024-01-01 10:00:02", "event_type": "a", "value": 1.0,
             "conv_id": "c", "turn_idx": 1, "lsn": 2},
            {"ts": "2024-01-01 12:00:00", "event_type": "b", "value": 1.0,
             "conv_id": "c", "turn_idx": 2, "lsn": 3},
        ],
    )
    out = os.path.join(tmp_root, "wm_out")

    def run_once():
        q = (
            watermarked_rollup_stream(
                spark.readStream.schema(EV_SCHEMA).json(log),
                delay="30 minutes",
                window="10 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp_root, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    # batch 2 (checkpoint carries the watermark): a LATE event for the
    # already-closed 10:00 window
    _write_seg(
        os.path.join(log, "seg-1.jsonl"),
        [
            {"ts": "2024-01-01 10:00:03", "event_type": "a", "value": 1.0,
             "conv_id": "c", "turn_idx": 3, "lsn": 4},
        ],
    )
    run_once()
    rows = {
        (str(r["win_start"]), r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window emitted with n=2 in run 1 and the late event (lsn 4)
    # was dropped — it never re-emits or bumps the count
    assert rows.get(("2024-01-01 10:00:00", "a")) == 2


def test_stream_dedup_within_watermark(spark, tmp_root):
    log = os.path.join(tmp_root, "dlog")
    rows = [
        {"ts": "2024-01-01 10:00:01", "event_type": "a", "value": 1.0,
         "conv_id": "c", "turn_idx": 0, "lsn": 1},
        {"ts": "2024-01-01 10:00:01", "event_type": "a", "value": 1.0,
         "conv_id": "c", "turn_idx": 0, "lsn": 1},  # exact duplicate
        {"ts": "2024-01-01 10:00:02", "event_type": "a", "value": 1.0,
         "conv_id": "c", "turn_idx": 0, "lsn": 2},  # new version: kept
    ]
    _write_seg(os.path.join(log, "seg-0.jsonl"), rows)
    stream = spark.readStream.schema(EV_SCHEMA).json(log)
    out = dedup_stream_within_watermark(stream, ["conv_id", "turn_idx", "lsn"])
    q = (
        out.writeStream.format("memory")
        .queryName("dd_stream")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "dcp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("dd_stream").collect()
    assert len(got) == 2  # duplicate collapsed, distinct lsn kept
