"""Streaming windowed aggregation + watermark/late-data operators.

The reference is batch-only — no watermarks, windows, or stateful operators
exist anywhere in it (SURVEY.md §2.9); its nearest analogue is the per-stage
metrics aggregation over completed executions (``CloudsMatricsByQ2.py:45-73``).
These operators give the engine the streaming-native counterparts:

* ``streaming_windowed_rollup`` — ``readStream`` → event-time tumbling
  window aggregate → in-memory sink, drained with ``Trigger.AvailableNow``;
* ``watermarked_rollup_stream``  — the same aggregate with a watermark in
  append mode: a window emits only once the watermark passes its end, and
  events arriving later than ``delay`` behind max event-time are dropped
  (verified in tests/test_streaming_windows.py);
* ``dedup_stream_within_watermark`` — Spark's stateful streaming dedup
  (``dropDuplicatesWithinWatermark``) keyed on (conv_id, turn_idx, lsn):
  the streaming-native alternative to the MERGE path's within-batch dedup
  for exactly-once *event* delivery (state bounded by the watermark).

At 100 TB scale the windowed aggregate shuffles once per (window, key) with
map-side partial combine — identical shape to the batch rollup — and state
size is bounded by (watermark delay × event rate), not by history.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_rollup(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregate (works on batch or stream)."""
    return (
        events.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: the hourly rollup computed through the REAL
    streaming path — ``readStream`` over the events parquet, tumbling
    event-time windows, complete-mode in-memory sink, ``AvailableNow``
    drain — then returned as a batch DataFrame.  Semantically identical to
    the batch ``events_hourly_rollup`` (shared DuckDB oracle)."""
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    name = f"shr_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .load(sf_dir)
    )
    q = (
        windowed_rollup(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.table(name)


def streaming_session_rollup(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Per-user session counts through the REAL streaming path using Spark's
    native ``session_window`` (gap-merged event-time windows — state merges
    adjacent sessions as events arrive, unlike fixed tumbling windows):
    ``readStream`` → session_window aggregate → complete-mode memory sink →
    AvailableNow drain.

    Semantics: a new session starts when the gap to the previous event is
    ≥ the session gap (session windows are half-open ``[ts, ts+gap)``) —
    the DuckDB oracle mirrors exactly that with a lag() >= rule.
    """
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    name = f"ssr_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    per_session = (
        stream.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n"))
    )
    q = (
        per_session.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n").cast("long").alias("n_events"),
        )
    )


def watermarked_rollup_stream(
    events_stream: DataFrame, delay: str = "30 minutes", window: str = "10 minutes"
) -> DataFrame:
    """Append-mode windowed aggregate with a watermark: emits a window only
    when the watermark (max event-time − ``delay``) passes the window end;
    later-than-watermark events are dropped.  Caller attaches the sink."""
    return (
        events_stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
        )
    )


def dedup_stream_within_watermark(
    changes_stream: DataFrame,
    key_cols: list[str] | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """Stateful streaming dedup of redelivered change events.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes — the streaming-native guard against duplicate segment
    redelivery (the engine's manifest idempotence covers the epoch level;
    this covers event level when tailing at-least-once transports)."""
    keys = key_cols or ["conv_id", "turn_idx", "lsn"]
    return changes_stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)
