"""Explicit schemas for the engine (never inferred).

The reference's ingest schema is implicit/positional — JSON arrays indexed at
transform time (``Phase3-Transformation.py:115-121``) — and its warehouse
schema is all-strings (``Phase3-DataLoad.py:104-112``).  The engine replaces
both with explicit, typed ``StructType``s per BASELINE.json ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- target table: multi-turn conversation transcripts (FIXTURES.md F1) ---
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Natural primary key.  Deliberate upgrade over the reference's
# ``Key = str(uuid.uuid4())`` per row (``Phase3-Transformation.py:123``):
# uuid-per-retry is exactly what makes the reference's re-runs duplicate rows;
# the natural key makes replay idempotent (SURVEY.md §7 hard parts).
KEY_COLS = ["conv_id", "turn_idx"]

# Version columns: event time first, log sequence number as tie-break.
VERSION_COLS = ["ts", "lsn"]

# --- change events: binlog/WAL records (FIXTURES.md F2) ---
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # I / U / D
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
    ]
)

# Evolved variant: ``tool_meta`` appears mid-stream (additive evolution test).
CHANGE_EVENT_SCHEMA_EVOLVED = T.StructType(
    CHANGE_EVENT_SCHEMA.fields
    + [T.StructField("tool_meta", T.StringType(), True)]
)

# Engine-internal columns stored in data files but hidden from user reads:
#   _lsn      — version tie-break of the applied change (target keeps it so a
#               late-arriving older change cannot overwrite a newer row)
#   _deleted  — tombstone flag (a delete must persist so a late older update
#               cannot resurrect the key)
#   _bucket   — hash bucket of conv_id; the physical partition / rewrite unit
INTERNAL_COLS = ["_lsn", "_deleted", "_bucket"]

# --- lineage / tracking schemas (FIXTURES.md F4) ---
# Replaces the reference's DynamoDB ETLDemoTrackingTable{tenant}
# (``Phase3-Data-Extraction.py:106-117,127-134``).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # Success / Failed / Skipped
        T.StructField("detail", T.StringType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("tenant_id", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Replaces SplitDataTracker{tenant} (``DataSplit.py:23-31,68-79``): one row per
# (epoch, partition/bucket) with record counts.
CHUNK_REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("tenant_id", T.StringType(), True),
        T.StructField("stage", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def payload_cols(change_schema: T.StructType) -> list[str]:
    """Columns of a change event that are table payload (not op/version/key)."""
    non_payload = {"op", "lsn"}
    return [f.name for f in change_schema.fields if f.name not in non_payload]
