"""Custom stateful streaming operator via Arrow-batched
``applyInPandasWithState`` (SURVEY.md §2.9; custom-operator policy step (b):
Pandas-UDF-backed grouped state where no built-in expresses the semantics).

``conversation_digest_stream`` maintains a per-conversation running digest
across micro-batches — events seen, max ``lsn`` applied, and the role/time
of the latest change — the streaming-native analogue of the reference's
per-correlation tracking rows (``Phase3-Data-Extraction.py:123-136``), but
as bounded keyed state inside the engine instead of a DynamoDB table per
tenant.

Scale notes: state lives in the state store keyed by ``conv_id`` (one small
fixed-width row per live conversation — 10^8 conversations ≈ a few GB across
executors); batches arrive Arrow-encoded (vectorized, no per-row Python
boxing); a hot conversation's events all land in one group per batch, which
is exactly the pandas aggregation below (C-speed), not a Python loop.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

DIGEST_SCHEMA = (
    "conv_id string, n_events long, max_lsn long, last_role string, "
    "last_ts timestamp"
)
_STATE_SCHEMA = "n_events long, max_lsn long, last_role string, last_ts timestamp"


def _update_digest(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
) -> Iterator[pd.DataFrame]:
    n, max_lsn, last_role, last_ts = (
        state.get if state.exists else (0, -1, None, None)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        i = pdf["lsn"].idxmax()
        if int(pdf["lsn"].loc[i]) > max_lsn:
            max_lsn = int(pdf["lsn"].loc[i])
            last_role = pdf["role"].loc[i]
            last_ts = pdf["ts"].loc[i]
    state.update((n, max_lsn, last_role, last_ts))
    yield pd.DataFrame(
        [
            {
                "conv_id": key[0],
                "n_events": n,
                "max_lsn": max_lsn,
                "last_role": last_role,
                "last_ts": last_ts,
            }
        ]
    )


def conversation_digest_stream(changes_stream: DataFrame) -> DataFrame:
    """Per-conversation running digest over a change stream; emits the
    updated digest row for every conversation touched in each micro-batch.
    Attach an update-mode sink."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        changes_stream.select("conv_id", "lsn", "role", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_digest,
            DIGEST_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def conversation_digest_batch(changes: DataFrame) -> DataFrame:
    """Batch oracle for the streaming digest (same result as draining the
    stream and keeping each conversation's last emission)."""
    from pyspark.sql import functions as F

    return changes.groupBy("conv_id").agg(
        F.count("*").alias("n_events"),
        F.max("lsn").alias("max_lsn"),
        F.max_by("role", "lsn").alias("last_role"),
        F.max_by("ts", "lsn").alias("last_ts"),
    )
