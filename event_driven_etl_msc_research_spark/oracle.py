"""In-memory oracle: fold the change stream in ``(ts, lsn)`` order per key.

This is the trivial single-threaded ground truth the distributed replay must
reproduce (SURVEY.md §5.2) — the analogue of the reference's manual
inspection of S3/DynamoDB outputs (its only correctness check,
``README.md:30-34``), made executable.
"""

from __future__ import annotations

import pandas as pd

from .datagen import ChangeStreamSpec, events_as_records


def oracle_final_state(spec: ChangeStreamSpec) -> pd.DataFrame:
    """Final transcripts table after applying every change in log order.

    Semantics: per ``(conv_id, turn_idx)`` the change with max ``(ts, lsn)``
    determines the row; if that change is a delete the key is absent.
    Returned sorted by ``(conv_id, turn_idx)`` — the verification ordering
    per BASELINE.json ``input_hint``.
    """
    state: dict[tuple[str, int], dict] = {}
    # events_as_records returns true log order == (ts, lsn) ascending
    for ev in events_as_records(spec):
        key = (ev["conv_id"], ev["turn_idx"])
        if ev["op"] == "D":
            state[key] = None  # tombstone: key absent from final table
        else:
            state[key] = {
                "conv_id": ev["conv_id"],
                "turn_idx": ev["turn_idx"],
                "role": ev["role"],
                "text": ev["text"],
                "tool": ev["tool"],
                "ts": pd.Timestamp(ev["ts"], unit="s", tz="UTC"),
                "tool_meta": ev.get("tool_meta"),
            }
    rows = [v for _, v in sorted(state.items()) if v is not None]
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_meta"]
    df = pd.DataFrame(rows, columns=cols)
    return df.reset_index(drop=True)
