"""Property-based check (hypothesis): for ANY change sequence, the engine's
dedup (argmax production path AND maxstruct cross-check) equals the trivial
fold-in-(ts,lsn)-order oracle — including adversarial shapes hypothesis
finds (all-one-key, ties on ts, singleton frames)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from event_driven_etl_msc_research_spark.operators.dedup import (
    dedup_latest,
    dedup_latest_maxstruct,
)

# shared session fixture comes from conftest via the `spark` arg


@st.composite
def change_frames(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    keys = draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 2)),
            min_size=n, max_size=n,
        )
    )
    ts = draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "conv_id": [f"c{k}" for k, _ in keys],
            "turn_idx": [t for _, t in keys],
            "ts": pd.Series(ts, dtype="int64"),
            "lsn": pd.Series(range(n), dtype="int64"),  # unique, WAL-like
            "text": [f"v{i}" for i in range(n)],
        }
    )


def _oracle(pdf: pd.DataFrame) -> dict:
    out = {}
    for r in pdf.sort_values(["ts", "lsn"]).itertuples():
        out[(r.conv_id, r.turn_idx)] = r.text
    return out


@given(change_frames())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_matches_fold_oracle(spark, pdf):
    df = spark.createDataFrame(pdf)
    exp = _oracle(pdf)
    for impl in (dedup_latest, dedup_latest_maxstruct):
        got = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in impl(df, ["conv_id", "turn_idx"], ["ts", "lsn"]).collect()
        }
        assert got == exp, impl.__name__
