"""As-of join operator (operators/asof.py) — edge semantics pinned here;
full-scale parity vs DuckDB's native ASOF JOIN runs in the driver contract
(events_asof_last_error)."""

from __future__ import annotations

import pandas as pd
import pytest

from event_driven_etl_msc_research_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b"],
                "ts": [5, 10, 20, 7],
                "ev": ["l1", "l2", "l3", "l4"],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "ts": [10, 15, 99],
                "price": [1.0, 2.0, 9.9],
            }
        )
    )
    got = {
        r["ev"]: (r["ts_asof"], r["price_asof"])
        for r in asof_join_backward(left, right, ["k"]).collect()
    }
    assert got["l1"] == (None, None)      # before any right row
    assert got["l2"] == (10, 1.0)         # tie at ts=10 is inclusive
    assert got["l3"] == (15, 2.0)         # latest at-or-before 20
    assert got["l4"] == (None, None)      # right row for b is in the future


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b"],
                "ts": [5, 10, 20, 7],
                "ev": ["l1", "l2", "l3", "l4"],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "ts": [10, 15, 2],
                "price": [1.0, 2.0, 9.9],
            }
        )
    )
    got = {
        r["ev"]: (r["ts_asof"], r["price_asof"])
        for r in asof_join_forward(left, right, ["k"]).collect()
    }
    assert got["l1"] == (10, 1.0)       # earliest right at-or-after 5
    assert got["l2"] == (10, 1.0)       # tie at ts=10 is inclusive
    assert got["l3"] == (None, None)    # no right row after 20
    assert got["l4"] == (None, None)    # right row for b is in the past


def test_asof_no_torn_rows_with_null_payload(spark):
    """A matched right row with a NULL payload column must NOT inherit that
    column from an OLDER right row: the whole right row is carried as one
    struct (regression for per-column last(ignorenulls) tearing)."""
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": [20], "ev": ["l1"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "ts": [10, 15],
                "price": [1.0, None],   # newest matched row has null price
                "qty": [7, 8],
            }
        )
    )
    row = asof_join_backward(left, right, ["k"]).collect()[0]
    assert row["ts_asof"] == 15
    assert row["qty_asof"] == 8
    assert row["price_asof"] is None  # NOT 1.0 from the older row


def test_asof_right_ts_tie_deterministic(spark):
    """Two right rows at the same (key, ts): the greatest payload tuple wins,
    deterministically, run after run."""
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": [10], "ev": ["l1"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "ts": [10, 10], "seq": [1, 2], "p": [5.0, 6.0]})
    )
    for _ in range(3):
        row = asof_join_backward(left, right, ["k"]).collect()[0]
        assert (row["seq_asof"], row["p_asof"]) == (2, 6.0)


def test_asof_plan_single_shuffle_window(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": ["a"], "ts": [1], "ev": ["x"]}))
    right = spark.createDataFrame(pd.DataFrame({"k": ["a"], "ts": [1], "p": [1.0]}))
    plan = (
        asof_join_backward(left, right, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # composition is union + ONE keyed window — no join node, no cross product
    assert "Join" not in plan
    assert plan.count("Window") == 1


def _random_frames(seed: int):
    import numpy as np

    rng = np.random.RandomState(seed)
    keys = [f"k{i}" for i in range(8)]
    left = pd.DataFrame(
        {
            "k": rng.choice(keys, 400),
            "ts": rng.randint(0, 10_000, 400).astype("int64"),
            "lid": np.arange(400, dtype="int64"),
        }
    )
    rights = []
    for k in keys:
        ts = rng.choice(np.arange(10_000), size=60, replace=False).astype("int64")
        rights.append(pd.DataFrame({"k": k, "ts": ts, "price": rng.randn(60).round(6)}))
    right = pd.concat(rights, ignore_index=True)
    return left, right


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_property_vs_pandas(spark, seed, direction):
    left, right = _random_frames(seed)
    fn = asof_join_backward if direction == "backward" else asof_join_forward
    got = (
        fn(spark.createDataFrame(left), spark.createDataFrame(right), ["k"])
        .orderBy("lid")
        .toPandas()
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction=direction,
        allow_exact_matches=True,
    ).sort_values("lid")
    assert list(got["lid"]) == list(exp["lid"])
    import numpy as np

    assert np.allclose(
        got["price_asof"].to_numpy(dtype=float),
        exp["price"].to_numpy(dtype=float),
        equal_nan=True,
    )
