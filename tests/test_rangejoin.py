"""Range (point-in-interval) join: edge semantics + plan shape; full-scale
parity vs a DuckDB BETWEEN join runs in the driver contract
(events_range_join)."""

from __future__ import annotations

import pandas as pd

from event_driven_etl_msc_research_spark.operators.rangejoin import (
    range_join_points_to_intervals,
)


def _ts(s):
    return pd.Timestamp(s)


def test_range_join_semantics(spark):
    points = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b"],
                "ts": [_ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:10:00"),
                       _ts("2024-01-01 11:00:00"), _ts("2024-01-01 10:05:00")],
                "pid": [1, 2, 3, 4],
            }
        )
    )
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "b"],
                "start": [_ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00")],
                "end": [_ts("2024-01-01 10:10:00"), _ts("2024-01-01 10:40:00")],
                "iid": [100, 200],
            }
        )
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_points_to_intervals(
            points, intervals, ["k"], bucket_seconds=300
        ).collect()
    }
    # both boundaries inclusive; pid 3 outside; pid 4 wrong-key-time combo
    assert got == {(1, 100), (2, 100)}


def test_range_join_plan_no_nested_loop(spark):
    points = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": [_ts("2024-01-01")], "pid": [1]})
    )
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a"], "start": [_ts("2024-01-01")],
             "end": [_ts("2024-01-02")], "iid": [1]}
        )
    )
    plan = (
        range_join_points_to_intervals(points, intervals, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
