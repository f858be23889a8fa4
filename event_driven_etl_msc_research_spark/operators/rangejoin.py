"""Range (point-in-interval) join — the second time-series operator Spark
lacks a native physical strategy for (with ``asof.py``; custom-operator
policy step (a): composition of built-in ops).

A naive ``l JOIN r ON l.ts BETWEEN r.start AND r.end`` plans as
BroadcastNestedLoopJoin — O(|L|·|R|) and a driver OOM once the intervals
side outgrows broadcast.  The scalable composition: quantize time into
fixed buckets, explode each interval into the buckets it covers, equi-join
points to interval-buckets on (key, bucket), then apply the exact range
predicate.  Cost is O(|L| + Σ interval_len/bucket) shuffled through ONE
hash equi-join — the standard binned-interval-join used by ADAM/Sedona-style
genomics and spatio-temporal engines.

Bucket width trades explode factor against join selectivity: pick ~the
median interval length (each interval then explodes into ~2 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 600,
) -> DataFrame:
    """Inner-join each point row to every interval row of the same key with
    ``start <= ts <= end`` (inclusive), without a nested-loop join.

    Returns points columns + the interval's columns (callers pre-rename any
    collisions other than the key columns).
    """
    w = F.lit(bucket_seconds)
    p = points.withColumn(
        "_rb", (F.unix_timestamp(F.col(point_ts)) / w).cast("long")
    )
    i = intervals.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    joined = p.join(i, [*key_cols, "_rb"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    # a (point, interval) pair can match in exactly one bucket (the point's),
    # so no distinct pass is needed — drop the bucket column and return
    return joined.drop("_rb")
