"""As-of (point-in-time) join — a time-series operator Spark lacks natively.

The reference has no joins at all (SURVEY.md §2.4); the engine adds this as
a composition of built-in ops per the custom-operator policy (compose before
Pandas-UDF before mapPartitions).

Implementation (backward as-of, inclusive): union the two sides with a side
tag, then one window pass per key ordered by ``(ts, side)`` carrying the
most recent right-side payload forward (``last(..., ignorenulls=True)``),
and keep left rows.  ONE shuffle + one per-partition sort — same cost shape
as a window dedup; no range-explosion, no cross product.

Scale notes (10^10 rows):
* the window partitions by the join key — a hot key concentrates on one
  reducer exactly like any keyed window; pre-filter the right side (it is
  usually the small event/quote stream) and, for pathological keys, split
  by time range before joining;
* ties: a right row AT the left row's timestamp is visible (inclusive) —
  the side tag orders right(0) before left(1) at equal ``ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (null if none).

    Right payload columns (everything except keys and timestamp) come back
    suffixed with ``right_suffix``; the matched right timestamp comes back
    as ``ts<right_suffix>``.
    """
    r_payload = [
        c for c in right.columns if c not in key_cols and c != right_ts
    ]
    l_cols = [c for c in left.columns if c not in key_cols and c != left_ts]

    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols],
        F.col(right_ts).alias(f"{right_ts}{right_suffix}"),
        *[F.col(c).alias(f"{c}{right_suffix}") for c in r_payload],
    )
    l_tagged = left.select(
        *key_cols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *l_cols,
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(f"{right_ts}{right_suffix}"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{right_suffix}")
            for c in r_payload
        ],
    )
    unioned = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *key_cols,
        "_ats",
        "_side",
        *l_cols,
        *[
            F.last(f"{c}{right_suffix}", ignorenulls=True)
            .over(w)
            .alias(f"{c}{right_suffix}")
            for c in [right_ts, *r_payload]
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .drop("_side")
        .withColumnRenamed("_ats", left_ts)
    )
