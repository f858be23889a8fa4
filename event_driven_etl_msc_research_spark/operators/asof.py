"""As-of (point-in-time) join — a time-series operator Spark lacks natively.

The reference has no joins at all (SURVEY.md §2.4); the engine adds this as
a composition of built-in ops per the custom-operator policy (compose before
Pandas-UDF before mapPartitions).

Implementation (backward as-of, inclusive): union the two sides with a side
tag, then one window pass per key ordered by ``(ts, side)`` carrying the most
recent right-side row forward, and keep left rows.  ONE shuffle + one
per-partition sort — same cost shape as a window dedup; no range-explosion,
no cross product.

The carried right row is ONE struct ``(ts, payload...)`` under a single
``last(..., ignorenulls=True)`` — never per-column ``last`` calls, which
would mix values from DIFFERENT right rows whenever a matched right row has
a null payload column (torn row).

Scale notes (10^10 rows):
* the window partitions by the join key — a hot key concentrates on one
  reducer exactly like any keyed window; pre-filter the right side (it is
  usually the small event/quote stream) and, for pathological keys, split
  by time range before joining;
* ties: a right row AT the left row's timestamp is visible (inclusive) —
  the side tag orders right(0) before left(1) at equal ``ts``.  Multiple
  right rows at the SAME (key, ts) are resolved deterministically: the
  window additionally orders by the carried struct itself, so the row with
  the greatest payload tuple wins (document/choose a tie-break column —
  e.g. a sequence number — as the first payload column to control this).
  CONSTRAINT: the deterministic tie-break requires every right payload
  column to be ORDERABLE (no map columns on the right side) — project
  non-orderable columns away, or wrap them, before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (null columns if none).

    Right payload columns (everything except keys and timestamp) come back
    suffixed with ``right_suffix``; the matched right timestamp comes back
    as ``ts<right_suffix>``.  All right-side output columns come from the
    SAME matched right row (carried as one struct).
    """
    return _asof_join(
        left, right, key_cols, left_ts, right_ts, right_suffix, forward=False
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of (inclusive): for each left row, the EARLIEST right row
    with ``right.ts >= left.ts`` for the same key.  Same single-shuffle
    union+window plan as the backward join, with the scan order reversed;
    right-ts ties resolve deterministically to the least payload tuple."""
    return _asof_join(
        left, right, key_cols, left_ts, right_ts, right_suffix, forward=True
    )


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_suffix: str,
    forward: bool,
) -> DataFrame:
    r_payload = [c for c in right.columns if c not in key_cols and c != right_ts]
    l_cols = [c for c in left.columns if c not in key_cols and c != left_ts]
    r_types = dict(zip(right.schema.names, [f.dataType for f in right.schema.fields]))

    rrow_type = T.StructType(
        [T.StructField("_rts", r_types[right_ts])]
        + [T.StructField(c, r_types[c]) for c in r_payload]
    )
    r_struct = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in r_payload]
    )
    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols],
        r_struct.alias("_rrow"),
    )
    l_tagged = left.select(
        *key_cols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *l_cols,
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    unioned = r_tagged.unionByName(l_tagged)
    # order ties on (_ats, _side) by the struct itself: deterministic winner
    # among same-timestamp right rows (backward: greatest payload tuple
    # carried last wins; forward: least).  Left rows have a null struct —
    # nulls_first keeps them shadowing no right row, and last(ignorenulls)
    # skips them anyway.  Forward direction = the same scan over DESCENDING
    # ts, so "last right seen" is the earliest right at-or-after.
    ats = F.col("_ats").desc() if forward else F.col("_ats").asc()
    rrow = (
        F.col("_rrow").desc_nulls_first()
        if forward
        else F.col("_rrow").asc_nulls_first()
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ats, F.col("_side").asc(), rrow)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *key_cols,
        "_ats",
        "_side",
        *l_cols,
        F.last("_rrow", ignorenulls=True).over(w).alias("_rrow"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *key_cols,
        F.col("_ats").alias(left_ts),
        *l_cols,
        F.col("_rrow._rts").alias(f"{right_ts}{right_suffix}"),
        *[F.col(f"_rrow.{c}").alias(f"{c}{right_suffix}") for c in r_payload],
    )
