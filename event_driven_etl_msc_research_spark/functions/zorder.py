"""Z-order (Morton-curve) clustering value — multi-column data skipping.

The Delta ``OPTIMIZE ... ZORDER BY`` / Iceberg z-order sort-order analogue:
a single sort key whose ordering interleaves the bit patterns of several
columns, so rows close on the curve are close in EVERY clustered dimension
at once.  Files rolled from a z-sorted stream then carry tight min/max
ranges on ALL the clustered columns — a bounded read on any one of them
(or a box on several) skips most files, where a lexicographic sort only
ever skips on its leading column.

Construction (all JVM-side Column expressions, whole-stage codegen — no
Python in the hot path, mirroring Delta's ``range_partition_id`` approach):

1. EQUI-DEPTH RANKS, not raw values: each column is mapped to a rank in
   ``[0, 2**bits)`` by its position among ``2**bits - 1`` approximate
   quantile boundaries sampled in ONE column-pruned pass over the data
   (``approxQuantile``, Greenwald-Khanna sketch — no shuffle, no collect of
   data rows, just ``O(cols * 2**bits)`` floats to the driver).  Equi-depth
   makes the curve skew-proof: a hot value range still spreads over many
   rank cells, where min/max normalization would collapse it into one.
2. BIT INTERLEAVE: rank bit ``i`` of column ``j`` lands at z-bit
   ``i * ncols + j`` — ``bits * ncols`` cheap integer ops (shift/and/or),
   at the default ``bits=8`` and 3 columns a 24-term codegen'd expression.

NULL ordering: a NULL value ranks 0 (nulls-first), matching Spark's default
ascending NULLS FIRST so the clustered files stay prunable with the same
``read(where=)`` semantics.

Supported column types: numerics, timestamp, date — the types with a total
order that parquet footers carry min/max stats for.  Strings are NOT
supported (their order can't be equi-depth-bucketed from a numeric sketch);
cluster on a string by putting it first in a lexicographic ``sort_by``
instead.

Cost note for the rewrite paths (``compact``/``rebucket``): the boundary
sketch is one extra COLUMN-PRUNED scan of exactly the files the rewrite is
about to read anyway, so at 100 TB it is a few percent of the rewrite, and
the per-row rank lookup is an ``O(2**bits)`` vectorized scan of a literal
array — lower ``bits`` to trade skipping granularity for CPU.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZORDER_BITS = 8

_OK_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.TimestampType,
    T.DateType,
)


def zorder_validate(schema: T.StructType, cols: list[str]) -> None:
    """Raise ``ValueError`` (before any Spark job) unless every ``cols``
    entry exists in ``schema`` with a z-orderable (numeric/timestamp/date)
    type and the column list is non-empty and duplicate-free."""
    if not cols:
        raise ValueError("zorder_by needs at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError(f"zorder_by has duplicate columns: {cols}")
    by_name = {f.name: f.dataType for f in schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"zorder_by columns not in schema: {missing}")
    bad = [c for c in cols if not isinstance(by_name[c], _OK_TYPES)]
    if bad:
        raise ValueError(
            f"zorder_by columns must be numeric/timestamp/date, got "
            f"{[(c, by_name[c].simpleString()) for c in bad]}; cluster on a "
            f"string column with sort_by instead"
        )


def _as_double(col: str, dtype: T.DataType) -> Column:
    """Order-preserving double image of a z-orderable column."""
    if isinstance(dtype, T.DateType):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def zorder_boundaries(
    sample: DataFrame,
    cols: list[str],
    bits: int = ZORDER_BITS,
    relative_error: float = 0.01,
) -> dict[str, list[float]]:
    """Equi-depth rank boundaries per column — ONE column-pruned pass.

    Returns ``{col: sorted distinct interior boundaries}`` (at most
    ``2**bits - 1`` floats per column; fewer when the column has few
    distinct values, empty when it is constant or all-null — such a column
    contributes rank 0 everywhere, i.e. drops out of the curve, which is
    the correct degenerate behavior)."""
    zorder_validate(sample.schema, cols)
    nq = (1 << bits) - 1
    probs = [(i + 1) / (nq + 1) for i in range(nq)]
    doubled = sample.select(
        *[_as_double(c, sample.schema[c].dataType).alias(c) for c in cols]
    )
    quantiles = doubled.approxQuantile(cols, probs, relative_error)
    return {c: sorted(set(qs)) for c, qs in zip(cols, quantiles)}


def zorder_expr(
    schema: T.StructType,
    bounds: dict[str, list[float]],
    cols: list[str],
    bits: int = ZORDER_BITS,
) -> Column:
    """The interleaved z-value Column (LongType) for rows of ``schema``.

    Pure codegen'd integer arithmetic over literal boundary arrays: rank =
    count of boundaries strictly below the value (NULL → 0), then bit
    ``i`` of column ``j``'s rank lands at z-bit ``i * ncols + j``."""
    zorder_validate(schema, cols)
    ncols = len(cols)
    if bits * ncols > 62:
        raise ValueError(
            f"bits={bits} over {ncols} columns needs {bits * ncols} z-bits; "
            f"must fit a signed long (<= 62)"
        )
    terms: list[Column] = []
    for j, c in enumerate(cols):
        bs = bounds.get(c) or []
        if not bs:
            continue  # constant/all-null column: rank 0 everywhere
        v = _as_double(c, schema[c].dataType)
        arr = F.array(*[F.lit(float(b)) for b in bs])
        # strictly-below count; NULL v makes the lambda NULL -> filtered out
        rank = F.size(F.filter(arr, lambda b: b < v)).cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(rank, i).bitwiseAND(F.lit(1)),
                    i * ncols + j,
                )
            )
    if not terms:
        return F.lit(0).cast("long")
    return functools.reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_column(
    sample: DataFrame,
    cols: list[str],
    bits: int = ZORDER_BITS,
    relative_error: float = 0.01,
) -> Column:
    """Convenience: sketch boundaries from ``sample`` (one job) and return
    the z-value Column, applicable to any DataFrame sharing those columns'
    names and types."""
    bounds = zorder_boundaries(sample, cols, bits, relative_error)
    return zorder_expr(sample.schema, bounds, cols, bits)
