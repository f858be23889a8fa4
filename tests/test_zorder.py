"""Unit tests for the z-order clustering value (functions/zorder.py).

The integration story (clustered rewrite → multi-column file skipping) is
pinned in test_pruned_read.py; here the EXPRESSION itself is pinned: exact
Morton interleave against a Python reference, equi-depth ranks, NULL
handling, and the fail-fast validation surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.functions.zorder import (
    zorder_boundaries,
    zorder_column,
    zorder_expr,
    zorder_validate,
)


def _morton(ranks: list[int], bits: int) -> int:
    n = len(ranks)
    z = 0
    for j, r in enumerate(ranks):
        for i in range(bits):
            z |= ((r >> i) & 1) << (i * n + j)
    return z


def test_zorder_expr_is_exact_morton_interleave(spark):
    # values 0.5/1.5/2.5/3.5 rank 0/1/2/3 against boundaries [1,2,3]
    rows = [(float(x) + 0.5, float(y) + 0.5) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x double, y double")
    bounds = {"x": [1.0, 2.0, 3.0], "y": [1.0, 2.0, 3.0]}
    z = zorder_expr(df.schema, bounds, ["x", "y"], bits=2)
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", z).collect()
    }
    for x in range(4):
        for y in range(4):
            assert got[(x + 0.5, y + 0.5)] == _morton([x, y], 2), (x, y)


def test_zorder_null_ranks_first_and_boundary_is_strictly_below(spark):
    df = spark.createDataFrame(
        [(None,), (0.0,), (1.0,), (1.5,), (99.0,)], "x double"
    )
    z = zorder_expr(df.schema, {"x": [1.0, 2.0]}, ["x"], bits=2)
    vals = [r["z"] for r in df.withColumn("z", z).collect()]
    # NULL and everything <= the first boundary rank 0; strictness pins the
    #'count strictly below' rule (1.0 is NOT below the 1.0 boundary)
    assert vals == [0, 0, 0, 1, 2]


def test_zorder_boundaries_are_equi_depth_under_skew(spark):
    # 90% of mass at 0 — min/max normalization would waste almost every
    # rank cell; equi-depth spends its boundaries inside the hot region's
    # complement so the tail still spreads over distinct ranks
    rows = [(0.0,)] * 900 + [(float(i),) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "x double")
    bs = zorder_boundaries(df, ["x"], bits=4, relative_error=0.001)["x"]
    assert bs == sorted(set(bs)) and len(bs) >= 1
    assert any(b > 0.0 for b in bs)  # tail got boundaries, not just the mode


def test_zorder_constant_column_drops_out(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    bounds = zorder_boundaries(df, ["x", "y"], bits=2, relative_error=0.001)
    assert bounds["y"] == [] or len(bounds["y"]) <= 1
    z = zorder_column(df, ["x", "y"], bits=2, relative_error=0.001)
    vals = sorted(r["z"] for r in df.withColumn("z", z).collect())
    assert vals[0] < vals[1]  # x still orders the curve; y contributes 0


def test_zorder_validate_fails_fast():
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("s", T.StringType()),
        ]
    )
    zorder_validate(schema, ["ts", "n"])  # ok
    with pytest.raises(ValueError, match="not in schema"):
        zorder_validate(schema, ["nope"])
    with pytest.raises(ValueError, match="numeric/timestamp/date"):
        zorder_validate(schema, ["s"])
    with pytest.raises(ValueError, match="duplicate"):
        zorder_validate(schema, ["n", "n"])
    with pytest.raises(ValueError, match="at least one"):
        zorder_validate(schema, [])
    with pytest.raises(ValueError, match="z-bits"):
        zorder_expr(schema, {"ts": [], "n": []}, ["ts", "n"], bits=32)


def test_zorder_timestamp_column(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(16)], "sec long"
    ).select(F.timestamp_seconds("sec").alias("ts"))
    bounds = zorder_boundaries(df, ["ts"], bits=2, relative_error=0.001)
    z = zorder_expr(df.schema, bounds, ["ts"], bits=2)
    out = df.withColumn("z", z).orderBy("ts").collect()
    zs = [r["z"] for r in out]
    assert zs == sorted(zs) and len(set(zs)) == 4  # 2 bits -> 4 rank cells
