"""Driver contract (SURVEY.md §5.6): entry / queries / oracle_sql, with a
spot-check of the DuckDB oracle equivalence at sf0.001 (the full sweep runs
via tools/check_oracles.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"user_key", "ts", "event_type", "value"} <= set(df.columns)


def test_every_oracle_key_has_a_query():
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "dedup_exact_docs",
        "lang_id_docs",
        "cdc_merge_events",
        "cdc_events_time_window",
        "cdc_events_zorder_window",
    ],
)
def test_oracle_spot_check(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = fn(spark, SF_DIR).toPandas()
    exp = duck.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if str(df[c].dtype).startswith(("int", "uint")):
                df[c] = df[c].astype("int64")
            elif str(df[c].dtype) == "object":
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(got), norm(exp), check_dtype=False)
