"""Headered-CSV boundary (sources/csv.py) — reference S4 format parity.

Round-trips a reference-shaped transformed table (pandas to_csv
conventions, Phase3-Transformation.py:128-136) through the typed reader,
including quoted commas/newlines-free fields and corrupt-row isolation.
"""

from __future__ import annotations

import os

import pandas as pd

from event_driven_etl_msc_research_spark.sources.csv import (
    NEWS_CSV_SCHEMA,
    read_headered_csv,
    write_headered_csv,
)

ROWS = [
    {
        "Title": "Spark 4 ships, with commas",
        "Source": "wire",
        "Time": "5 hours ago",
        "Author": "Jo Writer",
        "Link": "https://news.example.com/articles/1",
        "CorrelationId": "epoch-0",
        "Key": "k1",
    },
    {
        "Title": 'Quote "heavy" headline',
        "Source": "blog",
        "Time": "Yesterday",
        "Author": "Missing",
        "Link": "https://news.example.com/articles/2",
        "CorrelationId": "epoch-0",
        "Key": "k2",
    },
]


def test_csv_roundtrip_reference_shape(spark, tmp_root):
    src = os.path.join(tmp_root, "transformed.csv")
    # written EXACTLY as the reference writes it: pandas to_csv(index=False)
    pd.DataFrame(ROWS).to_csv(src, index=False)

    df = read_headered_csv(spark, src, schema=NEWS_CSV_SCHEMA)
    assert [f.name for f in df.schema.fields] == [f.name for f in NEWS_CSV_SCHEMA.fields]
    got = {r["Key"]: r.asDict() for r in df.collect()}
    assert got["k1"]["Title"] == "Spark 4 ships, with commas"
    assert got["k2"]["Title"] == 'Quote "heavy" headline'

    # engine-side write → re-read round-trip preserves every value
    out_dir = os.path.join(tmp_root, "csv_out")
    write_headered_csv(df, out_dir, single_file=True)
    back = read_headered_csv(spark, out_dir, schema=NEWS_CSV_SCHEMA)
    assert sorted((r.asDict() for r in back.collect()), key=lambda d: d["Key"]) == sorted(
        (r.asDict() for r in df.collect()), key=lambda d: d["Key"]
    )


def test_csv_corrupt_rows_isolated(spark, tmp_root):
    src = os.path.join(tmp_root, "bad.csv")
    header = ",".join(f.name for f in NEWS_CSV_SCHEMA.fields)
    with open(src, "w") as f:
        f.write(header + "\n")
        f.write("t,s,now,a,l,c,k\n")
        f.write("torn,row,with,too,many,columns,x,y,z\n")
    ok = read_headered_csv(spark, src, schema=NEWS_CSV_SCHEMA)
    # collect, not count(): count() prunes all columns so DROPMALFORMED
    # never parses (documented gotcha in sources/csv.py)
    assert len(ok.collect()) == 1  # torn row dropped, good row kept
    kept = read_headered_csv(spark, src, schema=NEWS_CSV_SCHEMA, keep_corrupt=True)
    assert kept.filter("_corrupt_record IS NOT NULL").count() == 1
