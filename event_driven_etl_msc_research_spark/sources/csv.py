"""Headered-CSV ingest/egress — reference format parity (S4).

The reference's transformed zone is headered CSV written with
``pandas.to_csv(index=False)`` (``Phase3-Transformation.py:128-136``:
columns Title, Source, Time, Author, Link, CorrelationId, Key), which its
load phase then bulk-copies into the warehouse (``Phase3-DataLoad.py``).
The engine's internal format is Parquet (SURVEY.md §8), but a user arriving
with reference-shaped data needs the CSV boundary: these helpers read that
CSV into the typed pipeline and write any result back out in the same
headered shape.

Scale notes: CSV is a row format with no column pruning, predicate pushdown,
or compression-aware splitting — it is supported as an EDGE format only
(ingest once → Parquet).  The reader keeps files splittable (no multiline),
schema-first (no inference job when a schema is given), and
PERMISSIVE-with-corrupt-record-column so one torn row cannot kill a 100 TB
backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# the reference's transformed-zone header (Phase3-Transformation.py:114-123)
NEWS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Title", T.StringType()),
        T.StructField("Source", T.StringType()),
        T.StructField("Time", T.StringType()),
        T.StructField("Author", T.StringType()),
        T.StructField("Link", T.StringType()),
        T.StructField("CorrelationId", T.StringType()),
        T.StructField("Key", T.StringType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_headered_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read headered CSV (pandas ``to_csv`` conventions: header row, commas,
    double-quote quoting/escaping) into a typed DataFrame.

    With a ``schema``, no inference pass runs and malformed rows are DROPPED
    (``DROPMALFORMED`` — one torn row cannot kill a 100 TB backfill, and no
    caching is required).  ``keep_corrupt=True`` switches to PERMISSIVE with
    a ``_corrupt_record`` column for debugging the dropped rows — that path
    CACHES the parse (Spark disallows querying the corrupt column of an
    uncached raw scan), so use it on samples, not the full corpus.  Without
    a schema, a single inference job runs — fine for exploration, not for
    the 100 TB path.
    """
    rdr = (
        spark.read.option("header", "true")
        .option("quote", '"')
        .option("escape", '"')  # pandas doubles quotes; Spark default is \\
    )
    if schema is None:
        return rdr.option("inferSchema", "true").csv(path)
    if keep_corrupt:
        full = T.StructType(
            schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        return (
            rdr.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .csv(path)
            .cache()
        )
    # GOTCHA: under DROPMALFORMED a bare count() can over-count — full column
    # pruning skips parsing, so malformed rows are never detected.  Any query
    # touching real columns (every pipeline use) parses and drops correctly;
    # for exact audits set spark.sql.csv.parser.columnPruning.enabled=false.
    return rdr.schema(schema).option("mode", "DROPMALFORMED").csv(path)


def write_headered_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write a DataFrame as headered CSV in the reference's conventions.
    ``single_file`` coalesces to one part — ONLY for small exports (it
    serializes the write on one task); the default keeps one file per
    partition, which is the scalable shape."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
