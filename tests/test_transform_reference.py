"""Reference-semantics transform tests (FIXTURES.md F3, SURVEY.md §2.2).

Oracle: a literal Python re-statement of the reference's per-row loop
(Phase3-Transformation.py:113-127) run on the same fixture rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.operators.transform import (
    extract_error_payload,
    news_transform,
    rewrite_article_link,
    url_percent_encode,
)

# positional rows: [Source, "More", Title, Time, Author, "By Author", Link]
# with variable arity and empties, exactly like data-genartor.py:23-30
FIXTURE = [
    ["CNN", "More", "Big news", "2h ago", "By Alice", "By Alice", "http://x/1"],
    ["BBC", "More", "", "3h ago", "By Bob", "By Bob", "http://x/2"],  # empty title
    ["Reuters", "More", "Short row"],  # arity 3 → dropped (P1)
    ["AP", "More", "Mid", "1h ago"],  # arity 4 → dropped
    ["", "More", "No source", "", "Carol", "By Carol", ""],  # empties + no 'By '
    ["Fox", "More", "T", "9h ago", "By D. E. Writer", "x", "http://x/3"],
]


def _reference_loop(rows, correlation_id):
    """The reference's transform, verbatim semantics (uuid key excluded)."""
    out = []
    for headline in rows:
        if len(headline) > 5:
            title = headline[2] if len(headline[2]) > 0 else "Missing"
            source = headline[0] if len(headline[0]) > 0 else "Missing"
            time_ = headline[3] if len(headline[3]) > 0 else "Missing"
            author = headline[4].split("By ")[-1]
            author = author if len(author) > 0 else "Missing"
            link = headline[5] if len(headline[5]) > 0 else "Missing"
            out.append((title, source, time_, author, link, correlation_id))
    return out


@pytest.fixture()
def raw(spark):
    return spark.createDataFrame(
        [(r,) for r in FIXTURE],
        T.StructType([T.StructField("arr", T.ArrayType(T.StringType()))]),
    )


def test_news_transform_matches_reference_loop(spark, raw):
    got = news_transform(raw, "corr-1").drop("Key").collect()
    exp = _reference_loop(FIXTURE, "corr-1")
    assert [tuple(r) for r in got] == exp


def test_key_is_deterministic_across_retries(spark, raw):
    """P6 upgrade: same input + correlation id → same keys on re-run
    (the reference's uuid4 keys duplicate rows on retry,
    Phase3-Transformation.py:123 / SURVEY.md §3.2)."""
    k1 = [r["Key"] for r in news_transform(raw, "c").select("Key").collect()]
    k2 = [r["Key"] for r in news_transform(raw, "c").select("Key").collect()]
    assert k1 == k2
    assert len(set(k1)) == len(k1)


def test_transform_is_pure_codegen(spark, raw):
    """No Python in the hot path: the plan must be whole-stage codegen with
    zero (Python) UDF evals — input_hint hard requirement."""
    plan = (
        news_transform(raw, "c")._jdf.queryExecution().executedPlan().toString()
    )
    assert "*(1)" in plan  # '*' prefix = whole-stage codegen span
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_url_percent_encode(spark):
    df = spark.range(1).select(
        url_percent_encode(F.lit("A&B=C+D E")).alias("q")
    )
    # reference lowercases first, then maps chars (extarction.py:102-109)
    assert df.collect()[0]["q"] == "a%26b%3Dc%2Bd%20e"


def test_rewrite_article_link(spark):
    df = spark.range(1).select(
        rewrite_article_link(F.lit("./articles/abc?x=1")).alias("u")
    )
    assert df.collect()[0]["u"] == "https://news.google.com/articles/abc?x=1"


def test_extract_error_payload(spark):
    import json

    inner = json.dumps(
        {
            "error_message": "boom",
            "tenant_id_job": "t1",
            "correlation_id": "c9",
            "raw_data_file_path": "raw-data/t1/c9/f.json",
        }
    )
    cause = json.dumps({"errorMessage": inner})
    df = spark.range(1).select(extract_error_payload(F.lit(cause)).alias("e"))
    r = df.collect()[0]["e"]
    assert (r["error_message"], r["tenant_id_job"], r["correlation_id"]) == (
        "boom",
        "t1",
        "c9",
    )
