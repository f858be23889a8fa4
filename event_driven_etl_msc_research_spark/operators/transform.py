"""Reference-semantics transform pipeline (SURVEY.md §2.2 P1-P7).

The reference's entire transform is a per-row Python loop over positional
JSON arrays (``Phase3-Transformation.py:113-127``; identical in
``Async- Phase3-Transformation-Asyn.py:113-126`` and
``Backup_03072024/Backup_etl_23062024/Transformation.py:104-116``):

    for headline in news_data_list:            # rows = positional arrays
        if len(headline) > 5:                  # P1 arity filter
            Title  = headline[2] or 'Missing'  # P2 projection + P3 impute
            Source = headline[0] or 'Missing'
            Time   = headline[3] or 'Missing'
            Author = headline[4].split('By ')[-1] or 'Missing'   # P4
            Link   = headline[5] or 'Missing'
            CorrelationId = correlation_id     # P5 constant enrichment
            Key = str(uuid.uuid4())            # P6 — nondeterministic!

Here the same semantics are pure Column expressions (whole-stage codegen,
zero Python in the hot path).  P6 is deliberately replaced by a
deterministic surrogate key — ``uuid4`` per retry is what makes the
reference's re-runs duplicate rows (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_missing(col: F.Column) -> F.Column:
    """P3: ``x if len(x) > 0 else 'Missing'`` (``Phase3-Transformation.py:117-121``)."""
    return F.when(F.length(F.coalesce(col, F.lit(""))) > 0, col).otherwise(
        F.lit("Missing")
    )


def strip_author_prefix(col: F.Column) -> F.Column:
    """P4: ``headline[4].split('By ')[-1]`` (``Phase3-Transformation.py:120``)."""
    return F.element_at(F.split(col, "By "), -1)


def news_transform(raw: DataFrame, correlation_id: str, arr_col: str = "arr") -> DataFrame:
    """P1-P7 over a DataFrame with an array<string> column of positional rows.

    Output schema matches the reference's transformed table / Athena DDL
    (``Phase3-Transformation.py:117-123``, ``Phase3-DataLoad.py:104-112``):
    Title, Source, Time, Author, Link, CorrelationId, Key — all strings.
    """
    a = F.col(arr_col)
    return (
        raw.filter(F.size(a) > 5)  # P1: len(headline) > 5
        .select(
            impute_missing(a[2]).alias("Title"),       # P2+P3
            impute_missing(a[0]).alias("Source"),
            impute_missing(a[3]).alias("Time"),
            impute_missing(strip_author_prefix(a[4])).alias("Author"),  # P4
            impute_missing(a[5]).alias("Link"),
            F.lit(correlation_id).alias("CorrelationId"),  # P5
            # P6: deterministic surrogate key (replaces uuid4 — see module doc)
            F.sha2(
                F.concat_ws("\x1f", a[0], a[2], a[3], a[4], a[5], F.lit(correlation_id)),
                256,
            ).alias("Key"),
        )
    )


def url_percent_encode(col: F.Column) -> F.Column:
    """P8: the v1 scraper's query encoding — lowercase + char-map
    ``{'&':'%26','=':'%3D','+':'%2B',' ':'%20'}``
    (``Backup_03072024/Backup_etl_23062024/extarction.py:102-109``, ``test.py:9-14``)."""
    c = F.lower(col)
    for ch, enc in [("&", "%26"), ("=", "%3D"), ("+", "%2B"), (" ", "%20")]:
        c = F.replace(c, F.lit(ch), F.lit(enc))
    return c


def rewrite_article_link(col: F.Column) -> F.Column:
    """P9: ``href.replace('./articles/', 'https://news.google.com/articles/')``
    (``Backup_03072024/Backup_etl_23062024/extarction.py:84``, ``test.py:23-24``)."""
    return F.replace(
        col, F.lit("./articles/"), F.lit("https://news.google.com/articles/")
    )


def extract_error_payload(col: F.Column) -> F.Column:
    """P10: parse the doubly-nested Step Functions error JSON
    (``HandleDataExtractionErrorLambda.py:24-37``): Cause → errorMessage →
    inner payload dict."""
    inner = F.get_json_object(col, "$.errorMessage")
    return F.struct(
        F.get_json_object(inner, "$.error_message").alias("error_message"),
        F.get_json_object(inner, "$.tenant_id_job").alias("tenant_id_job"),
        F.get_json_object(inner, "$.correlation_id").alias("correlation_id"),
        F.get_json_object(inner, "$.raw_data_file_path").alias("raw_data_file_path"),
    )
