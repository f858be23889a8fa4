"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the engine's full CDC path (change-stream →
salted max-version dedup → exactly-once MERGE into a manifest table →
snapshot read) applied to the sf0.001 ``events`` table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup family,
similarity search, text analysis, curation sampling/top-k, multimodal
plumbing).  Definitions live in
``event_driven_etl_msc_research_spark/plans/driver_queries.py``; every
entry has an oracle (the two approximate ANN queries are pinned against
golden neighbor sets of the deterministic sf0.01 corpus, with their
approximate nature separately gated by recall tests in tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from event_driven_etl_msc_research_spark.plans.driver_queries import (  # noqa: E402
    QUERIES,
    cdc_merge_events,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return cdc_merge_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
