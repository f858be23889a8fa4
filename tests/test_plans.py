"""Physical-plan assertions: the plans the engine RELIES on, pinned.

Correctness tests prove the right rows come back; these prove the right
PLAN produces them — the properties that decide whether a query survives a
100× scale-up: filters reaching the parquet scan, column pruning, dims
broadcast instead of shuffled, no nested-loop joins, map-side partial
aggregation, and single evaluation of expensive expressions (the round-1
shingle quadratic regression is pinned here).
"""

from __future__ import annotations

import pytest

from event_driven_etl_msc_research_spark.plans import driver_queries as DQ

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(DQ.q1_pricing_summary(spark, SF))
    # the shipdate filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the FileScan's column list excludes unused columns
    # (ReadSchema is display-truncated, so assert on the scan's output list)
    import re

    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    read_cols = {c.split("#")[0] for c in m.group(1).split(",")}
    assert "l_partkey" not in read_cols and "l_suppkey" not in read_cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_tax"} <= read_cols
    # partial aggregation before the exchange (map-side combine)
    assert "partial_sum" in plan


def test_q5_dims_broadcast_not_shuffled(spark):
    plan = _plan(DQ.q5_nation_revenue(spark, SF))
    # 3 dim joins broadcast; the only sort-merge join is fact-to-orders
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q4_semi_join_not_subquery_rescan(spark):
    plan = _plan(DQ.q4_order_priority(spark, SF))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_doc_fingerprints_single_split_eval(spark):
    """Regression for the round-1 scale-killer: the regex tokenizer must be
    evaluated ONCE per row, not once per shingle index (an inline split
    inside the transform lambda re-executes per element — O(tokens²))."""
    plan = (
        DQ.doc_fingerprints(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") == 1, plan


def test_dedup_partial_maxby_no_window(spark):
    q = DQ.cdc_latest_event_per_user(spark, SF)
    plan = _plan(q)
    assert "partial_max_by" in plan  # map-side combine defuses hot keys
    assert "Window" not in plan      # never sort-the-world per key


def test_knn_bruteforce_corpus_never_shuffled(spark):
    plan = _plan(DQ.knn_bruteforce(spark, SF))
    # queries broadcast; the only exchange after the corpus scan is the
    # tiny scored-rows shuffle for the per-query window
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_signature_computed_once(spark):
    """The small/big pair-expansion branches must NOT re-run the signature
    pipeline per branch (collect_list is non-deterministic → Catalyst will
    not reuse its exchange; the operator local-checkpoints the members
    table instead).  Regression: without it every shingle md5 ran 3×."""
    plan = _plan(DQ.dedup_minhash_lsh(spark, SF))
    # both branches read the checkpointed RDD; the md5/min pipeline
    # (partial_min over 12 signature columns) appears in NO branch
    assert plan.count("partial_min") == 0
    assert "ExistingRDD" in plan


def test_asof_and_rangejoin_no_cross_product(spark):
    for q in (DQ.events_asof_last_error, DQ.events_range_join):
        plan = _plan(q(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_keep_best_is_broadcast_anti_join(spark):
    """dedup_near_keep_best's final filter must be a broadcast LeftAnti —
    the corpus is never shuffled for the loser subtraction (the 100 TB
    property of the canonicalization cut)."""
    plan = _plan(DQ.dedup_near_keep_best(spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    # no sort-merge anti-join (that would shuffle the corpus by doc_id)
    import re

    anti_lines = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti_lines and all("SortMergeJoin" not in l for l in anti_lines)


def test_pruned_read_query_opens_one_week(spark):
    """cdc_events_time_window's bounded snapshot read plans ONLY the
    queried week's file(s) — manifest file-stats pruning end-to-end on the
    driver query itself."""
    df = DQ.cdc_events_time_window(spark, SF)
    files = [p for p in df.inputFiles() if "/data/" in p or "_pb=" in p]
    assert len(files) == 1, files


def test_sample_stratified_filter_is_narrow(spark):
    """deterministic_sample must stay a pure narrow filter: no exchange
    between the documents scan and the sample predicate (the aggregation
    after it is the query's only shuffle)."""
    from event_driven_etl_msc_research_spark.operators.docops import (
        deterministic_sample,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(deterministic_sample(docs, "doc_id", 25).select("doc_id"))
    assert "Exchange" not in plan
    assert "Filter" in plan
