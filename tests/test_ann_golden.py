"""The pinned ANN golden oracles must match a live run — any drift in the
LSH/IVF operators or their driver params breaks here loudly (and the fix is
a deliberate regeneration via tools/gen_ann_golden.py, reviewed)."""

from __future__ import annotations

import duckdb
import pytest

from event_driven_etl_msc_research_spark.plans.driver_queries import (
    KNN_IVF_GOLDEN_SQL,
    KNN_LSH_GOLDEN_SQL,
    knn_ivf,
    knn_lsh,
)

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize(
    "fn,golden_sql",
    [(knn_lsh, KNN_LSH_GOLDEN_SQL), (knn_ivf, KNN_IVF_GOLDEN_SQL)],
    ids=["lsh", "ivf"],
)
def test_golden_matches_live_run(spark, fn, golden_sql):
    live = sorted(
        (int(r["qid"]), int(r["nid"]), float(r["cosine"]), int(r["rank"]))
        for r in fn(spark, SF).collect()
    )
    pinned = sorted(
        (int(q), int(n), float(c), int(rk))
        for q, n, c, rk in duckdb.sql(golden_sql).fetchall()
    )
    assert live == pinned
