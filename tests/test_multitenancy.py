"""Multi-tenancy: the reference isolates tenants by f-string table-name
mangling (``DataSplit.py:60``, ``Phase3-Data-Extraction.py:24``); here a
tenant is a first-class attribute — separate table roots under one lake
prefix, ``tenant_id`` carried in every manifest and lineage row, and a
cross-tenant metrics rollup that the reference could only do per-tenant."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from event_driven_etl_msc_research_spark import CDCEngine
from event_driven_etl_msc_research_spark.datagen import (
    ChangeStreamSpec,
    generate_change_stream,
)
from event_driven_etl_msc_research_spark.schemas import CHANGE_EVENT_SCHEMA_EVOLVED


def _engine(spark, tmp_root, tenant):
    return CDCEngine(
        spark,
        os.path.join(tmp_root, "lake", tenant),
        change_schema=CHANGE_EVENT_SCHEMA_EVOLVED,
        n_buckets=4,
        tenant_id=tenant,
    )


def test_tenants_isolated_and_rollup(spark, tmp_root):
    streams = {}
    for tenant, seed in [("acme", 21), ("globex", 22)]:
        log = os.path.join(tmp_root, f"wal_{tenant}")
        generate_change_stream(
            log, ChangeStreamSpec(n_events=2000, n_convs=40, seed=seed)
        )
        eng = _engine(spark, tmp_root, tenant)
        eng.replay(log, os.path.join(tmp_root, f"cp_{tenant}"),
                   max_files_per_trigger=2)
        streams[tenant] = eng

    a, g = streams["acme"], streams["globex"]
    # isolation: different data, same schema; manifests stamped per tenant
    assert a.table.manifest()["tenant_id"] == "acme"
    assert g.table.manifest()["tenant_id"] == "globex"
    ta = a.read_table().orderBy("conv_id", "turn_idx").toPandas()
    tg = g.read_table().orderBy("conv_id", "turn_idx").toPandas()
    assert not ta.equals(tg) and len(ta) > 0 and len(tg) > 0

    # a tenant's lineage rows all carry its tenant_id
    lin_a = a.lineage.lineage().toPandas()
    assert (lin_a["tenant_id"] == "acme").all()

    # cross-tenant metrics rollup: union lineage from both tenants and group
    # by tenant — the per-tenant Grafana dashboards of the reference
    # (monitoring/.../middleware.py:26-37) collapse to one DataFrame op
    rollup = (
        a.lineage.lineage()
        .unionByName(g.lineage.lineage())
        .groupBy("tenant_id")
        .agg(F.count("*").alias("n_stage_rows"),
             F.sum("duration_s").alias("total_s"))
        .collect()
    )
    assert {r["tenant_id"] for r in rollup} == {"acme", "globex"}
    assert all(r["n_stage_rows"] > 0 for r in rollup)
