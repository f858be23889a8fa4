"""Parquet bloom filters on configured columns (Iceberg write-option /
Delta bloom-index analogue): `create(bloom_filter_cols=[...])` makes every
data write site — delta staging, CoW rewrites, compaction, rebucket —
attach a parquet bloom so POINT lookups skip row groups inside the files
min/max stats cannot prune (a hot bucket's delta files span wide key
ranges by nature).  The read path has no dependency on them: Spark's
parquet reader consults blooms opportunistically per file, so tables mix
bloom'd and plain files freely.  `set_bloom_filter_cols` flips the config
as a metadata-only commit.

parquet-mr materializes the bloom only for column chunks that FALL BACK
from dictionary encoding (dictionary pages already filter exactly), so
these tests use all-unique keys — the high-cardinality regime the feature
exists for — and assert bloom presence via the deterministic on-disk
footprint: identical rows written with and without the option differ
exactly by the bloom payload (pyarrow/duckdb in this sandbox don't expose
bloom offsets), plus state identity and point-lookup exactness.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable


def _changes(spark, convs, lsn0):
    """One turn per conversation, every conv_id unique — forces the
    dictionary fallback that makes parquet-mr materialize the bloom."""
    rows = [
        ("I", lsn0 + c, 1000 + lsn0 + c, f"conv{c:08d}", 0, "user",
         f"text-{c}", None)
        for c in convs
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    return spark.createDataFrame(
        pdf,
        T.StructType(
            [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("role", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("tool", T.StringType()),
            ]
        ),
    )


def _bytes_by_kind(t):
    out = {"base": 0, "delta": 0}
    for r in t.files().collect():
        out[r["kind"]] += r["size_bytes"]
    return out


def _state(t):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.read().collect()
    )


N = 20_000  # unique keys per epoch: enough to beat dictionary compression


def test_bloom_filters_written_at_every_site_state_identical(spark, tmp_root):
    tables = {}
    for name, cols in (("plain", None), ("bloom", ["conv_id"])):
        t = ManifestTable.create(
            spark,
            os.path.join(tmp_root, name),
            TRANSCRIPT_SCHEMA,
            n_buckets=2,
            bloom_filter_cols=cols,
        )
        t.merge(_changes(spark, range(N), 0), 0)                    # CoW initial
        t.merge(_changes(spark, range(N, 2 * N), 10 * N), 1, mode="delta")
        tables[name] = t
    assert tables["bloom"].manifest()["bloom_filter_cols"] == ["conv_id"]

    # identical rows, larger files: the delta is exactly the bloom payload
    assert _state(tables["bloom"]) == _state(tables["plain"])
    pb, bb = _bytes_by_kind(tables["plain"]), _bytes_by_kind(tables["bloom"])
    assert bb["base"] > pb["base"] + 1024
    assert bb["delta"] > pb["delta"] + 1024

    # the bloom survives a compaction (rewrites go through the same option)
    for t in tables.values():
        assert t.compact()["status"] == "Success"
    assert _state(tables["bloom"]) == _state(tables["plain"])
    pb, bb = _bytes_by_kind(tables["plain"]), _bytes_by_kind(tables["bloom"])
    assert bb["base"] > pb["base"] + 1024

    # point lookup stays exact on the bloom'd table
    got = tables["bloom"].read(where={"conv_id": ("conv00000042",) * 2})
    assert [r["text"] for r in got.collect()] == ["text-42"]


def test_set_bloom_filter_cols_metadata_commit(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "sb")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=2, storage=storage_factory(root)
    )
    t.merge(_changes(spark, range(N), 0), 0, mode="delta")
    v1 = t.current_version()
    before = _bytes_by_kind(t)["delta"]

    with pytest.raises(ValueError, match="not in schema"):
        t.set_bloom_filter_cols(["nope"])
    res = t.set_bloom_filter_cols(["conv_id"])
    assert res["status"] == "Success"
    assert t.set_bloom_filter_cols(["conv_id"])["status"] == "Skipped"
    h = {r["version"]: r["operation"] for r in t.history().collect()}
    assert h[res["version"]] == "set-bloom"

    # next write carries blooms: the same-shaped epoch lands more bytes
    t.merge(_changes(spark, range(N, 2 * N), 10 * N), 1, mode="delta")
    after_second = _bytes_by_kind(t)["delta"] - before
    assert after_second > before + 1024

    # the metadata-only commit keeps the change-feed fast path alive
    ma, mb = t.manifest(v1), t.manifest()
    cand = t._append_candidates(v1, t.current_version(), ma, mb)
    assert cand is not None and len(cand[0]) > 0
    assert t.changes(v1).count() == N

    # misuse at create
    with pytest.raises(ValueError, match="bloom_filter_cols not in schema"):
        ManifestTable.create(
            spark,
            os.path.join(tmp_root, "bad"),
            TRANSCRIPT_SCHEMA,
            bloom_filter_cols=["ghost"],
        )
