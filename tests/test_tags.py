"""Named snapshot refs (Iceberg TAG analogue): tag/untag/tags, read(tag=),
and the retention contract — a tagged snapshot never expires and its data
files never vacuum away.  Parameterized over both storage backends."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable

DAY = 86_400


def _changes(spark, day, convs, lsn0):
    rows = [
        ("I", lsn0 + i, day * DAY + i, c, i, "user", f"d{day}-{c}-{i}", None)
        for c in convs
        for i in range(2)
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    fields = [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
    ]
    return spark.createDataFrame(pdf, T.StructType(fields))


def test_tag_read_expire_vacuum_contract(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "t")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=2, storage=storage_factory(root)
    )
    t.merge(_changes(spark, 1, ["a"], 0), 0)
    v1 = t.current_version()
    t.tag("prod", v1)
    t.merge(_changes(spark, 2, ["b"], 10), 1)
    t.merge(_changes(spark, 3, ["c"], 20), 2)
    assert t.tags() == {"prod": v1}

    # read-by-name equals read-by-version (time travel by ref)
    got = sorted(r["text"] for r in t.read(tag="prod").collect())
    assert got == sorted(r["text"] for r in t.read(version=v1).collect())
    assert len(got) == 2

    # expire everything but the newest: the tagged snapshot SURVIVES
    expired = t.expire_snapshots(keep_last=1)
    assert v1 not in expired
    assert t.manifest(v1)["version"] == v1  # still readable

    # vacuum keeps the tagged snapshot's data files referenced
    t.vacuum(keep_versions=1, grace_s=0.0)
    assert t.read(tag="prod").count() == 2

    # untag releases it: next expire removes it, vacuum collects its files
    assert t.untag("prod") is True
    assert t.untag("prod") is False
    expired = t.expire_snapshots(keep_last=1)
    assert v1 in expired
    with pytest.raises(FileNotFoundError):
        t.read(version=v1).collect()

    # misuse surface
    with pytest.raises(FileNotFoundError):
        t.read(tag="nope")
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.read(version=0, tag="x")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("../escape")
    with pytest.raises(FileNotFoundError):
        t.tag("gone", version=v1)  # that snapshot is expired

    # replace semantics: second same-name tag fails unless replace=True
    t.tag("rc", t.current_version())
    with pytest.raises(ValueError, match="already exists"):
        t.tag("rc", t.current_version())
    t.merge(_changes(spark, 4, ["d"], 30), 3)
    t.tag("rc", t.current_version(), replace=True)
    assert t.tags()["rc"] == t.current_version()


def test_history_shows_tags(spark, tmp_root):
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "h"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    t.merge(_changes(spark, 1, ["a"], 0), 0)
    t.tag("v1-audit")
    t.merge(_changes(spark, 2, ["b"], 10), 1)
    h = {r["version"]: r["tags"] for r in t.history().collect()}
    tagged = [v for v, tags in h.items() if tags]
    assert tagged == [1] and h[1] == ["v1-audit"]
