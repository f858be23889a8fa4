"""Null-predicate file pruning: ``read(where={col: "is_null"/"not_null"})``.

The data-quality scan shape — "find transcript rows missing their tool
column" — that at 10^10 rows must SKIP every healthy file.  The harvested
per-file null counts ([min, max, null_count] stats entries, all-null files
as [None, None, n]) prove null-freeness / all-nullness from the manifest
alone; is_null on the bucket column additionally pins the single bucket
every null key hashes to (Spark hash expressions skip null inputs → seed).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.hashing import SPARK_HASH_SEED
from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable


def _changes_df(spark, rows):
    cols = ["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"]
    pdf = pd.DataFrame(rows, columns=cols)
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


def _mk(spark, root, rows, n_buckets=2, **create_kw):
    t = ManifestTable.create(
        spark,
        root,
        TRANSCRIPT_SCHEMA,
        n_buckets=n_buckets,
        stats_cols=["ts", "conv_id", "turn_idx", "tool"],
        **create_kw,
    )
    t.merge(_changes_df(spark, rows), 0, mode="delta")
    return t


def _rows(n, tool_of):
    return [
        ("I", i, 1_700_000_000 + i, f"c{i:04d}", 0, "user", f"t{i}", tool_of(i))
        for i in range(n)
    ]


def _base_counts(t, where):
    m = t.manifest()
    base, delta = t._pruned_files(m, where)
    n_all = sum(len(ps) for ps in m["files"].values())
    return len(base), n_all


def test_is_null_prunes_null_free_files(spark, tmp_root):
    # nulls only in the low-i rows; sort-cluster by tool so whole files
    # are null-free (nulls sort first per bucket)
    t = _mk(
        spark,
        os.path.join(tmp_root, "t"),
        _rows(400, lambda i: None if i % 10 == 0 else f"tool{i % 7}"),
    )
    st = t.compact(sort_by=["tool"], max_rows_per_file=50)
    assert st["status"] == "Success", st

    got = t.read(where={"tool": "is_null"})
    want = t.read().filter(F.col("tool").isNull())
    assert sorted(r["conv_id"] for r in got.collect()) == sorted(
        r["conv_id"] for r in want.collect()
    )
    kept, n_all = _base_counts(t, {"tool": "is_null"})
    assert 0 < kept < n_all  # the null-free majority was never opened


def test_not_null_prunes_all_null_files(spark, tmp_root):
    t = _mk(
        spark,
        os.path.join(tmp_root, "t"),
        _rows(400, lambda i: f"tool{i % 7}" if i % 10 == 0 else None),
    )
    st = t.compact(sort_by=["tool"], max_rows_per_file=50)
    assert st["status"] == "Success", st

    # all-null files carry the [None, None, n] stats form
    m = t.manifest()
    forms = [
        m["file_stats"][p]["tool"]
        for ps in m["files"].values()
        for p in ps
    ]
    assert any(e[0] is None and e[2] > 0 for e in forms)

    got = t.read(where={"tool": "not_null"})
    want = t.read().filter(F.col("tool").isNotNull())
    assert sorted(r["conv_id"] for r in got.collect()) == sorted(
        r["conv_id"] for r in want.collect()
    )
    kept, n_all = _base_counts(t, {"tool": "not_null"})
    assert 0 < kept < n_all  # the all-null majority was never opened


def test_all_null_file_prunes_under_range_bound(spark, tmp_root):
    """A file all-null on the bound column cannot satisfy an ACTUAL range
    bound (nulls fail every comparison) — but a (None, None) no-op bound
    applies no filter and must keep it."""
    t = _mk(
        spark,
        os.path.join(tmp_root, "t"),
        _rows(400, lambda i: f"tool{i % 7}" if i % 10 == 0 else None),
    )
    t.compact(sort_by=["tool"], max_rows_per_file=50)

    got = t.read(where={"tool": ("tool0", "tool9")})
    want = t.read().filter(F.col("tool").between("tool0", "tool9"))
    assert got.count() == want.count() > 0
    kept_bound, n_all = _base_counts(t, {"tool": ("tool0", "tool9")})
    kept_noop, _ = _base_counts(t, {"tool": (None, None)})
    assert kept_bound < n_all
    assert kept_noop == n_all
    assert t.read(where={"tool": (None, None)}).count() == t.read().count()


def test_is_null_bucket_pin_on_key_column(spark, tmp_root):
    """is_null on the bucket column reads only the bucket null keys hash
    to — pmod(seed, n_buckets), byte-identical to Spark's assignment."""
    n_buckets = 8
    rows = _rows(100, lambda i: "x")
    rows += [
        ("I", 1000 + j, 1_700_100_000 + j, None, j, "user", f"nk{j}", None)
        for j in range(5)
    ]
    t = _mk(spark, os.path.join(tmp_root, "t"), rows, n_buckets=n_buckets)

    # the pin is Spark's own null-input hash semantic
    pin = (
        spark.range(1)
        .select(
            F.pmod(
                F.xxhash64(F.lit(None).cast("string")), F.lit(n_buckets)
            ).cast("int").alias("b")
        )
        .collect()[0]["b"]
    )
    assert pin == SPARK_HASH_SEED % n_buckets

    got = t.read(where={"conv_id": "is_null"})
    assert sorted(r["text"] for r in got.collect()) == [
        f"nk{j}" for j in range(5)
    ]
    m = t.manifest()
    base, delta = t._pruned_files(m, {"conv_id": "is_null"})
    in_pin = set(m["files"].get(str(pin), [])) | set(
        (m.get("delta_files") or {}).get(str(pin), [])
    )
    rel = [p.rsplit(t.root + "/", 1)[-1] for p in base + delta]
    assert rel and all(p in in_pin for p in rel)


def test_mor_null_pruning_folds_correctly(spark, tmp_root):
    """A newer delta row flipping tool NULL<->value must win the fold under
    null-predicate reads — the MOR gate (base prunes on a non-key column
    only when every delta file of the bucket is provably disjoint) keeps
    the fold exact in both directions."""
    t = _mk(
        spark,
        os.path.join(tmp_root, "t"),
        _rows(40, lambda i: None if i < 20 else "x"),
    )
    # newer versions: c0000 gains a tool (leaves is_null), c0025 loses
    # its tool (enters is_null)
    upd = [
        ("U", 9000, 1_700_200_000, "c0000", 0, "user", "t0", "fixed"),
        ("U", 9001, 1_700_200_001, "c0025", 0, "user", "t25", None),
    ]
    t.merge(_changes_df(spark, upd), 1, mode="delta")

    got_null = {r["conv_id"] for r in t.read(where={"tool": "is_null"}).collect()}
    want_null = {
        r["conv_id"]
        for r in t.read().filter(F.col("tool").isNull()).collect()
    }
    assert got_null == want_null
    assert "c0000" not in got_null and "c0025" in got_null

    got_nn = {r["conv_id"] for r in t.read(where={"tool": "not_null"}).collect()}
    assert "c0000" in got_nn and "c0025" not in got_nn


def test_legacy_two_element_stats_never_prune_on_nullness(spark, tmp_root):
    """Manifests written before the null-count harvest carry [min, max]
    entries — nullness is unprovable there, so every file is kept."""
    t = _mk(
        spark,
        os.path.join(tmp_root, "t"),
        _rows(200, lambda i: None if i % 10 == 0 else f"tool{i % 7}"),
    )
    t.compact(sort_by=["tool"], max_rows_per_file=50)
    m = t.manifest()
    legacy = dict(
        m,
        file_stats={
            p: {c: v[:2] for c, v in st.items() if c != "::rows"}
            for p, st in m["file_stats"].items()
        },
    )
    n_all = sum(len(ps) for ps in m["files"].values())
    base, _ = t._pruned_files(legacy, {"tool": "is_null"})
    assert len(base) == n_all
    base, _ = t._pruned_files(legacy, {"tool": "not_null"})
    assert len(base) == n_all


def test_where_misuse_raises(spark, tmp_root):
    t = _mk(spark, os.path.join(tmp_root, "t"), _rows(10, lambda i: None))
    try:
        t.read(where={"tool": "bogus"})
        assert False, "expected ValueError"
    except ValueError as e:
        assert "is_null" in str(e) and "bogus" in str(e)
