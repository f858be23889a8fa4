"""File-level min/max stats + predicate-pruned reads (ManifestTable.read(where=)).

The capability Iceberg's per-file stats add over the reference's MSCK
partition model (Phase3-DataLoad.py:169-175): a bounded read opens strictly
fewer files, while staying EXACT under merge-on-read (a stale in-range row
must never win a fold whose true winner sits in a pruned out-of-range file).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable

DAY = 86_400


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


def _day_rows(day: int, convs: list[str], lsn0: int):
    return [
        ("I", lsn0 + i, day * DAY + i, c, i, "user", f"d{day}-{c}-{i}", None)
        for c in convs
        for i in range(3)
    ]


def test_manifest_records_file_stats(spark, tmp_root):
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    t.merge(_changes_df(spark, _day_rows(1, ["a", "b"], 0)), 0)
    m = t.manifest()
    assert m["stats_cols"] == ["ts", "conv_id", "turn_idx"]
    all_files = [p for ps in m["files"].values() for p in ps]
    assert all_files and all(p in m["file_stats"] for p in all_files)
    st = m["file_stats"][all_files[0]]
    assert set(st) == {"ts", "conv_id", "turn_idx", "::rows", "::dead"}
    assert "_ts" in st["ts"][0]  # timestamps round-trip through ISO strings
    # three-element entries carry the harvested null count (retention's
    # manifest-only null proof) and ::rows the per-file row count
    assert st["ts"][2] == 0 and st["::rows"][0] > 0


def test_clustered_compaction_enables_file_range_pruning(spark, tmp_root):
    """compact(sort_by=, max_rows_per_file=) — the Iceberg sort-order-
    rewrite / Delta OPTIMIZE analogue.  Every delta epoch spans the WHOLE
    ts range (each delta file's ts stats cover everything, so a window
    read can prune nothing), then a clustered compaction sorts each bucket
    by ts and rolls it into multiple files: consecutive files carry tight
    near-disjoint ranges, and the same window read now skips most of each
    bucket's files.  State must be bit-identical across the rewrite."""
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    lsn = 0
    for e in range(3):  # 3 delta epochs × 4 days × 4 rows, all interleaved
        rows = []
        for day in range(1, 5):
            rows += [
                (
                    "I",
                    lsn + i,
                    day * DAY + e * 1000 + i,
                    f"c{e}-{day}-{i}",
                    i,
                    "user",
                    f"t{e}-{day}-{i}",
                    None,
                )
                for i in range(4)
            ]
            lsn += 4
        t.merge(_changes_df(spark, rows), e, mode="delta")

    def _state(df):
        return sorted(
            (r["conv_id"], r["turn_idx"], r["text"]) for r in df.collect()
        )

    day1 = (
        pd.Timestamp(DAY, unit="s", tz="UTC").to_pydatetime(),
        pd.Timestamp(2 * DAY - 1, unit="s", tz="UTC").to_pydatetime(),
    )
    before = _state(t.read())
    # pre-compaction baseline: every delta file spans all 4 days, so the
    # day-1 window read cannot skip a single file
    assert len(t.read(where={"ts": day1}).inputFiles()) == len(
        t.read().inputFiles()
    )
    out = t.compact(sort_by=["ts"], max_rows_per_file=8)
    assert out["status"] == "Success"
    m = t.manifest()
    assert m["sorted_by"] == ["ts"]
    assert not any(ps for ps in m["delta_files"].values())
    # ~24 rows/bucket rolled at 8 → each bucket is MULTIPLE stats-tight files
    assert all(len(ps) >= 2 for ps in m["files"].values()), m["files"]
    assert _state(t.read()) == before

    full, pruned = t.read(), t.read(where={"ts": day1})
    # clustering made the same window read skip files (at these tiny file
    # sizes a day straddles a file boundary, so require at least one skip
    # per bucket; at scale the skip fraction approaches 1 - window/range)
    assert 0 < len(pruned.inputFiles()) <= len(full.inputFiles()) - 2
    exp = [x for x in before if x[2].split("-")[1] == "1"]
    assert _state(pruned) == exp

    # bad sort column fails loudly, before any job
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sort_by"):
        t.compact(sort_by=["nope"])

    # rebucket rewrites everything anyway, so it can re-establish the
    # clustering for free — state identical, marker recorded, window read
    # still skips files under the new bucket count
    st = t.rebucket(4, sort_by=["ts"], max_rows_per_file=8)
    assert st["status"] == "Success"
    m2 = t.manifest()
    assert m2["sorted_by"] == ["ts"] and m2["n_buckets"] == 4
    assert _state(t.read()) == before
    full2, pruned2 = t.read(), t.read(where={"ts": day1})
    assert 0 < len(pruned2.inputFiles()) < len(full2.inputFiles())
    assert _state(pruned2) == exp
    with _pytest.raises(ValueError, match="sort_by"):
        t.rebucket(8, sort_by=["nope"])


def test_clustering_survives_the_writer_at_scale(spark, tmp_root):
    """The dynamic-partition writer (`partitionBy("_pb")`) inserts its own
    sort when the incoming ordering is on a different attribute, which
    SCRAMBLES the sort_by order at real row counts (a stable sort masks it
    on tiny inputs).  Pin the true invariant at 40k rows: after a clustered
    compaction, each bucket's rolled files carry pairwise NON-OVERLAPPING
    ts ranges, and a narrow window opens ~one file per bucket."""
    from pyspark.sql import functions as F

    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=8
    )
    n = 40_000
    ch = spark.range(n).select(
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
        F.timestamp_seconds(F.lit(DAY) + F.col("id")).alias("ts"),
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    t.merge(ch, 0, mode="delta")
    t.compact(sort_by=["ts"], max_rows_per_file=1000)
    m = t.manifest()
    assert m["sorted_by"] == ["ts"]
    total_files = 0
    for b, paths in m["files"].items():
        assert len(paths) >= 4, (b, len(paths))  # ~5k rows rolled at 1k
        total_files += len(paths)
        ranges = sorted(
            (
                m["file_stats"][p]["ts"][0]["_ts"],
                m["file_stats"][p]["ts"][1]["_ts"],
            )
            for p in paths
        )
        for (_, prev_max), (nxt_min, _) in zip(ranges, ranges[1:]):
            assert nxt_min >= prev_max, (b, ranges)

    # a 30-minute window (~4.5% of the range) opens at most 2 files/bucket
    win = (
        pd.Timestamp(DAY + 20_000, unit="s", tz="UTC").to_pydatetime(),
        pd.Timestamp(DAY + 21_800, unit="s", tz="UTC").to_pydatetime(),
    )
    pruned = t.read(where={"ts": win})
    assert 0 < len(pruned.inputFiles()) <= 16 < total_files
    assert pruned.count() == 1801


def test_ts_bounded_read_opens_fewer_files(spark, tmp_root):
    """Two days land in disjoint bucket sets (disjoint conv ids) → a
    ts-bounded read must skip the other day's files entirely."""
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=8
    )
    t.merge(_changes_df(spark, _day_rows(1, ["a", "b", "c", "d"], 0)), 0)
    t.merge(_changes_df(spark, _day_rows(2, ["e", "f", "g", "h"], 100)), 1)

    full = t.read()
    day1 = (
        pd.Timestamp(DAY, unit="s", tz="UTC").to_pydatetime(),
        pd.Timestamp(2 * DAY - 1, unit="s", tz="UTC").to_pydatetime(),
    )
    pruned = t.read(where={"ts": day1})
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())

    exp = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in full.filter(
            (full["ts"] >= day1[0]) & (full["ts"] <= day1[1])
        ).collect()
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in pruned.collect()
    )
    assert got == exp and len(got) == 12


def test_key_bounded_read_prunes_delta_files(spark, tmp_root):
    """Key-column bounds are safe (and applied) even under merge-on-read:
    each single-conv delta epoch writes one file; a conv-bounded read opens
    only that conv's file."""
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    t.merge(_changes_df(spark, _day_rows(1, ["aaa"], 0)), 0, mode="delta")
    t.merge(_changes_df(spark, _day_rows(1, ["zzz"], 50)), 1, mode="delta")
    pruned = t.read(where={"conv_id": ("aaa", "aaa")})
    assert len(pruned.inputFiles()) == 1
    assert sorted(r["text"] for r in pruned.collect()) == [
        "d1-aaa-0", "d1-aaa-1", "d1-aaa-2",
    ]


def test_mor_ts_pruning_is_safe_not_stale(spark, tmp_root):
    """The MOR hazard: key k has a base row in the queried ts range and a
    NEWER delta row outside it.  Naive base/delta pruning would return the
    stale base row; the engine must return nothing for k (its live version
    is out of range).  The in-range base file is KEPT (only provably
    out-of-range base files ever prune), the delta row wins the fold, and
    the bound filter excludes it."""
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    t.merge(_changes_df(spark, [("I", 0, DAY, "k", 0, "user", "old", None)]), 0)
    t.merge(
        _changes_df(spark, [("U", 1, 3 * DAY, "k", 0, "user", "new", None)]),
        1,
        mode="delta",
    )
    day1 = (
        pd.Timestamp(0, unit="s", tz="UTC").to_pydatetime(),
        pd.Timestamp(2 * DAY, unit="s", tz="UTC").to_pydatetime(),
    )
    assert t.read(where={"ts": day1}).count() == 0
    # and after compaction the bucket is delta-free: same answer, with
    # temporal pruning now unlocked
    t.compact()
    assert t.read(where={"ts": day1}).count() == 0
    full_day3 = t.read(
        where={"ts": (pd.Timestamp(3 * DAY, unit="s", tz="UTC").to_pydatetime(), None)}
    )
    assert [r["text"] for r in full_day3.collect()] == ["new"]


def test_pruning_survives_vacuum_and_time_travel(spark, tmp_root):
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    t.merge(_changes_df(spark, _day_rows(1, ["a", "b"], 0)), 0)
    t.merge(_changes_df(spark, _day_rows(2, ["c", "d"], 50)), 1)
    m0 = t.manifest(1)
    assert all(
        p in m0["file_stats"] for ps in m0["files"].values() for p in ps
    )
    # bounds on a column with no recorded stats → no pruning, still exact
    got = t.read(where={"role": ("user", "user")})
    assert got.count() == 12


def test_point_lookup_prunes_to_one_bucket(spark, tmp_root):
    """Equality bound on the bucket column = exact hash-bucket pruning: the
    read opens only the key's own bucket's files, with or without useful
    column stats (hash buckets have wide key ranges by construction)."""
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=8
    )
    convs = [f"c{i}" for i in range(16)]
    t.merge(_changes_df(spark, _day_rows(1, convs, 0)), 0)
    m = t.manifest()
    n_buckets_written = len([b for b, ps in m["files"].items() if ps])
    assert n_buckets_written > 1

    got = t.read(where={"conv_id": ("c3", "c3")})
    rows = got.collect()
    assert sorted(r["text"] for r in rows) == ["d1-c3-0", "d1-c3-1", "d1-c3-2"]
    # only one bucket's files planned
    dirs = {p.split("/_pb=")[1].split("/")[0] for p in got.inputFiles()}
    assert len(dirs) == 1

    # the same point lookup stays exact (and single-bucket) under MOR
    t.merge(
        _changes_df(spark, [("U", 999, 5 * DAY, "c3", 0, "user", "upd", None)]),
        1,
        mode="delta",
    )
    got2 = t.read(where={"conv_id": ("c3", "c3")})
    assert sorted(r["text"] for r in got2.collect()) == ["d1-c3-1", "d1-c3-2", "upd"]


def test_mor_base_prunes_when_all_deltas_out_of_range(spark, tmp_root):
    """Round-4 rule: in a delta-carrying bucket, a base file prunes on a
    non-key bound when EVERY delta file of the bucket is provably out of
    range on it — the winner of any key the pruned file held is
    out-of-range regardless of which side wins the fold."""
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=1
    )
    # base: day-1 rows for convs a,b (CoW); delta: day-5 update to a
    t.merge(_changes_df(spark, _day_rows(1, ["a", "b"], 0)), 0)
    t.merge(
        _changes_df(spark, [("U", 99, 5 * DAY, "a", 0, "user", "a-upd", None)]),
        1,
        mode="delta",
    )
    m = t.manifest()
    assert m.get("delta_files") and m["files"]  # the one bucket carries both

    def bounds(lo_day, hi_day):
        return (
            pd.Timestamp(lo_day * DAY, unit="s", tz="UTC").to_pydatetime(),
            pd.Timestamp(hi_day * DAY, unit="s", tz="UTC").to_pydatetime(),
        )

    # query day 10-11: base (day 1) AND delta (day 5) both out of range →
    # the base file is PRUNED even though its bucket carries deltas
    base_f, delta_f = t._pruned_files(m, {"ts": bounds(10, 11)})
    assert base_f == [] and len(delta_f) == 1  # deltas always kept
    assert t.read(where={"ts": bounds(10, 11)}).count() == 0

    # query day 1 only: delta (day 5) provably disjoint → base may prune on
    # ts; the day-1 base file is IN range so it is kept — and the fold stays
    # exact: conv a's winner is the (out-of-range) day-5 update, so only b
    # comes back, plus a's un-updated turns
    base_f, delta_f = t._pruned_files(m, {"ts": bounds(1, 2)})
    assert len(base_f) == 1 and len(delta_f) == 1
    full = t.read()
    d1 = bounds(1, 2)
    exp = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in full.filter((full["ts"] >= d1[0]) & (full["ts"] <= d1[1])).collect()
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(where={"ts": d1}).collect()
    )
    assert got == exp and ("a", 0, "d1-a-0") not in got and len(got) == 5

    # query day 5: the delta IS in range → not provably disjoint → base
    # pruning on ts stays disabled (a pruned base winner could otherwise
    # hand the fold to an in-range LOWER-version delta row — the stale
    # resurrection hazard); base kept, result exact: only the update
    base_f, delta_f = t._pruned_files(m, {"ts": bounds(5, 6)})
    assert len(base_f) == 1 and len(delta_f) == 1
    assert [r["text"] for r in t.read(where={"ts": bounds(5, 6)}).collect()] == [
        "a-upd"
    ]

    # a SECOND delta file overlapping day 1 disables ts-pruning of base
    # (not every delta is provably disjoint anymore) — conservative again
    t.merge(
        _changes_df(spark, [("U", 100, DAY + 10, "b", 1, "user", "b-upd", None)]),
        2,
        mode="delta",
    )
    m2 = t.manifest()
    base_f, delta_f = t._pruned_files(m2, {"ts": bounds(1, 2)})
    assert len(base_f) == 1 and len(delta_f) == 2
    got2 = sorted(r["text"] for r in t.read(where={"ts": bounds(1, 2)}).collect())
    assert got2 == ["b-upd", "d1-a-1", "d1-a-2", "d1-b-0", "d1-b-2"]
    # ...but both deltas ARE disjoint from day 10-11, so base prunes there
    base_f, delta_f = t._pruned_files(m2, {"ts": bounds(10, 11)})
    assert base_f == [] and len(delta_f) == 2
    assert t.read(where={"ts": bounds(10, 11)}).count() == 0


def test_zorder_clustering_prunes_on_every_clustered_dim(spark, tmp_root):
    """compact(zorder_by=) — the Delta OPTIMIZE ZORDER / Iceberg z-order
    analogue.  A lexicographic sort_by=["ts"] makes files tight on ts but
    every file still spans the FULL turn_idx range, so a turn_idx-bounded
    read prunes nothing; the Morton-interleaved sort makes files tight on
    BOTH dims at once, so reads bounded on either dim (or a box on both)
    skip most files.  40k rows so the dynamic-partition writer's re-sort
    hazard (stable-sort-masked on tiny inputs) is exercised too.  All
    assertions are file COUNTS from manifest stats — deterministic, no
    timing."""
    from pyspark.sql import functions as F

    n = 40_000
    # two independent uniform dims: turn_idx = id % 200, ts offset a
    # coprime multiplicative scramble of id (bijective on [0, 40000))
    ch = spark.range(n).select(
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
        F.timestamp_seconds(F.lit(DAY) + (F.col("id") * 7919) % n).alias("ts"),
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 200).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )

    def _mk(name, **compact_kw):
        t = ManifestTable.create(
            spark, os.path.join(tmp_root, name), TRANSCRIPT_SCHEMA, n_buckets=8
        )
        t.merge(ch, 0, mode="delta")
        out = t.compact(max_rows_per_file=500, **compact_kw)
        assert out["status"] == "Success"
        return t

    tz = _mk("z", zorder_by=["ts", "turn_idx"])
    tl = _mk("l", sort_by=["ts"])
    mz, ml = tz.manifest(), tl.manifest()
    assert mz["zordered_by"] == ["ts", "turn_idx"] and mz["sorted_by"] == []
    total_z = sum(len(ps) for ps in mz["files"].values())
    total_l = sum(len(ps) for ps in ml["files"].values())
    assert total_z >= 64 and total_l >= 64  # ~5k rows/bucket rolled at 500

    import pandas as _pd

    def _ts(lo, hi):  # [lo, hi] second offsets within the day
        return (
            _pd.Timestamp(DAY + lo, unit="s", tz="UTC").to_pydatetime(),
            _pd.Timestamp(DAY + hi, unit="s", tz="UTC").to_pydatetime(),
        )

    def _files(t, where):
        return len(t.read(where=where).inputFiles())

    # 1) leading-dim window: both layouts skip
    w_ts = {"ts": _ts(0, 4_999)}  # 1/8 of the range -> 5000 rows
    assert tz.read(where=w_ts).count() == 5_000
    assert _files(tz, w_ts) < total_z
    assert _files(tl, w_ts) < total_l

    # 2) second-dim window: THE z-order capability.  Every linear file
    # spans the full turn_idx range (no skip possible); z-ordered files
    # carry tight turn_idx stats and most are skipped.
    w_ti = {"turn_idx": (0, 24)}  # 1/8 of the dim -> 5000 rows
    assert tz.read(where=w_ti).count() == 5_000
    assert tl.read(where=w_ti).count() == 5_000
    # linear: essentially no skip — every ts-sorted file spans ~the full
    # turn_idx range (a bucket's small TAIL file can miss the window by
    # luck, hence the -2 slack, but there is no systematic pruning)
    assert _files(tl, w_ti) >= total_l - 2
    assert _files(tz, w_ti) <= total_z // 2, (
        _files(tz, w_ti),
        total_z,
    )

    # 3) box on both dims: intersection prunes at least as hard as either
    box = {"ts": _ts(0, 4_999), "turn_idx": (0, 24)}
    exp_box = tz.read().filter(
        (F.col("turn_idx") <= 24)
        & (F.col("ts") < F.timestamp_seconds(F.lit(DAY + 5_000)))
    ).count()
    got_box = tz.read(where=box)
    assert got_box.count() == exp_box > 0
    assert _files(tz, box) <= min(_files(tz, w_ts), _files(tz, w_ti))

    # state identical across the z-ordered rewrite (vs the linear twin)
    key = lambda r: (r["conv_id"], r["turn_idx"], r["text"])  # noqa: E731
    assert sorted(map(key, tz.read().collect())) == sorted(
        map(key, tl.read().collect())
    )

    # per-file tightness: the MEDIAN z-ordered file spans well under half
    # of each clustered dim (a scrambled write would span ~the full range
    # on both — this is the writer-resort pin for the z path)
    def _widths(m, col, parse):
        out = []
        for ps in m["files"].values():
            for p in ps:
                lo, hi = m["file_stats"][p][col][:2]
                out.append(parse(hi) - parse(lo))
        out.sort()
        return out

    ts_w = _widths(mz, "ts", lambda v: _pd.Timestamp(v["_ts"]).timestamp())
    ti_w = _widths(mz, "turn_idx", lambda v: v)
    assert ts_w[len(ts_w) // 2] <= n / 2
    assert ti_w[len(ti_w) // 2] <= 100

    # validation surface: fails loudly before any job
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        tz.compact(sort_by=["ts"], zorder_by=["turn_idx"])
    with _pytest.raises(ValueError, match="numeric/timestamp"):
        tz.compact(zorder_by=["conv_id"])
    with _pytest.raises(ValueError, match="not in schema"):
        tz.rebucket(16, zorder_by=["nope"])

    # rebucket re-establishes the z-clustering under a new bucket count
    st = tz.rebucket(4, zorder_by=["ts", "turn_idx"], max_rows_per_file=500)
    assert st["status"] == "Success"
    m3 = tz.manifest()
    assert m3["zordered_by"] == ["ts", "turn_idx"]
    total3 = sum(len(ps) for ps in m3["files"].values())
    assert tz.read(where=w_ti).count() == 5_000
    assert _files(tz, w_ti) <= total3 // 2


def test_optimize_clusters_a_cow_table_in_place(spark, tmp_root):
    """compact(min_delta_files=0) — OPTIMIZE semantics.  A copy-on-write
    table never accumulates delta files, so the default fold is a permanent
    no-op on it; min_delta_files=0 rewrites every bucket anyway, which is
    the only in-place way to (re)cluster CoW state.  The rewrite must be
    state-preserving (change feed sees ZERO changes across it) and the
    clustering must take effect."""
    from pyspark.sql import functions as F

    n = 20_000
    ch = spark.range(n).select(
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
        F.timestamp_seconds(F.lit(DAY) + (F.col("id") * 7919) % n).alias("ts"),
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 100).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    t.merge(ch, 0)  # CoW (default mode): no delta files anywhere
    v0 = t.current_version()
    before = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.read().collect()
    )

    # default compact: permanent no-op on a CoW table
    out = t.compact()
    assert out["status"] == "Skipped" and "no delta files" in out["reason"]

    # OPTIMIZE: rewrite + z-cluster every bucket in place
    out = t.compact(
        min_delta_files=0, zorder_by=["ts", "turn_idx"], max_rows_per_file=500
    )
    assert out["status"] == "Success"
    m = t.manifest()
    assert m["zordered_by"] == ["ts", "turn_idx"]
    assert m["epoch_id"].startswith("compact:")
    total = sum(len(ps) for ps in m["files"].values())
    assert total >= 32  # ~5k rows/bucket rolled at 500
    after = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.read().collect()
    )
    assert after == before

    # state-preserving: the change feed across the optimize is EMPTY and
    # stays on the fast path (no O(table) snapshot diff)
    assert t.changes(v0).count() == 0
    assert t._append_candidates(v0, t.current_version(),
                                t.manifest(v0), m) is not None

    # the clustering is real: a second-dim window skips files (at only
    # ~10 files/bucket the curve's perimeter cost caps the skip fraction
    # — the 40k-row test above pins the asymptotic behavior)
    w = t.read(where={"turn_idx": (0, 12)})
    assert w.count() == n * 13 // 100
    assert len(w.inputFiles()) <= total * 2 // 3


def test_clustering_marker_carries_through_delta_not_cow(spark, tmp_root):
    """The manifest's sorted_by/zordered_by markers survive DELTA commits
    (which never touch base files) and are dropped by CoW commits (which
    rewrite touched buckets unsorted) — the marker always states what is
    true of the base files."""
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    rows = _day_rows(1, ["a", "b"], 0)
    t.merge(_changes_df(spark, rows), 0, mode="delta")
    t.compact(sort_by=["ts"], max_rows_per_file=4)
    assert t.manifest()["sorted_by"] == ["ts"]

    # delta commit: base files untouched -> marker carries forward
    t.merge(_changes_df(spark, _day_rows(2, ["c"], 100)), 1, mode="delta")
    assert t.manifest()["sorted_by"] == ["ts"]

    # CoW commit: touched buckets rewritten unsorted -> marker dropped
    t.merge(_changes_df(spark, _day_rows(3, ["d"], 200)), 2)
    assert t.manifest()["sorted_by"] == []
    assert t.manifest()["zordered_by"] == []


def test_bytes_targeted_file_sizing(spark, tmp_root):
    """compact(max_file_bytes=) — the Delta-OPTIMIZE-style BYTES target.
    The rows-per-file cap is derived from the fold's own input footprint
    (object sizes / manifest rows, driver-side), so rolled files land near
    the byte target regardless of row width.  Compression shifts after a
    sort, so the contract is approximate: every rolled file ≤ ~2.5× the
    target and each bucket rolls into MULTIPLE files."""
    from pyspark.sql import functions as F

    n = 20_000
    ch = spark.range(n).select(
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
        F.timestamp_seconds(F.lit(DAY) + F.col("id")).alias("ts"),
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        # incompressible-ish payload so sizes are meaningful
        F.sha2(F.concat(F.lit("s"), F.col("id")), 256).alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    t.merge(ch, 0, mode="delta")
    target = 64 * 1024
    out = t.compact(sort_by=["ts"], max_file_bytes=target)
    assert out["status"] == "Success"
    m = t.manifest()
    sizes = {
        o.key: o.size
        for ps in m["files"].values()
        for d in {p.rsplit("/", 1)[0] for p in ps}
        for o in t.storage.list(d)
    }
    per_bucket = {b: len(ps) for b, ps in m["files"].items()}
    assert all(c >= 2 for c in per_bucket.values()), per_bucket
    for ps in m["files"].values():
        for p in ps:
            assert sizes[p] <= target * 2.5, (p, sizes[p])
    # state intact and clustering still applied
    assert t.read().count() == n
    assert m["sorted_by"] == ["ts"]

    # mutual exclusion fails fast
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        t.compact(min_delta_files=0, max_rows_per_file=10, max_file_bytes=10)
    with _pytest.raises(ValueError, match="mutually exclusive"):
        t.rebucket(8, max_rows_per_file=10, max_file_bytes=10)

    # rebucket honors the bytes target too
    st = t.rebucket(2, sort_by=["ts"], max_file_bytes=target)
    assert st["status"] == "Success"
    m2 = t.manifest()
    assert all(len(ps) >= 2 for ps in m2["files"].values())


def test_set_stats_cols_then_optimize_backfills_pruning(spark, tmp_root):
    """stats_cols are frozen at create, but evolution keeps adding columns
    readers want to skip on.  set_stats_cols() is a METADATA-ONLY commit
    (reads stay exact immediately — missing stats are kept conservatively);
    the next rewrite backfills per-file stats, here at once via
    compact(min_delta_files=0).  The metadata commit must not break the
    change feed's fast path."""
    from pyspark.sql import functions as F

    n = 8_000
    base = spark.range(n).select(
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
        F.timestamp_seconds(F.lit(DAY) + F.col("id")).alias("ts"),
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "t"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    t.merge(base, 0, mode="delta")
    # evolve a score column in (the added column has NO stats harvesting)
    scored = base.withColumn("lsn", F.col("lsn") + n).withColumn(
        "score", (F.col("lsn") % 100).cast("double")
    )
    t.merge(scored, 1, mode="delta")
    assert "score" not in (t.manifest().get("stats_cols") or [])
    v1 = t.current_version()

    st = t.set_stats_cols(["ts", "conv_id", "turn_idx", "score"])
    assert st["status"] == "Success"
    m = t.manifest()
    assert m["epoch_id"] == f"set-stats:{m['version']}"
    # metadata-only: reads exact right away (missing stats kept), and a
    # score-bounded read can't prune yet
    full = t.read()
    w = {"score": (0.0, 9.0)}
    exp = full.filter(F.col("score") <= 9.0).count()
    assert t.read(where=w).count() == exp > 0
    assert len(t.read(where=w).inputFiles()) == len(full.inputFiles())

    # change feed ACROSS the metadata commit stays on the fast path
    assert t._append_candidates(
        v1, t.current_version(), t.manifest(v1), t.manifest()
    ) is not None
    assert t.changes(v1).count() == 0

    # OPTIMIZE backfills stats for the new column -> pruning kicks in
    out = t.compact(min_delta_files=0, sort_by=["score"], max_rows_per_file=500)
    assert out["status"] == "Success"
    m2 = t.manifest()
    some_file = next(p for ps in m2["files"].values() for p in ps)
    assert "score" in m2["file_stats"][some_file]
    pruned = t.read(where=w)
    assert pruned.count() == exp
    assert len(pruned.inputFiles()) < len(t.read().inputFiles())

    # history labels the metadata commit
    ops = {r["version"]: r["operation"] for r in t.history().collect()}
    assert "set-stats" in ops.values()

    # misuse: unknown column, unchanged list
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stats_cols not in schema"):
        t.set_stats_cols(["nope"])
    again = t.set_stats_cols(["ts", "conv_id", "turn_idx", "score"])
    assert again["status"] == "Skipped"
