"""SCD2 history tables (`sinks/scd2.SCD2Table`): every change event
becomes a version row with a validity interval.

Pins: (1) handwritten interval chains on a crafted stream (upsert chains,
deletes, delete-then-reinsert, equal-ts lsn tie-break); (2) batch-split
invariance — K in-order applies equal one apply, byte for byte; (3)
``current()`` equals the latest-state ``ManifestTable`` built from the
same stream (same (ts, lsn) max-version rule); (4) exactly-once — epoch
redelivery is a ledger no-op and cross-batch event redelivery is trimmed;
(5) ``mode="repair"`` converges to the in-order history under arbitrary
cross-batch delivery order (the generated WAL's out-of-order segments);
(6) as-of slices reproduce the state at any instant; (7) additive schema
evolution mid-stream; (8) misuse errors are curated.  Parameterized over
both storage backends where table layout matters.

The payload is transcripts-shaped — key (conv_id, turn_idx), payload
(role, text, tool, ts) — the input_hint table of the north rule.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from conftest import assert_pdf_equal

from event_driven_etl_msc_research_spark.datagen import (
    ChangeStreamSpec,
    generate_change_stream,
)
from event_driven_etl_msc_research_spark.oracle import oracle_final_state
from event_driven_etl_msc_research_spark.schemas import (
    CHANGE_EVENT_SCHEMA_EVOLVED,
)
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable
from event_driven_etl_msc_research_spark.sinks.scd2 import SCD2Table

PAYLOAD = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
KEYS = ["conv_id", "turn_idx"]
HIST_COLS = [
    "conv_id",
    "turn_idx",
    "vf_lsn",
    "change_op",
    "valid_from",
    "valid_to",
    "is_last",
    "is_current",
]


def _batch(spark, rows):
    """rows: (op, lsn, conv_id, turn_idx, role, text, tool, ts_str)"""
    return spark.createDataFrame(
        rows,
        "op string, lsn long, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _ts(h):
    return f"2024-01-01 {h:02d}:00:00"


# one conversation turn edited twice then deleted; another stable; a
# delete-then-reinsert; an equal-ts pair where lsn breaks the tie
ROWS = [
    ("U", 1, "a", 0, "user", "v1", None, _ts(1)),
    ("U", 3, "a", 0, "user", "v2", None, _ts(3)),
    ("D", 5, "a", 0, None, None, None, _ts(5)),
    ("U", 2, "b", 0, "assistant", "stable", "search", _ts(2)),
    ("D", 4, "c", 0, None, None, None, _ts(4)),
    ("U", 6, "c", 0, "user", "reborn", None, _ts(6)),
    ("U", 7, "d", 0, "user", "tie-old", None, _ts(7)),
    ("U", 8, "d", 0, "user", "tie-new", None, _ts(7)),
]


def _hist(h):
    return {
        tuple(r)
        for r in h.read()
        .select(*HIST_COLS, "role", "text", "tool")
        .collect()
    }


def _mk(spark, root, **kw):
    return SCD2Table.create(
        spark, root, PAYLOAD, key_cols=KEYS, n_buckets=4, **kw
    )


def test_handwritten_interval_chain(spark, tmp_root):
    h = _mk(spark, tmp_root + "/h")
    h.apply(_batch(spark, ROWS), epoch_id=0)
    got = {
        (r.conv_id, r.vf_lsn, r.change_op, str(r.valid_from),
         str(r.valid_to), r.is_last, r.is_current, r.text)
        for r in h.read().collect()
    }
    exp = {
        ("a", 1, "U", _ts(1), _ts(3), False, False, "v1"),
        ("a", 3, "U", _ts(3), _ts(5), False, False, "v2"),
        ("a", 5, "D", _ts(5), _ts(5), True, False, None),
        ("b", 2, "U", _ts(2), "None", True, True, "stable"),
        ("c", 4, "D", _ts(4), _ts(4), False, False, None),
        ("c", 6, "U", _ts(6), "None", True, True, "reborn"),
        ("d", 7, "U", _ts(7), _ts(7), False, False, "tie-old"),
        ("d", 8, "U", _ts(7), "None", True, True, "tie-new"),
    }
    assert got == exp


def test_batch_split_invariance(spark, tmp_root, storage_factory):
    one = _mk(spark, tmp_root + "/one",
              storage=storage_factory(tmp_root + "/one"))
    one.apply(_batch(spark, ROWS), epoch_id=0)
    # split respecting per-key (ts, lsn) order: by lsn here (global order)
    many = _mk(spark, tmp_root + "/many",
               storage=storage_factory(tmp_root + "/many"))
    for i, cut in enumerate([(1, 3), (4, 6), (7, 8)]):
        part = [r for r in ROWS if cut[0] <= r[1] <= cut[1]]
        many.apply(_batch(spark, part), epoch_id=i)
    assert _hist(one) == _hist(many)


def test_current_equals_latest_state_merge(spark, tmp_root):
    h = _mk(spark, tmp_root + "/h")
    t = ManifestTable.create(
        spark, tmp_root + "/t", PAYLOAD, key_cols=KEYS, n_buckets=4
    )
    for i, cut in enumerate([(1, 4), (5, 8)]):
        part = _batch(spark, [r for r in ROWS if cut[0] <= r[1] <= cut[1]])
        h.apply(part, epoch_id=i)
        t.merge(part, epoch_id=i)
    got = h.current().orderBy(*KEYS).toPandas()
    exp = t.read().select(*h.current().columns).orderBy(*KEYS).toPandas()
    assert_pdf_equal(got, exp)


def test_exactly_once_and_redelivery_trim(spark, tmp_root):
    h = _mk(spark, tmp_root + "/h")
    b = _batch(spark, ROWS)
    h.apply(b, epoch_id=0)
    base = _hist(h)
    # epoch redelivery: ledger no-op
    r = h.apply(b, epoch_id=0)
    assert r["status"] == "Skipped"
    # cross-batch redelivery of already-applied events: trimmed to nothing
    r2 = h.apply(_batch(spark, ROWS[:4]), epoch_id=1)
    assert r2["status"] == "Success"
    assert _hist(h) == base
    # a mixed batch (one fresh event + redelivered ones) applies only the
    # fresh event
    fresh = ("U", 9, "b", 0, "assistant", "edited", None, _ts(9))
    h.apply(_batch(spark, [*ROWS[:4], fresh]), epoch_id=2)
    got = {
        (r.vf_lsn, str(r.valid_to), r.is_last)
        for r in h.read().filter("conv_id = 'b'").collect()
    }
    assert got == {(2, _ts(9), False), (9, "None", True)}


def test_repair_out_of_order_converges(spark, tmp_root):
    inorder = _mk(spark, tmp_root + "/in")
    inorder.apply(_batch(spark, ROWS), epoch_id=0)
    ooo = _mk(spark, tmp_root + "/ooo")
    # deliver the stream backwards in three batches — inorder mode would
    # trim these; repair rebuilds the touched keys' chains each time
    for i, cut in enumerate([(7, 8), (4, 6), (1, 3)]):
        part = [r for r in ROWS if cut[0] <= r[1] <= cut[1]]
        ooo.apply(_batch(spark, part), epoch_id=i, mode="repair")
    assert _hist(inorder) == _hist(ooo)


def test_as_of_slices(spark, tmp_root):
    h = _mk(spark, tmp_root + "/h")
    h.apply(_batch(spark, ROWS), epoch_id=0)

    def state(at):
        return {
            (r.conv_id, r.text)
            for r in h.read(at=at).select("conv_id", "text").collect()
        }

    assert state(_ts(2)) == {("a", "v1"), ("b", "stable")}
    assert state(_ts(4)) == {("a", "v2"), ("b", "stable")}
    # at the delete instant the key is gone (zero-width marker)
    assert state(_ts(5)) == {("b", "stable")}
    assert state(_ts(7)) == {
        ("b", "stable"), ("c", "reborn"), ("d", "tie-new"),
    }
    # the open present equals current()
    assert state(_ts(23)) == {
        (r.conv_id, r.text) for r in h.current().collect()
    }


def test_generated_wal_repair_segments_vs_single_batch(spark, tmp_root):
    """The generated WAL delivers out of order ACROSS segment boundaries
    (ooo_window) and redelivers whole segments verbatim — per-segment
    apply therefore uses repair mode, and must converge to (a) the
    single-batch history and (b) the latest-state oracle."""
    spec = ChangeStreamSpec(
        n_events=4_000, n_convs=80, segment_size=500, seed=7,
        dup_segments=(1, 5),
    )
    gen = generate_change_stream(os.path.join(tmp_root, "log"), spec)

    def rd(path):
        return spark.read.schema(CHANGE_EVENT_SCHEMA_EVOLVED).json(path)

    one = SCD2Table.create(
        spark, tmp_root + "/one", T.StructType(CHANGE_EVENT_SCHEMA_EVOLVED.fields[2:]),
        key_cols=KEYS, n_buckets=8,
    )
    one.apply(rd(os.path.join(tmp_root, "log")), epoch_id=0)

    seg = SCD2Table.create(
        spark, tmp_root + "/seg", T.StructType(CHANGE_EVENT_SCHEMA_EVOLVED.fields[2:]),
        key_cols=KEYS, n_buckets=8,
    )
    for i, p in enumerate(gen.segment_paths):
        seg.apply(rd(p), epoch_id=i, mode="repair")

    cols = [c for c in one.read().columns]
    a = one.read().orderBy("conv_id", "turn_idx", "vf_lsn").toPandas()
    b = seg.read().orderBy("conv_id", "turn_idx", "vf_lsn").toPandas()
    assert_pdf_equal(a, b, cols)

    got = (
        seg.current()
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "tool", "tool_meta", "ts")
        .toPandas()
    )
    exp = oracle_final_state(spec)[
        ["conv_id", "turn_idx", "role", "text", "tool", "tool_meta", "ts"]
    ]
    assert_pdf_equal(got, exp)


def test_additive_schema_evolution(spark, tmp_root):
    h = _mk(spark, tmp_root + "/h")
    h.apply(_batch(spark, ROWS[:2]), epoch_id=0)
    evolved = _batch(
        spark, [("U", 9, "a", 0, "user", "v3", "calc", _ts(9))]
    ).withColumn("tool_meta", F.lit('{"v":1}'))
    h.apply(evolved, epoch_id=1)
    rows = {
        (r.vf_lsn, r.tool_meta, r.is_current)
        for r in h.read().filter("conv_id = 'a'").collect()
    }
    assert rows == {(1, None, False), (3, None, False), (9, '{"v":1}', True)}


def test_misuse_errors(spark, tmp_root):
    bad = T.StructType(
        PAYLOAD.fields + [T.StructField("valid_to", T.StringType())]
    )
    with pytest.raises(ValueError, match="SCD2-managed"):
        SCD2Table.create(spark, tmp_root + "/x", bad, key_cols=KEYS)
    no_ts = T.StructType([f for f in PAYLOAD.fields if f.name != "ts"])
    with pytest.raises(ValueError, match="timestamp column 'ts'"):
        SCD2Table.create(spark, tmp_root + "/y", no_ts, key_cols=KEYS)
    # loading a plain latest-state table as SCD2 is rejected
    t = ManifestTable.create(
        spark, tmp_root + "/plain", PAYLOAD, key_cols=KEYS, n_buckets=2
    )
    with pytest.raises(ValueError, match="not an SCD2 table"):
        SCD2Table.load(spark, tmp_root + "/plain")
    h = _mk(spark, tmp_root + "/h")
    with pytest.raises(ValueError, match="inorder|repair"):
        h.apply(_batch(spark, ROWS), epoch_id=0, mode="rewrite")
    with pytest.raises(ValueError, match="missing columns"):
        h.apply(_batch(spark, ROWS).drop("lsn"), epoch_id=0)
    # round-trip: load() recovers keys from the backing manifest
    h.apply(_batch(spark, ROWS), epoch_id=0)
    h2 = SCD2Table.load(spark, tmp_root + "/h")
    assert h2.key_cols == KEYS
    assert _hist(h2) == _hist(h)


def test_streaming_tail_history(spark, tmp_root):
    """CDCEngine.register_history: the tail applies every epoch to the
    SCD2 table on the critical path.  The generated WAL reorders events
    across segment (= micro-batch) boundaries, so the tail uses repair
    mode; the result must equal a single-batch apply, and its current
    slice must equal the engine's latest-state table."""
    from event_driven_etl_msc_research_spark import CDCEngine

    spec = ChangeStreamSpec(
        n_events=3_000, n_convs=60, segment_size=500, seed=11,
        dup_segments=(2,),
    )
    generate_change_stream(os.path.join(tmp_root, "log"), spec)
    payload = T.StructType(CHANGE_EVENT_SCHEMA_EVOLVED.fields[2:])

    eng = CDCEngine(
        spark, tmp_root + "/t",
        change_schema=CHANGE_EVENT_SCHEMA_EVOLVED,
        n_buckets=8, merge_mode="delta",
    )
    h = SCD2Table.create(
        spark, tmp_root + "/h", payload, key_cols=KEYS, n_buckets=8
    )
    wrong = SCD2Table.create(
        spark, tmp_root + "/wrong", payload, key_cols=["conv_id"], n_buckets=2
    )
    with pytest.raises(ValueError, match="keys"):
        eng.register_history(wrong)
    eng.register_history(h, mode="repair", compact_every=2)
    eng.replay(
        os.path.join(tmp_root, "log"), tmp_root + "/cp",
        max_files_per_trigger=2,
    )

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "tool_meta", "ts"]
    got = h.current().select(*cols).orderBy(*KEYS).toPandas()
    exp = eng.read_table().select(*cols).orderBy(*KEYS).toPandas()
    assert_pdf_equal(got, exp, cols)

    one = SCD2Table.create(
        spark, tmp_root + "/one", payload, key_cols=KEYS, n_buckets=8
    )
    one.apply(
        spark.read.schema(CHANGE_EVENT_SCHEMA_EVOLVED).json(
            os.path.join(tmp_root, "log")
        ),
        epoch_id=0,
    )
    a = one.read().orderBy("conv_id", "turn_idx", "vf_lsn").toPandas()
    b = h.read().orderBy("conv_id", "turn_idx", "vf_lsn").toPandas()
    assert_pdf_equal(b, a, list(a.columns))

    # the history-compaction cadence ran (purely physical: the state
    # equality above already covers it) and bounded the delta backlog
    stages = {r.stage for r in eng.metrics_report().collect()}
    assert "history_compact" in stages
    m = h.table.manifest()
    n_delta = sum(len(v) for v in (m.get("delta_files") or {}).values())
    assert n_delta <= 2 * 8  # ≤ compact_every epochs' worth of buckets
