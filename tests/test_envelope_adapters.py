"""Real-world CDC wire-format adapters: Debezium and Maxwell envelopes map
to the engine's change-event columns and replay to the exact oracle state.

The reference consumes its own hand-rolled JSON chunk format only
(``DataSplit.py:116-129``); a production binlog tail arrives as Debezium
(Postgres/MySQL → Kafka, wrapped or bare envelope) or Maxwell JSON.  These
tests pin (a) the field mapping — op codes, lsn precedence
(``source.lsn`` → ``source.pos`` → ``ts_ms``), ts fallbacks, tombstone
handling — on hand-crafted records, and (b) end-to-end equivalence: the
same generated WAL re-encoded as Debezium/Maxwell and replayed through
``replay_stream`` lands byte-identical to the plain-format replay oracle.
No broker exists in the sandbox; the envelopes arrive via the file stream
source, which exercises the identical parsing plan.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from conftest import assert_pdf_equal

from event_driven_etl_msc_research_spark import (
    CDCEngine,
    parse_debezium,
    parse_maxwell,
)
from event_driven_etl_msc_research_spark.datagen import (
    ChangeStreamSpec,
    events_as_records,
)
from event_driven_etl_msc_research_spark.oracle import oracle_final_state

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _iso(ts_s: int) -> str:
    return dt.datetime.fromtimestamp(int(ts_s), dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.000Z"
    )


def _row_image(r: dict) -> dict:
    return {
        "conv_id": r["conv_id"],
        "turn_idx": r["turn_idx"],
        "role": r["role"],
        "text": r["text"],
        "tool": r["tool"],
        "ts": _iso(r["ts"]),
    }


def _debezium_line(r: dict, i: int) -> str:
    """Envelope shape rotates through every supported variant."""
    env: dict = {"op": "d" if r["op"] == "D" else "cur"[i % 3]}
    if r["op"] == "D":
        env["before"] = _row_image(r)
    else:
        env["after"] = _row_image(r)
    m = i % 3
    if m == 0:  # Postgres-shaped: lsn in source.lsn
        env["source"] = {"lsn": r["lsn"], "ts_ms": r["ts"] * 1000}
    elif m == 1:  # MySQL-shaped: lsn in source.pos
        env["source"] = {"pos": r["lsn"], "ts_ms": r["ts"] * 1000}
    else:  # neither: envelope ts_ms is the documented lsn fallback
        env["ts_ms"] = r["lsn"]
    if i % 2:  # schemas-enabled wrapper vs bare envelope
        return json.dumps({"schema": {"type": "struct"}, "payload": env})
    return json.dumps(env)


def _maxwell_line(r: dict, i: int) -> str:
    env: dict = {
        "database": "edem",
        "table": "transcripts",
        "type": "delete"
        if r["op"] == "D"
        else ["insert", "update", "bootstrap-insert"][i % 3],
        "ts": r["ts"],
        "data": _row_image(r),  # Maxwell deletes carry the full row in data
    }
    env["xid"] = r["lsn"]
    if i % 2:
        env["xoffset"] = 0
    return json.dumps(env)


def test_debezium_field_mapping(spark):
    img = {
        "conv_id": "c1",
        "turn_idx": 3,
        "role": "user",
        "text": "hello",
        "tool": None,
        "ts": "2024-01-02T03:04:05.000Z",
    }
    vals = [
        # wrapped create, Postgres lsn
        json.dumps(
            {
                "schema": {},
                "payload": {
                    "op": "c",
                    "after": img,
                    "source": {"lsn": 71, "ts_ms": 1_000},
                },
            }
        ),
        # bare update, MySQL pos
        json.dumps({"op": "u", "after": img, "source": {"pos": 72}}),
        # snapshot read, no source at all: lsn falls back to ts_ms
        json.dumps({"op": "r", "after": img, "ts_ms": 73}),
        # delete: image comes from before
        json.dumps(
            {"op": "d", "before": img, "source": {"lsn": 74, "ts_ms": 2_000}}
        ),
        # image without its own ts: event time falls back to source.ts_ms
        json.dumps(
            {
                "op": "c",
                "after": {k: v for k, v in img.items() if k != "ts"},
                "source": {"lsn": 75, "ts_ms": 1_700_000_000_000},
            }
        ),
        # unknown op surfaces as NULL op (merge's NOT NULL gate fails loudly)
        json.dumps({"op": "x", "after": img, "source": {"lsn": 76}}),
        # malformed JSON surfaces as an all-NULL row, never silently dropped
        "{not json",
        # Kafka log-compaction tombstone: dropped by default
        None,
    ]
    raw = spark.createDataFrame([(v,) for v in vals], "value string")
    rows = parse_debezium(raw).collect()
    assert len(rows) == len(vals) - 1  # tombstone dropped
    by_lsn = {r["lsn"]: r for r in rows}
    assert set(by_lsn) == {71, 72, 73, 74, 75, 76, None}
    for lsn in (71, 72, 73):
        assert by_lsn[lsn]["op"] == "U" and by_lsn[lsn]["text"] == "hello"
    assert by_lsn[74]["op"] == "D" and by_lsn[74]["conv_id"] == "c1"
    assert by_lsn[75]["ts"] == dt.datetime(2023, 11, 14, 22, 13, 20)
    assert by_lsn[76]["op"] is None  # unknown op
    assert by_lsn[None]["op"] is None  # malformed record
    assert by_lsn[71]["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    # tombstones surfaced on request
    assert parse_debezium(raw, drop_tombstones=False).count() == len(vals)


def test_maxwell_field_mapping(spark):
    img = {
        "conv_id": "c9",
        "turn_idx": 1,
        "role": "assistant",
        "text": "mx",
        "tool": "bash",
        "ts": "2024-06-01T00:00:00.000Z",
    }
    vals = [
        json.dumps({"type": "insert", "ts": 1, "xid": 10, "data": img}),
        json.dumps(
            {"type": "update", "ts": 2, "xid": 10, "xoffset": 3, "data": img}
        ),
        json.dumps({"type": "delete", "ts": 3, "xid": 11, "data": img}),
        # no xid: lsn falls back to envelope ts seconds, scaled
        json.dumps(
            {
                "type": "bootstrap-insert",
                "ts": 7,
                "data": {k: v for k, v in img.items() if k != "ts"},
            }
        ),
        json.dumps({"type": "table-create", "ts": 4, "xid": 12}),  # DDL noise
        None,
    ]
    raw = spark.createDataFrame([(v,) for v in vals], "value string")
    rows = parse_maxwell(raw).collect()
    assert len(rows) == len(vals) - 1
    by_lsn = {r["lsn"]: r for r in rows}
    assert by_lsn[10 << 20]["op"] == "U"
    assert by_lsn[(10 << 20) + 3]["op"] == "U"
    assert by_lsn[11 << 20]["op"] == "D"
    fb = by_lsn[7 << 20]
    assert fb["op"] == "U"  # xid-absent fallback
    assert fb["ts"] == dt.datetime(1970, 1, 1, 0, 0, 7)  # envelope ts
    assert by_lsn[12 << 20]["op"] is None  # DDL noise fails loudly, not silently


def _replay_envelopes(spark, tmp_root, lines, parser, name):
    enc_dir = os.path.join(tmp_root, f"{name}_wal")
    os.makedirs(enc_dir)
    with open(os.path.join(enc_dir, "seg-00000.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")
    eng = CDCEngine(
        spark,
        os.path.join(tmp_root, f"{name}_tbl"),
        n_buckets=4,
        merge_mode="delta",
    )
    raw = spark.readStream.text(enc_dir)
    eng.replay_stream(parser(raw), os.path.join(tmp_root, f"{name}_cp"))
    return eng.read_table().orderBy("conv_id", "turn_idx").toPandas()


def test_debezium_replay_matches_oracle(spark, tmp_root):
    spec = ChangeStreamSpec(
        n_events=2_000, n_convs=60, seed=7, evolve_at_frac=1.0
    )
    recs = events_as_records(spec)
    lines = [_debezium_line(r, i) for i, r in enumerate(recs)]
    got = _replay_envelopes(spark, tmp_root, lines, parse_debezium, "dz")
    exp = oracle_final_state(spec)
    assert_pdf_equal(got, exp, COLS)


def test_maxwell_replay_matches_oracle(spark, tmp_root):
    spec = ChangeStreamSpec(
        n_events=2_000, n_convs=60, seed=8, evolve_at_frac=1.0
    )
    recs = events_as_records(spec)
    # Maxwell's packed (xid, xoffset) lsn is order-preserving, so the
    # per-key (ts, lsn) max-version winner is the same row the plain
    # replay picks — the oracle transfers unchanged.
    lines = [_maxwell_line(r, i) for i, r in enumerate(recs)]
    got = _replay_envelopes(spark, tmp_root, lines, parse_maxwell, "mx")
    exp = oracle_final_state(spec)
    assert_pdf_equal(got, exp, COLS)
