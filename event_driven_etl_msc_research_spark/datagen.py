"""Deterministic synthetic CDC change-stream generator (FIXTURES.md F2).

Replaces the reference's synthetic generators — ``data-genartor.py:20-44``
(replicate 7 base rows to ≥1 MB) and ``Backup_03072024/data_genrator.py:20-37``
(Faker CSV) — with a seeded, pure-deterministic generator whose replay yields
a final state computable by a trivial pandas fold (the oracle in
``oracle.py``).  No wall-clock, no uuid4 (cf. ``Phase3-Transformation.py:123``).

Properties (all driven by ``seed``):
* multiple updates per key, delivered out of order in ``ts`` across segment
  boundaries (max-version ``(ts, lsn)`` must win);
* whole-segment duplicate deliveries (exactly-once / idempotence test);
* one hot ``conv_id`` holding ~``hot_frac`` of all events (skew test);
* interleaved ``D`` ops (delete/tombstone handling);
* ``tool_meta`` column appears only in segments past ``evolve_at_frac``
  (additive schema-evolution test) — earlier segment files do not contain
  the key at all.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = [None, "search", "bash", "browser", "calculator"]
BASE_TS = 1_700_000_000  # 2023-11-14T22:13:20Z, fixed epoch base


@dataclass
class ChangeStreamSpec:
    n_events: int = 10_000
    n_convs: int = 200
    max_turns: int = 40
    seed: int = 42
    hot_frac: float = 0.5          # share of events on the single hot conv
    delete_frac: float = 0.05
    segment_size: int = 1_000      # events per segment file (cf. chunk_size
                                   # default 500 at DataSplit.py:149)
    ooo_window: int = 200          # shuffle radius for out-of-order delivery
    ts_group: int = 4              # events sharing one ts (exercises lsn tie-break)
    evolve_at_frac: float = 0.6    # lsn fraction after which tool_meta appears
    dup_segments: tuple[int, ...] = (1,)  # segment indices re-delivered verbatim
    text_pad: int = 0              # extra deterministic padding chars per text
                                   # (bench uses this to make parsing CPU-bound)


@dataclass
class GeneratedStream:
    spec: ChangeStreamSpec
    out_dir: str
    segment_paths: list[str] = field(default_factory=list)
    evolve_lsn: int = 0  # first lsn carrying tool_meta


def _gen_frame(spec: ChangeStreamSpec):
    """Generate events in true log order (lsn ascending) as a fully
    vectorized pandas DataFrame (~50× the per-row dict loop — the generator
    must keep up with the engine when benching multi-million-event streams).
    RNG draw order is part of the fixture contract: identical draws →
    identical streams across versions."""
    import pandas as pd

    rng = np.random.RandomState(spec.seed)
    n = spec.n_events
    # conv choice: hot conv 0 gets hot_frac, rest uniform
    hot = rng.rand(n) < spec.hot_frac
    conv_idx = np.where(hot, 0, rng.randint(1, max(2, spec.n_convs), size=n))
    turn_idx = rng.randint(0, spec.max_turns, size=n)
    is_delete = rng.rand(n) < spec.delete_frac
    role_idx = rng.randint(0, len(ROLES), size=n)
    tool_idx = rng.randint(0, len(TOOLS), size=n)
    evolve_lsn = int(spec.evolve_at_frac * n)
    pad = "x" * spec.text_pad

    lsn = np.arange(n)
    lsn_s = pd.Series(lsn).astype(str)
    conv = "conv" + pd.Series(conv_idx).astype(str).str.zfill(6)
    turn_s = pd.Series(turn_idx).astype(str)
    first = ~pd.DataFrame({"c": conv, "t": turn_idx}).duplicated().to_numpy()
    op = np.where(is_delete, "D", np.where(first, "I", "U"))
    ts = BASE_TS + (lsn // spec.ts_group)
    text = "text-" + conv + "-t" + turn_s + "-v" + lsn_s + pad
    role = pd.Series(np.array(ROLES, dtype=object)[role_idx])
    tool = pd.Series(np.array(TOOLS, dtype=object)[tool_idx])
    tool_meta = pd.Series(
        np.where(lsn >= evolve_lsn, "meta-v" + lsn_s, None), dtype=object
    )
    return pd.DataFrame(
        {
            "op": op,
            "lsn": lsn,
            "ts": ts,
            "conv_id": conv,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "tool_meta": tool_meta,  # None before the evolution point
        }
    )


def _delivery_order(n: int, spec: ChangeStreamSpec) -> np.ndarray:
    """Permutation of delivery order within a sliding window so segments
    contain out-of-order ``ts`` and some events cross segment boundaries."""
    rng = np.random.RandomState(spec.seed + 1)
    order = np.arange(n)
    w = spec.ooo_window
    if w > 1:
        for start in range(0, n, w):
            end = min(start + w, n)
            perm = rng.permutation(end - start)
            order[start:end] = order[start:end][perm]
    return order


def _json_lines(frame) -> "np.ndarray":
    """Vectorized JSON-lines encoding of the event frame.

    Hand-assembled by string concatenation — valid because every field is
    machine-generated ``[a-z0-9_-]`` text (no escaping needed).  Events
    before the evolution point OMIT the ``tool_meta`` key entirely, as a
    pre-DDL binlog would."""
    import pandas as pd

    ts_unique = {
        t: _ts_iso(t) for t in pd.unique(frame["ts"])
    }
    ts_iso = frame["ts"].map(ts_unique)
    tool_part = np.where(
        frame["tool"].isna(), '"tool": null', '"tool": "' + frame["tool"] + '"'
    )
    meta_part = np.where(
        frame["tool_meta"].isna(),
        "",
        ', "tool_meta": "' + frame["tool_meta"] + '"',
    )
    return (
        '{"op": "' + frame["op"] + '", "lsn": ' + frame["lsn"].astype(str)
        + ', "ts": "' + ts_iso + '", "conv_id": "' + frame["conv_id"]
        + '", "turn_idx": ' + frame["turn_idx"].astype(str)
        + ', "role": "' + frame["role"] + '", "text": "' + frame["text"]
        + '", ' + tool_part + meta_part + "}"
    ).to_numpy()


def _ts_iso(ts: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(int(ts), dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.000Z"
    )


def generate_change_stream(out_dir: str, spec: ChangeStreamSpec) -> GeneratedStream:
    """Write JSON-lines segment files ``seg-%05d.jsonl`` to ``out_dir``.

    Segment files play the role of the reference's chunk objects
    (``data/spilited_file/.../{file}_chunk_{i}.json``, ``DataSplit.py:116-129``)
    — the unit of delivery, replay, and duplicate-redelivery.
    Early segments (before schema evolution) omit the ``tool_meta`` key
    entirely, as a pre-DDL binlog would.
    """
    os.makedirs(out_dir, exist_ok=True)
    frame = _gen_frame(spec)
    evolve_lsn = int(spec.evolve_at_frac * spec.n_events)
    lines = _json_lines(frame)[_delivery_order(len(frame), spec)]

    gen = GeneratedStream(spec=spec, out_dir=out_dir, evolve_lsn=evolve_lsn)
    seq = 0
    mtime_base = time.time()

    def write_segment(seg_lines: np.ndarray) -> None:
        nonlocal seq
        path = os.path.join(out_dir, f"seg-{seq:05d}.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(seg_lines))
            f.write("\n")
        # strictly-increasing per-segment mtimes (2 ms apart — distinct at
        # Spark's ms granularity): a burst-written WAL dir otherwise gets
        # COLLIDING mtimes and the file streaming source, which orders by
        # modification time, delivers segments in arbitrary tie order.  A
        # real tail's segments arrive over time; stamping the generation
        # order makes replay reproduce it — required by anything deriving
        # a lateness bound from delivery order (compact_purge_tombstone_lag)
        # and makes every replay's epoch→segment mapping deterministic.
        mt = mtime_base + 0.002 * seq
        os.utime(path, (mt, mt))
        gen.segment_paths.append(path)
        seq += 1

    for i, start in enumerate(range(0, len(lines), spec.segment_size)):
        seg = lines[start : start + spec.segment_size]
        write_segment(seg)
        if i in spec.dup_segments:
            write_segment(seg)  # verbatim duplicate delivery
    return gen


def events_as_records(spec: ChangeStreamSpec) -> list[dict]:
    """All events in true log order with integer ``ts`` (for the oracle).
    Pre-evolution records omit the ``tool_meta`` key, as the stream does."""
    recs = _gen_frame(spec).to_dict("records")
    for r in recs:
        if r["tool_meta"] is None:
            del r["tool_meta"]
        r["lsn"] = int(r["lsn"])
        r["ts"] = int(r["ts"])
        r["turn_idx"] = int(r["turn_idx"])
    return recs
