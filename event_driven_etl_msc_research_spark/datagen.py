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


def _gen_events(spec: ChangeStreamSpec) -> list[dict]:
    """Generate events in true log order (lsn ascending)."""
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

    events = []
    seen: set[tuple[str, int]] = set()
    for lsn in range(n):
        conv = f"conv{int(conv_idx[lsn]):06d}"
        turn = int(turn_idx[lsn])
        ts = BASE_TS + (lsn // spec.ts_group)
        key = (conv, turn)
        first = key not in seen
        seen.add(key)
        ev = {
            "op": "D" if is_delete[lsn] else ("I" if first else "U"),
            "lsn": lsn,
            "ts": ts,
            "conv_id": conv,
            "turn_idx": turn,
            "role": ROLES[int(role_idx[lsn])],
            "text": f"text-{conv}-t{turn}-v{lsn}{pad}",
            "tool": TOOLS[int(tool_idx[lsn])],
        }
        if lsn >= evolve_lsn:
            ev["tool_meta"] = f"meta-v{lsn}"
        events.append(ev)
    return events


def _shuffle_out_of_order(events: list[dict], spec: ChangeStreamSpec) -> list[dict]:
    """Permute delivery order within a sliding window so segments contain
    out-of-order ``ts`` and some events cross segment boundaries."""
    rng = np.random.RandomState(spec.seed + 1)
    order = np.arange(len(events))
    w = spec.ooo_window
    if w > 1:
        for start in range(0, len(events), w):
            end = min(start + w, len(events))
            perm = rng.permutation(end - start)
            order[start:end] = order[start:end][perm]
    return [events[i] for i in order]


def _ts_iso(ts: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(ts, dt.timezone.utc).strftime(
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
    events = _gen_events(spec)
    evolve_lsn = int(spec.evolve_at_frac * spec.n_events)
    delivered = _shuffle_out_of_order(events, spec)

    segs: list[list[dict]] = [
        delivered[i : i + spec.segment_size]
        for i in range(0, len(delivered), spec.segment_size)
    ]
    gen = GeneratedStream(spec=spec, out_dir=out_dir, evolve_lsn=evolve_lsn)
    seq = 0

    def write_segment(rows: list[dict]) -> None:
        nonlocal seq
        path = os.path.join(out_dir, f"seg-{seq:05d}.jsonl")
        with open(path, "w") as f:
            for r in rows:
                r2 = dict(r)
                r2["ts"] = _ts_iso(r2["ts"])
                f.write(json.dumps(r2) + "\n")
        gen.segment_paths.append(path)
        seq += 1

    for i, seg in enumerate(segs):
        write_segment(seg)
        if i in spec.dup_segments:
            write_segment(seg)  # verbatim duplicate delivery
    return gen


def events_as_records(spec: ChangeStreamSpec) -> list[dict]:
    """All events in true log order with integer ``ts`` (for the oracle)."""
    return _gen_events(spec)
