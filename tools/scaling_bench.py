"""Two-cluster-size scaling evidence for the north rule.

The rule demands throughput scaling efficiency ≥0.8 between N and 4N
executors.  No real cluster exists in this sandbox, so (per BASELINE.md §
target) we run the IDENTICAL replay job at two parallelism levels on the
same host and input — ``local[8]`` vs ``local[32]`` — each in a fresh JVM
(subprocess), and report::

    efficiency = (events_per_sec[32] / events_per_sec[8]) / (32 / 8)

Usage:  python tools/scaling_bench.py [--events N] [--low 8] [--high 32]
Writes the result table into BENCH.md and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, events: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--only", "cdc_replay", "--events", str(events)],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "400000")))
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    lo = run_at(args.low, args.events)
    hi = run_at(args.high, args.events)
    eps_lo = lo["cdc_events_per_sec"]
    eps_hi = hi["cdc_events_per_sec"]
    ratio = args.high / args.low
    eff = (eps_hi / eps_lo) / ratio

    table = f"""## Scaling bench (north-rule evidence)

Identical CDC replay ({args.events:,} delivered change events, deterministic
seed-42 stream, full dedup→MERGE→manifest-commit path, fresh JVM per run)
at two parallelism levels on the same 32-core host:

| config | replay wall (s) | change-events/sec |
|---|---|---|
| `local[{args.low}]` | {lo['queries']['cdc_replay']} | {eps_lo:,.0f} |
| `local[{args.high}]` | {hi['queries']['cdc_replay']} | {eps_hi:,.0f} |

**Speedup {args.low}→{args.high} cores: {eps_hi / eps_lo:.2f}× over a {ratio:.0f}× core ratio →
scaling efficiency {eff:.2f}** (north-rule target ≥0.8).
"""
    print(table)
    print(json.dumps({"eps_low": eps_lo, "eps_high": eps_hi, "efficiency": round(eff, 3)}))

    bench_md = os.path.join(REPO, "BENCH.md")
    marker = "## Scaling bench (north-rule evidence)"
    prev = ""
    if os.path.exists(bench_md):
        with open(bench_md) as f:
            prev = f.read()
        if marker in prev:
            prev = prev[: prev.index(marker)].rstrip() + "\n\n"
    with open(bench_md, "w") as f:
        f.write(prev + table)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
