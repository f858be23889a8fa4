"""Metadata-aggregate micro-benchmark: count()/min_max() vs the scan path.

Builds a real table (CoW — all-live base files, the tier-1 shape a
compacted, tombstone-purged production table returns to), then times

* ``t.count()`` / ``t.min_max("ts")`` — the metadata tiers (driver
  dict-folds over harvested footer stats; zero Spark jobs), vs
* ``t.read().count()`` / ``t.read().agg(min,max)`` — the scan path a
  naive consumer pays,

each on a COLD handle (fresh ManifestTable per rep, so the manifest GET
is inside the measurement, same as a new reader).  The wall-clock ratio
here at small scale understates the cluster win — the scan path's cost
grows with the table (10^10 rows = a cluster job per COUNT) while the
metadata path stays a driver fold over O(files) stats — but the printed
numbers make the claim measured rather than asserted.

Usage: python tools/agg_bench.py [n_rows] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_driven_etl_msc_research_spark.session import get_spark  # noqa: E402
from event_driven_etl_msc_research_spark.schemas import (  # noqa: E402
    TRANSCRIPT_SCHEMA,
)
from event_driven_etl_msc_research_spark.sinks.manifest import ManifestTable  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "agg-bench",
        master="local[8]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = tempfile.mkdtemp(prefix="aggbench_")
    t = ManifestTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=16)
    from pyspark.sql import functions as F

    changes = (
        spark.range(n)
        .select(
            F.lit("U").alias("op"),
            F.col("id").alias("lsn"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") / 4).alias("ts"),
            F.concat(F.lit("conv"), (F.col("id") % 10_000).cast("string")).alias(
                "conv_id"
            ),
            # floor-div keeps every (conv_id, turn_idx) pair DISTINCT up to
            # 400k ids (id % 10000 cycles, id // 10000 advances per cycle)
            (F.col("id") / 10_000).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
        )
    )
    t.merge(changes, 0, mode="cow")

    def best(fn) -> tuple[float, object]:
        b, r = float("inf"), None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            b = min(b, time.perf_counter() - t0)
        return round(b * 1000, 2), r

    def cold() -> ManifestTable:
        return ManifestTable(spark, root, storage=t.storage)

    meta_count_ms, n_meta = best(lambda: cold().count())
    scan_count_ms, n_scan = best(lambda: cold().read().count())
    meta_mm_ms, mm_meta = best(lambda: cold().min_max("ts"))
    scan_mm_ms, mm_scan = best(
        lambda: cold()
        .read()
        .agg(F.min("ts").alias("l"), F.max("ts").alias("h"))
        .first()
    )
    assert n_meta == n_scan
    assert mm_meta[0].replace(tzinfo=None) == mm_scan["l"]
    assert mm_meta[1].replace(tzinfo=None) == mm_scan["h"]
    files = sum(len(ps) for ps in t.manifest()["files"].values())
    print(
        json.dumps(
            {
                "metric": "metadata_aggregate_ms",
                "n_rows": n_scan,
                "n_files": files,
                "reps": reps,
                "count": {
                    "metadata_ms": meta_count_ms,
                    "scan_ms": scan_count_ms,
                    "speedup": round(scan_count_ms / meta_count_ms, 1),
                },
                "min_max_ts": {
                    "metadata_ms": meta_mm_ms,
                    "scan_ms": scan_mm_ms,
                    "speedup": round(scan_mm_ms / meta_mm_ms, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
