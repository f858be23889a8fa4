"""spark-submit entry point: replay (or tail) a change-log into a table.

The production deployment shape required by the north rule::

    python tools/make_pyfiles_zip.py          # → dist/engine.zip
    spark-submit --master <cluster> \\
        --py-files dist/engine.zip \\
        tools/run_replay.py \\
        --changelog /data/wal --table /lake/transcripts \\
        --checkpoint /lake/_cp/transcripts --mode delta [--tail]

Replaces the reference's ``StartExecution`` + Step Functions state machine
(``AWS-Step-function/prototype-etl.json:3-14``) as the single entry point:
one streaming query is the whole pipeline.  Resumable: re-running with the
same ``--checkpoint`` continues from the last committed epoch.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--changelog", required=True, help="change-log (WAL) dir")
    ap.add_argument("--table", required=True, help="table root dir")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    ap.add_argument("--mode", choices=["cow", "delta"], default="delta")
    ap.add_argument("--compact-every", type=int, default=8,
                    help="delta mode: fold deltas into base every N epochs")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--tenant", default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--tail", action="store_true",
                    help="keep tailing (processingTime trigger) instead of "
                         "drain-and-stop (AvailableNow)")
    ap.add_argument("--evolved-schema", action="store_true",
                    help="accept the tool_meta additive column")
    ap.add_argument("--event-dedup", default=None, metavar="DELAY",
                    help="e.g. '1 hour': stateful event-level dedup "
                         "(dropDuplicatesWithinWatermark on key+lsn) for "
                         "at-least-once transports that redeliver events "
                         "across epochs")
    ap.add_argument("--vacuum-grace-s", type=float, default=600.0,
                    help="never GC unreferenced data dirs younger than this "
                         "(protects concurrent writers' in-flight staging)")
    args = ap.parse_args()

    # import AFTER arg parsing so --help works without the zip on sys.path
    from pyspark.sql import SparkSession

    from event_driven_etl_msc_research_spark.schemas import (
        CHANGE_EVENT_SCHEMA,
        CHANGE_EVENT_SCHEMA_EVOLVED,
    )
    from event_driven_etl_msc_research_spark.streaming.engine import CDCEngine

    # spark-submit supplies master/deploy config; just get the session
    spark = SparkSession.builder.appName("cdc_replay").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    engine = CDCEngine(
        spark,
        args.table,
        change_schema=(
            CHANGE_EVENT_SCHEMA_EVOLVED if args.evolved_schema else CHANGE_EVENT_SCHEMA
        ),
        n_buckets=args.n_buckets,
        tenant_id=args.tenant,
        merge_mode=args.mode,
        compact_every=args.compact_every if args.mode == "delta" else 0,
        event_dedup=args.event_dedup,
        vacuum_grace_s=args.vacuum_grace_s,
    )
    engine.replay(
        args.changelog,
        args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.tail,
        timeout_s=None,
    )
    m = engine.table.manifest()
    print(json.dumps({
        "table_version": m["version"],
        "applied_epochs": len(m["applied_epochs"]),
        "total_rows": m["total_rows"],
        "delta_rows_total": m.get("delta_rows_total", 0),
        "live_rows": engine.read_table().count(),
    }))
    engine.metrics_report().show(truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
