"""SparkSession factory tuned for the engine.

The reference tunes parallelism with a single knob (Step Functions
``MaxConcurrency: 4``, ``AWS-Step-function/prototype-etl.json:32``).  Here the
equivalents are ``local[N]`` thread count, ``spark.sql.shuffle.partitions``,
and AQE — all set so the same code scales from local tests to a real
multi-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "event_driven_etl_msc_research_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the scaling bench can run the identical job at two parallelism levels.
    ``shuffle_partitions`` defaults to the local core count — the default 200
    over-parallelizes local runs and under-parallelizes a 1000-executor
    cluster; on a real cluster it should be set to ~2-3x total cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; a real cluster master string leaves the Spark default.
        if master.startswith("local["):
            n = master[len("local[") : -1]
            shuffle_partitions = cpus if n == "*" else int(n)
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # measured on this engine's merge shapes: shuffled hash join beats
        # sort-merge (the argmax winners join has unique keys, no sort
        # needed; AQE still guards skew) — see BENCH.md
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # TIMESTAMP_MICROS (not legacy INT96): INT96 columns carry NO
        # parquet min/max statistics, which would blind the manifest's
        # per-file ts-range pruning (ManifestTable.read(where=...))
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        # heap scales with core count (1.5 GiB/core, min 8 GiB): a local[4N]
        # run models a 4N-executor cluster, which has 4N× aggregate memory —
        # fixed total heap would instead model executors shrinking as the
        # cluster grows, inverting scaling results via per-task spill
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{max(8, (3 * cpus) // 2)}g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
