"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the scan produced fewer partitions than
    the session's parallelism.

    WHY: Spark splits files by bytes (``spark.sql.files.maxPartitionBytes``),
    so a small parquet file (e.g. 600 KB of documents) arrives as ONE
    partition and every downstream per-row computation (shingle hashing,
    cosine scoring) runs single-threaded up to the first shuffle — and the
    map-side partial aggregate before that shuffle is single-threaded too.
    At 100 TB inputs have thousands of splits and this is a no-op; on small
    inputs it buys near-linear speedup of compute-bound map work for the
    cost of shuffling a tiny input once.

    The split-count probe is ``len(df.inputFiles())`` — metadata only, no
    RDD conversion (``df.rdd.getNumPartitions()`` would instantiate the RDD
    lineage and re-run file listing / plan conversion per call).  Each small
    file is at most a handful of splits, so few-files ⇒ few-partitions is
    the right cheap proxy; a non-file-backed plan (empty ``inputFiles``)
    passes through untouched.
    """
    import os
    from urllib.parse import urlparse

    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files or len(files) >= target:
        return df
    # size guard: spreading is a SMALL-input fix — one big file already
    # splits into many byte-range partitions, and shuffling it would cost
    # more than it saves.  Local paths are stat-able; an un-stat-able
    # object-store URI means we're on a real cluster where inputs are big
    # and spreading should be skipped anyway.
    try:
        total = sum(
            os.path.getsize(urlparse(f).path or f) for f in files
        )
    except OSError:
        return df
    if total >= 64 * 1024 * 1024:  # not small — let byte-range splits rule
        return df
    return df.repartition(target)
