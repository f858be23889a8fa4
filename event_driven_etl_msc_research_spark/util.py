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
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
