"""Similarity search over an embedding column (array<float>).

* ``knn_bruteforce`` — exact cosine top-k; the correctness baseline.
* ``knn_lsh_bucketed`` — random-hyperplane LSH: vectors bucket by the sign
  pattern of d deterministic hyperplanes; queries probe only their own
  bucket (plus optional multi-probe neighbors).  The scale path: the
  corpus-side shuffle is keyed by bucket, the per-bucket comparison is
  |bucket|×|queries-in-bucket| instead of n×q.

All dot products are JVM-side higher-order functions (``zip_with`` +
``aggregate``) — no Python in the hot path.  Hyperplanes are derived
deterministically from md5 of (plane, dim) so runs are reproducible with
no stored model state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .docops import _cosine


def knn_bruteforce(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    Queries are a tiny dim table → broadcast; the corpus is scanned once,
    never shuffled (the window ranks only q×n scored rows).
    """
    from pyspark.sql import Window

    v = emb.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("nv")
    )
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        v.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(_cosine(F.col("qv"), F.col("nv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1) from md5(plane:dim).
    Pure function of indices — identical on driver and in SQL oracles."""
    import hashlib

    h = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return (h / float(1 << 32)) * 2.0 - 1.0


def lsh_bucket_expr(vec_col, n_planes: int, dim: int):
    """Sign-pattern bucket id of a vector under n deterministic hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(*[F.lit(_hyperplane(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(vec_col, w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseXOR(
            F.shiftleft(F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p)
        )
    return bucket


def knn_lsh_bucketed(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.

    2^n_planes buckets; expected bucket size n/2^p.  Recall/latency trades
    by n_planes (and multi-probe, not implemented round 1).  Plan shape:
    one narrow projection to compute buckets, equi-join on bucket (shuffle
    keyed by bucket id), per-bucket scoring + window top-k.
    """
    from pyspark.sql import Window

    v = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    ).withColumn("bucket", lsh_bucket_expr(F.col("nv"), n_planes, dim))
    q = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("bucket", lsh_bucket_expr(F.col("qv"), n_planes, dim))
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid", F.round(_cosine(F.col("qv"), F.col("nv")), 4).alias("cosine")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )
