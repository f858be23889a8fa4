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


def lsh_bucket_expr(vec_col, n_planes: int, dim: int, plane_offset: int = 0):
    """Sign-pattern bucket id of a vector under n deterministic hyperplanes
    (``plane_offset`` selects an independent plane family per hash table)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(*[F.lit(_hyperplane(plane_offset + p, d)) for d in range(dim)])
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
    multi_probe: int = 1,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket(s).

    2^n_planes buckets per table; expected bucket size n/2^p.  Two recall
    knobs, composable:

    * ``multi_probe`` — 0 probes only the query's own bucket; 1 (default)
      also probes every bucket at Hamming distance 1 (flip each plane bit —
      1 + n_planes probes per query), recovering neighbors a single
      near-zero hyperplane margin would otherwise lose;
    * ``n_tables`` — OR-amplification: L independent plane families; a
      neighbor is a candidate if it collides in ANY table.  Miss probability
      decays exponentially in L.  Cost: the corpus-side index is replicated
      L× (the standard LSH memory/recall trade); the query side stays tiny.

    Plan shape: one narrow projection computes each side's (table, bucket)
    keys (corpus exploded L×, queries exploded L×(1+probes)× then
    broadcast), equi-join on (table, bucket) — the only shuffle is the
    corpus keyed by its bucket — per-bucket scoring, (qid, nid) dedup,
    window top-k.
    """
    from pyspark.sql import Window

    # ALL (n_tables × n_planes) hyperplane dots in ONE transform over a
    # literal weight matrix: one small lambda expression instead of
    # tables×planes independent unrolled folds (which multiply codegen /
    # compile time 12× and repeat the 64-literal weight arrays per fold)
    W = F.array(
        *[
            F.array(*[F.lit(_hyperplane(g, d)) for d in range(dim)])
            for g in range(n_tables * n_planes)
        ]
    )

    def _bits(vec):
        dots = F.transform(
            W,
            lambda w: F.aggregate(
                F.zip_with(vec, w, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return F.transform(
            dots,
            lambda d: F.when(d >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        )

    def _keys(bits_col, probe: bool):
        """(table, bucket) struct array from the BOUND sign-bit array;
        query side (probe=True) adds the Hamming-1 probe buckets."""
        out = []
        for t in range(n_tables):
            b0 = None
            for p in range(n_planes):
                term = F.shiftleft(
                    F.element_at(bits_col, t * n_planes + p + 1), p
                )
                b0 = term if b0 is None else b0.bitwiseXOR(term)
            buckets = [b0]
            if probe and multi_probe >= 1:
                buckets += [
                    b0.bitwiseXOR(F.lit(1 << p).cast("long"))
                    for p in range(n_planes)
                ]
            out += [
                F.struct(F.lit(t).alias("tbl"), b.alias("bucket")) for b in buckets
            ]
        return F.array(*out)

    v = (
        emb.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).cast("array<double>").alias("nv"),
        )
        .withColumn("_bits", _bits(F.col("nv")))  # bound: element_at is cheap
        .select(
            "nid", "nv", F.explode(_keys(F.col("_bits"), probe=False)).alias("tb")
        )
        .select("nid", "nv", "tb.tbl", "tb.bucket")
    )
    q = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("_bits", _bits(F.col("qv")))
        .select(
            "qid", "qv", F.explode(_keys(F.col("_bits"), probe=True)).alias("tb")
        )
        .select("qid", "qv", "tb.tbl", "tb.bucket")
        .dropDuplicates(["qid", "tbl", "bucket"])
    )
    scored = (
        v.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid", F.round(_cosine(F.col("qv"), F.col("nv")), 4).alias("cosine")
        )
        .dropDuplicates(["qid", "nid"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )
