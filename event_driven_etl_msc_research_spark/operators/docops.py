"""Document deduplication operators for training-data pipelines.

Five dedup families, each designed for 100 TB document corpora:

* exact           — hash group-by, keep the lowest doc_id (1 shuffle)
* n-gram Jaccard  — exact token-set similarity via a token-inverted-index
                    self-join (the verify step after any candidate pass)
* MinHash + LSH   — shingle → k md5-min signature → band-bucket join; the
                    scale path: candidate pairs come from equi-joins on band
                    hashes, never from an O(n²) comparison
* SimHash         — 64-bit sign-aggregated token hash, hamming buckets
* embedding cosine— near-dup pairs over an embedding column

Hash choice: md5 (bit-identical in Spark and DuckDB) EVERYWHERE — including
SimHash, whose 60-bit token hash is the first 15 md5 hex chars parsed as an
integer, so every dedup family has an exact DuckDB oracle twin.  MinHash
with a *string-lexicographic min* of md5 hex digests is unconventional but
correct (a uniform hash order statistic) and makes the whole pipeline
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_of_tokens, ws_tokens
from ..util import spread_small_input


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per distinct text, keeping the smallest id.
    Single hash aggregate on md5(text) — never shuffles full text twice."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def token_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    ngram: int = 1,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Exact token-SET Jaccard similar pairs via inverted index.

    ``ngram`` > 1 switches the set elements from single tokens to word
    n-gram shingles (order-sensitive near-dup detection: token sets are
    identical under word reordering, shingle sets are not) — the exact
    counterpart of the MinHash pipeline's shingles.

    Plan: explode distinct tokens → OPTIONAL document-frequency cut →
    self-join on token (the inverted index; co-partitioned equi-join, no
    cross product) → distinct candidate pairs → exact Jaccard recomputed on
    the FULL token sets of each candidate (``array_intersect``), so the cut
    affects CANDIDATE RECALL only, never the reported similarity value.

    ``max_df``: drop tokens appearing in more than this many documents from
    the index.  This is the guard the verify step needs at corpus scale — a
    single stop-word-like token otherwise creates a quadratic join bucket
    (df² candidate pairs from one token).  The high-df token list is tiny by
    definition → broadcast anti-join, no extra shuffle of the index.  Recall
    contract: a qualifying pair is found iff it shares ≥1 sub-cut token;
    pairs similar ONLY through super-common tokens are deliberately missed
    (documented trade — at threshold ≥ 0.5 such pairs are stop-word shells).

    ``max_df_frac``: the same cut as a corpus FRACTION, with the threshold
    ``greatest(2, floor(n_docs * frac))`` derived INSIDE the plan (a 1-row
    count aggregate broadcast into the token-df filter) — no separate
    driver-side ``count()`` job before the query runs.  Mutually exclusive
    with ``max_df``.
    """
    if max_df is not None and max_df_frac is not None:
        raise ValueError("pass max_df or max_df_frac, not both")
    elems = (
        F.array_distinct(F.col("_t"))
        if ngram <= 1
        else F.array_distinct(shingles_of_tokens(F.col("_t"), ngram))
    )
    base = docs.select(
        F.col(id_col).alias("did"),
        ws_tokens(F.lower(F.col(text_col))).alias("_t"),  # bound: see text.py
    ).select("did", elems.alias("toks"))
    toks = base.select("did", F.explode("toks").alias("tok"))
    idx = toks
    if max_df is not None or max_df_frac is not None:
        dfs = toks.groupBy("tok").agg(F.count("*").alias("df"))
        if max_df is not None:
            hot = dfs.filter(F.col("df") > max_df).select("tok")
        else:
            # corpus size as broadcast DATA (1-row aggregate), not a
            # pre-computed literal: the cut threshold is part of this one
            # query's plan instead of a separate count() job
            total = docs.select(F.count("*").alias("_n"))
            cut = F.greatest(
                F.lit(2).cast("long"),
                F.floor(F.col("_n") * F.lit(max_df_frac)).cast("long"),
            )
            hot = (
                dfs.crossJoin(F.broadcast(total))
                .filter(F.col("df") > cut)
                .select("tok")
            )
        idx = toks.join(F.broadcast(hot), "tok", "left_anti")
    a, b = idx.alias("a"), idx.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.did") < F.col("b.did")))
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .distinct()
    )
    sa = base.select(F.col("did").alias("id_a"), F.col("toks").alias("toks_a"))
    sb = base.select(F.col("did").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                inter.cast("double")
                / (F.size("toks_a") + F.size("toks_b") - inter).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(
    docs: DataFrame,
    num_hashes: int = 12,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """k-min-hash signature: for seed s, ``min(md5(shingle || '#' || s))``.

    One explode + one grouped aggregate with k min() columns — map-side
    combine keeps the shuffle at k hex strings per doc regardless of
    document length.  The token array is materialized in its own projection
    before the shingle lambda (see ``shingles_of_tokens`` scale note: an
    inline split would be re-executed per shingle index — quadratic).
    """
    sh = spread_small_input(docs).select(
        F.col(id_col).alias("did"),
        ws_tokens(F.lower(F.col(text_col))).alias("_toks"),
    ).select(
        "did",
        F.explode(shingles_of_tokens(F.col("_toks"), shingle_n)).alias("sh"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("sh"), F.lit(f"#{s}")))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy("did").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_cap: int = 4096,
) -> DataFrame:
    """MinHash-LSH candidate pairs: signature → ``bands`` band hashes →
    docs sharing any band bucket.  Distinct (id_a < id_b) pairs.

    This is the 10^10-doc path: candidates come from equi-joins on band
    hash (shuffle keyed by band value — hot buckets are bounded by band
    width), and only candidates ever reach the exact-verify step
    (``token_jaccard_pairs`` on the candidate set).

    Pair expansion is two-path, NO pairs are ever dropped:

    * buckets with ≤ ``bucket_cap`` members expand in ONE grouped pass
      (members collected sorted, pairs expanded inside the array — a
      self-join here would recompute the whole signature pipeline once per
      side);
    * degenerate buckets ABOVE the cap (e.g. an all-identical corpus slice)
      would blow the grouped row past executor memory (cap² structs in one
      array), so their members are re-exploded and pair-expanded by a
      distributed self-join on (band, bh) instead — same result, the
      quadratic work spread across tasks.

    The grouped members table is LOCALLY CHECKPOINTED (lazy) before the
    branches: ``collect_list`` is non-deterministic to Catalyst, which
    disables exchange reuse, so without the checkpoint the whole signature
    pipeline (every shingle md5) re-executes once per branch side —
    measured 3× the hashing work.  Local checkpoint blocks are
    ContextCleaner-managed (freed when the DataFrame is GC'd) but not
    fault-tolerant: on a real cluster an executor loss forces a stage
    retry — for a 10^10-doc run persist the signature table explicitly
    (it is reused by the verify pass anyway) instead.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature(docs, num_hashes, shingle_n, id_col, text_col)
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{j * r + i}") for i in range(r)])).alias(
                "bh"
            ),
        )
        for j in range(bands)
    ]
    banded = sig.select(
        "did", F.explode(F.array(*band_structs)).alias("b")
    ).select("did", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    members = banded.groupBy("band", "bh").agg(
        F.array_sort(F.collect_list("did")).alias("dids")
    ).localCheckpoint(eager=False)
    small = members.filter((F.size("dids") > 1) & (F.size("dids") <= bucket_cap))
    small_pairs = small.select(
        F.explode(
            F.expr(
                "flatten(transform(dids, (x, i) -> "
                "transform(slice(dids, i + 2, size(dids) - i - 1), "
                "y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    big = members.filter(F.size("dids") > bucket_cap).select(
        "band", "bh", F.explode("dids").alias("did")
    )
    big_pairs = (
        big.alias("a")
        .join(
            big.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
    )
    return small_pairs.unionByName(big_pairs).distinct()


SIMHASH_BITS = 60  # 15 md5 hex chars → cross-engine (Spark conv ≡ DuckDB CAST)
SIMHASH_BLOCK = 15  # 4 blocks of 15 bits


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash over whitespace tokens.

    Per doc: for each bit position, sum +1/-1 over tokens by that bit of
    the token hash; the sign vector packs into one long.  Implemented as
    explode + single aggregate of 60 sums — no Python, no UDF.

    Hash choice: the token hash is the first 15 hex chars of md5 parsed as
    an integer — 60 uniform bits that DuckDB reproduces bit-identically
    (``CAST('0x'||substr(md5(tok),1,15) AS BIGINT)``), making the whole
    SimHash pipeline oracle-checkable (xxhash64 had no DuckDB twin).
    """
    # Formulation note (measured, round 3): a shuffle-free per-doc variant
    # (bind the token-hash array, 60 ``F.aggregate`` folds per row) is the
    # asymptotically attractive shape but measured 15.3 s vs 3.2 s at sf0.1
    # — higher-order-function lambdas are interpreted per element, outside
    # whole-stage codegen, so 60 folds lose badly to this codegen'd
    # 60-buffer hash aggregate.  The shuffle here moves one ±1 row per
    # (doc, token) with full map-side partial aggregation — at 100 TB the
    # partials collapse to one 60-int row per doc per map task before the
    # exchange.
    toks = spread_small_input(docs).select(
        F.col(id_col).alias("did"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("did").agg(*bit_sums)
    packed = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        packed = term if packed is None else packed.bitwiseXOR(term)
    return agg.select("did", packed.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: block on 15-bit quarters (pigeonhole: a pair
    within hamming ≤ 3 MUST share an exact quarter; beyond that the blocks
    are a high-recall heuristic — differing bits cluster for near-dups),
    then verify hamming distance on candidates only."""
    sh = simhash(docs, id_col, text_col)
    quarters = sh.select(
        "did",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(F.col("simhash"), q * SIMHASH_BLOCK)
                        .bitwiseAND(F.lit((1 << SIMHASH_BLOCK) - 1))
                        .alias("qh"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("b"),
    ).select("did", "simhash", "b.q", "b.qh")
    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qh") == F.col("b.qh"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(
            F.col("a.did").alias("id_a"),
            F.col("b.did").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _cosine(a, b):
    """Deterministic cosine: sequential left-fold dot products (same
    association order as the DuckDB oracle's list_reduce)."""
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold.

    Brute-force O(n²) self-join — correct baseline for verification and
    small corpora.  The scale path is ``similarity.knn_lsh_bucketed``:
    bucket by random-hyperplane signs first, compare within buckets.
    """
    v = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(_cosine(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def sample_bucket(id_col: str, salt: int = 0):
    """The 0-99 hash bucket column behind ``deterministic_sample`` — a pure
    Column expression, exposed so callers needing a membership FLAG (e.g.
    stratified sample counting) compute it inline instead of materializing
    the sampled ids and joining them back."""
    m31 = 2_147_483_648  # 2^31
    return (
        F.pmod(
            F.pmod(F.col(id_col).cast("long") + F.lit(salt), F.lit(m31))
            * F.lit(2_654_435_761),
            F.lit(m31),
        )
        % 100
    )


def deterministic_sample(
    df: DataFrame, id_col: str, rate_pct: int, salt: int = 0
) -> DataFrame:
    """Deterministic hash-based sampling: keep a row iff its id's hash
    bucket (0-99) is below ``rate_pct``.

    Training-data curation needs samples that are REPRODUCIBLE across runs,
    engines, and partitionings (``df.sample`` is none of those: it is
    partition-order dependent and seed-coupled to the split layout).  The
    hash is Knuth's multiplicative scheme over the id — expressible
    identically in any SQL engine (the DuckDB oracle runs the same
    arithmetic), unlike ``xxhash64``, which is Spark-specific.  The filter
    is a pure narrow projection: no shuffle, fully pushdown-friendly, and
    composes with any downstream op at 100 TB.

    The id is reduced mod 2^31 before multiplying so the product stays in
    int64 for any bigint id.
    """
    return df.filter(sample_bucket(id_col, salt) < rate_pct)
