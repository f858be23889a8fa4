"""Training-data pipeline operators: dedup family, similarity, multimodal."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from event_driven_etl_msc_research_spark.operators import docops, similarity
from event_driven_etl_msc_research_spark.operators.multimodal import (
    extract_binary_features,
    frame_sample_stub,
    with_binary_payload,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup
    (2, "the quick brown fox jumps over the lazy dog near the river edge"),  # near dup
    (3, "a completely different document about spark query engines and shuffles"),
    (4, "another unrelated text mentioning parquet manifests and snapshots here"),
    (5, "the quick brown fox leaps over the lazy dog near the river bank"),  # near dup
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_dedup_exact(spark, docs):
    out = {r["keep_id"]: r["n_copies"] for r in docops.dedup_exact(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse, keep min id
    assert len(out) == 5


def test_token_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in docops.token_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.8  # one-token edit
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_near_dups(spark, docs):
    cand = {
        (r["id_a"], r["id_b"])
        for r in docops.minhash_lsh_pairs(docs, num_hashes=12, bands=6).collect()
    }
    # exact dup must always share all bands; near-dups should bucket together
    assert (0, 1) in cand
    assert (0, 2) in cand or (1, 2) in cand
    # unrelated docs should not flood the candidate set
    assert (3, 4) not in cand


def test_simhash_identical_docs_zero_hamming(spark, docs):
    sh = {r["did"]: r["simhash"] for r in docops.simhash(docs).collect()}
    assert sh[0] == sh[1]

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    # near-dup is closer than an unrelated doc (simhash on short docs is
    # noisy — one-token edits can flip several bits — so assert ordering,
    # not an absolute distance)
    assert hamming(sh[0], sh[2]) < hamming(sh[0], sh[3])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in docops.simhash_near_pairs(docs, max_hamming=16).collect()
    }
    assert pairs[(0, 1)] == 0


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.randn(40, 16).astype("float32")
    base[1] = base[0] + 0.01 * rng.randn(16).astype("float32")  # near-dup of 0
    pdf = pd.DataFrame(
        {"vec_id": range(40), "embedding": [list(map(float, v)) for v in base]}
    )
    return spark.createDataFrame(pdf)


def test_embedding_cosine_pairs(spark, emb):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in docops.embedding_cosine_pairs(emb, threshold=0.99).collect()
    }
    assert pairs.get((0, 1), 0) > 0.99
    assert len(pairs) == 1


def test_knn_bruteforce_and_lsh(spark, emb):
    exact = similarity.knn_bruteforce(emb, [0], k=5, vec_col="embedding").collect()
    assert [r["rank"] for r in exact] == [1, 2, 3, 4, 5]
    assert exact[0]["nid"] == 1  # the planted near-dup is rank 1
    cos = [r["cosine"] for r in exact]
    assert cos == sorted(cos, reverse=True)

    approx = similarity.knn_lsh_bucketed(
        emb, [0], k=5, n_planes=2, dim=16, vec_col="embedding"
    ).collect()
    assert len(approx) > 0
    exact_set = {r["nid"] for r in exact}
    approx_set = {r["nid"] for r in approx}
    # every approx hit must carry the TRUE cosine (scores are exact even
    # when the candidate set is approximate)
    exact_scores = {r["nid"]: r["cosine"] for r in exact}
    for r in approx:
        if r["nid"] in exact_scores:
            assert r["cosine"] == exact_scores[r["nid"]]
    assert approx_set & exact_set, "LSH recall@5 must be > 0"


def test_multimodal_feature_plumbing(spark, docs):
    feats = {
        r["doc_id"]: r for r in extract_binary_features(with_binary_payload(docs)).collect()
    }
    for doc_id, text in DOCS:
        b = text.encode()
        assert feats[doc_id]["n_bytes"] == len(b)
        assert feats[doc_id]["first_byte"] == b[0]
        assert feats[doc_id]["content_md5"] == hashlib.md5(b).hexdigest()


def test_frame_sample_stub(spark, docs):
    frames = frame_sample_stub(with_binary_payload(docs), every_n=10).collect()
    assert all(r["frame_idx"] % 10 == 0 for r in frames)
    # every doc yields at least frame 0
    assert {r["doc_id"] for r in frames} == {d for d, _ in DOCS}


def test_decode_stub_raises(spark):
    from event_driven_etl_msc_research_spark.operators.multimodal import _decode_image

    with pytest.raises(NotImplementedError, match="image decode"):
        _decode_image(b"\x89PNG")
