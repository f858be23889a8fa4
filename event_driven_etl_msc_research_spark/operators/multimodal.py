"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
operators.  The decode step itself is STUBBED (no image/audio libs in this
container — gate at import, raise ``NotImplementedError``), but everything
Spark-side is real and tested: schema, batch iteration, partitioning, and a
deterministic fallback feature extractor whose outputs are oracle-checkable
(byte length, first byte, md5) so the plumbing is pinned by the driver's
correctness gate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, first_byte int, content_md5 string"
)


def _decode_image(_: bytes):
    """Real decoder — requires an imaging library not present here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires Pillow/libvips; not available in this "
            "container — deterministic byte-level features are extracted "
            "instead (extract_binary_features)"
        ) from e


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + typed metadata struct (stands in
    for an image/audio payload; deterministic: utf-8 bytes of the text)."""
    blob = F.encode(F.col(text_col), "utf-8")
    return docs.withColumn("payload", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(blob).alias("n_bytes"),
        ),
    )


def extract_binary_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: one pandas batch in, one out — the exact shape a real
    image-decode/resize/embed stage uses.  Features are deterministic
    byte-level stand-ins (length, first byte, md5) so the driver can
    oracle-check the plumbing end-to-end.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id long, out_w int, out_h int, n_bytes_out int, resized_md5 string"
)


def resize_stub(
    docs_with_payload: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Image-resize plumbing via Arrow-batched ``mapInPandas``.

    The real operator decodes the payload, resizes to (width, height), and
    re-encodes inside the batch loop — gated exactly like
    ``_decode_image`` (no imaging libs in this container).  The
    deterministic stand-in 'resize' is byte truncation to width×height
    bytes, so the batch iteration, output schema, and per-row digest are
    all real and oracle-checkable end-to-end."""
    target = width * height

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["payload"].map(lambda b: bytes(b)[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": pd.Series([width] * len(pdf), dtype="int32"),
                    "out_h": pd.Series([height] * len(pdf), dtype="int32"),
                    "n_bytes_out": data.map(len).astype("int32"),
                    "resized_md5": data.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        rs, schema=RESIZE_SCHEMA
    )


def frame_sample_stub(docs_with_payload: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_idx) rows for a
    deterministic fake frame count derived from payload size (1 frame per
    64 bytes), sampling every ``every_n``-th.  The decode itself would sit
    inside the mapInPandas body exactly like extract_binary_features."""
    n_frames = F.floor(F.octet_length("payload") / F.lit(64)).cast("int")
    return docs_with_payload.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
