"""Driver-side replica of Spark's ``xxhash64`` for point-lookup bucket
pinning.

``ManifestTable.read(where={bucket_col: (k, k)})`` pins the single hash
bucket that can hold key ``k`` (the Iceberg bucket-transform analogue).
Hashing the literal through a 1-row Spark job is correct but costs ~100 ms
of scheduler latency per point lookup — on an O(one-bucket) metadata read
that job IS the latency.  This module computes the same hash driver-side
for the literal types a bucket column practically is (string, integral,
date, timestamp), property-tested byte-identical to ``F.xxhash64`` in
``tests/test_hashing.py``; unsupported types fall back to the Spark job.

The algorithm is the public xxHash64 (Yann Collet, BSD); Spark's
``XXH64``/``XxHash64`` expression applies it with seed 42 to the value's
internal representation: UTF-8 bytes for strings, the 8-byte
little-endian long for long/timestamp-micros, the 4-byte little-endian
int for int/short/byte/date-days.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import types as T

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_HASH_SEED = 42  # Spark's fixed seed for hash()/xxhash64()


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, val: int) -> int:
    return (_rotl((acc + val * _P2) & _M, 31) * _P1) & _M


def xxhash64(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """xxHash64 of ``data`` (unsigned 64-bit result)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= length - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + length) & _M
    while i + 8 <= length:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= length:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < length:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def spark_xxhash64(value, dtype: T.DataType) -> int | None:
    """``F.xxhash64(lit(value).cast(dtype))`` computed driver-side, as a
    SIGNED 64-bit int (Spark's LongType result).  Returns None for types
    this replica does not cover — callers fall back to a Spark job."""
    if value is None:
        return SPARK_HASH_SEED  # hash expressions skip null inputs
    if isinstance(dtype, T.StringType) and isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(dtype, T.LongType) and isinstance(value, int):
        data = (value & _M).to_bytes(8, "little")
    elif isinstance(
        dtype, (T.IntegerType, T.ShortType, T.ByteType)
    ) and isinstance(value, int):
        data = (value & 0xFFFFFFFF).to_bytes(4, "little")
    elif isinstance(dtype, T.DateType) and isinstance(value, _dt.date):
        days = (value - _EPOCH_DATE).days
        data = (days & 0xFFFFFFFF).to_bytes(4, "little")
    elif isinstance(
        dtype, (T.TimestampType, T.TimestampNTZType)
    ) and isinstance(value, _dt.datetime):
        # internal representation is epoch MICROS; exact integer arithmetic
        # (datetime.timestamp() floats would round near the precision edge)
        v = value if value.tzinfo else value.replace(tzinfo=_dt.timezone.utc)
        d = v - _EPOCH_TS
        micros = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
        data = (micros & _M).to_bytes(8, "little")
    else:
        return None
    h = xxhash64(data)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_bucket(value, dtype: T.DataType, n_buckets: int) -> int | None:
    """``pmod(xxhash64(value), n_buckets)`` driver-side — the bucket
    ``sinks.manifest._bucket_expr`` assigns.  Python's ``%`` on the signed
    hash already matches Java's pmod for positive moduli."""
    h = spark_xxhash64(value, dtype)
    return None if h is None else h % n_buckets


def _xxh64_fixed_np(v, nbytes: int):
    """Vectorized xxHash64 of a fixed-width little-endian input per row:
    ``v`` is a numpy uint64 array holding each row's input word (an 8-byte
    long/timestamp-micros value, or a 4-byte int/date zero-extended to
    uint64).  Follows the scalar ``xxhash64`` short path exactly — inputs
    < 32 bytes skip the accumulator lanes, so the whole hash is three
    multiply/rotate steps + the avalanche, all of which wrap modulo 2^64
    for free in numpy uint64 arithmetic."""
    import numpy as np

    u = np.uint64
    with np.errstate(over="ignore"):
        h = np.full(v.shape, (SPARK_HASH_SEED + _P5 + nbytes) & _M, dtype=np.uint64)
        if nbytes == 8:
            acc = v * u(_P2)
            acc = ((acc << u(31)) | (acc >> u(33))) * u(_P1)
            h ^= acc
            h = ((h << u(27)) | (h >> u(37))) * u(_P1) + u(_P4)
        elif nbytes == 4:
            h ^= v * u(_P1)
            h = ((h << u(23)) | (h >> u(41))) * u(_P2) + u(_P3)
        else:  # pragma: no cover - callers pass 4 or 8 only
            raise ValueError(f"unsupported fixed width {nbytes}")
        h ^= h >> u(33)
        h *= u(_P2)
        h ^= h >> u(29)
        h *= u(_P3)
        h ^= h >> u(32)
    return h


def spark_bucket_array(arr, dtype: T.DataType, n_buckets: int):
    """``pmod(xxhash64(col), n_buckets)`` for a whole pyarrow array — the
    vectorized executor-side twin of ``spark_bucket``, used by the
    ``edem_cdc`` streaming SINK to assign each incoming change row to the
    table's hash bucket without a Spark job.  Fixed-width types (long,
    int/short/byte, date, timestamp) go through a numpy-vectorized xxHash64
    short path; strings fall back to the scalar per-value hash (xxHash64 is
    data-length-dependent, so variable-width input does not vectorize —
    at ~1 µs/row the Python loop still clears the surrounding Arrow IO).

    Returns a numpy int32 array of bucket ids.  NULL inputs hash to the
    seed (Spark's hash expressions skip null inputs), i.e. bucket
    ``42 % n_buckets`` — byte-identical to ``_bucket_expr``'s assignment,
    property-tested against ``F.xxhash64`` in ``tests/test_hashing.py``."""
    import numpy as np
    import pyarrow as pa

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    null_mask = arr.is_null().to_numpy(zero_copy_only=False)
    if isinstance(dtype, T.StringType):
        out = np.empty(len(arr), dtype=np.int64)
        for i, v in enumerate(arr.to_pylist()):
            h = SPARK_HASH_SEED if v is None else spark_xxhash64(v, dtype)
            out[i] = h % n_buckets
        return out.astype(np.int32)
    if isinstance(dtype, T.LongType):
        vals = arr.fill_null(0).to_numpy(zero_copy_only=False)
        words = vals.astype(np.int64).view(np.uint64)
        nbytes = 8
    elif isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        vals = arr.fill_null(0).to_numpy(zero_copy_only=False)
        words = (vals.astype(np.int64) & 0xFFFFFFFF).astype(np.uint64)
        nbytes = 4
    elif isinstance(dtype, T.DateType):
        days = arr.cast(pa.int32()).fill_null(0).to_numpy(zero_copy_only=False)
        words = (days.astype(np.int64) & 0xFFFFFFFF).astype(np.uint64)
        nbytes = 4
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        micros = arr.cast(pa.timestamp("us")).cast(pa.int64())
        vals = micros.fill_null(0).to_numpy(zero_copy_only=False)
        words = vals.astype(np.int64).view(np.uint64)
        nbytes = 8
    else:
        raise ValueError(
            f"unsupported bucket column type {dtype.simpleString()!r} for "
            f"executor-side bucket assignment (string/int/long/date/"
            f"timestamp only)"
        )
    h = _xxh64_fixed_np(words, nbytes)
    buckets = (h.view(np.int64) % n_buckets).astype(np.int32)
    if null_mask.any():
        buckets[null_mask] = SPARK_HASH_SEED % n_buckets
    return buckets
