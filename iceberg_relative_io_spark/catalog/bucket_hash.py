"""Iceberg-spec bucket transform: 32-bit Murmur3 (x86, seed 0).

The table format's ``bucket(N, col)`` partition transform originally
hashed with Spark's ``xxhash64`` — fast and JVM-native, but NOT what the
Iceberg spec mandates, so exported tables had to drop their bucket
partition field (an external engine pruning by the wrong hash would
silently lose rows). This module implements the spec's hash (Iceberg
spec "Partition Transforms" + Appendix B: Murmur3_x86_32 with seed 0
over a type-specific byte representation) so that

- NEW tables hash buckets spec-compatibly (metadata records
  ``"bucket-hash": "murmur3"``; tables without the key keep reading and
  writing with the legacy xxhash64 — transform VERSIONING, not a silent
  swap that would misplace every pre-existing file);
- exports retain ``bucket[N]`` in ``partition-specs`` with hashes any
  compliant reader can prune by;
- the engine itself can prune bucket layouts driver-side for equality
  predicates (xxhash64 had no Python mirror, so bucketed files could
  never be skipped before the scan).

Byte representations (spec Appendix B):
  int/long/date/timestamp -> 8-byte little-endian of the widened long
  (date: days since epoch; timestamp: micros since epoch);
  string -> UTF-8 bytes; binary -> raw bytes; decimal -> minimal
  two's-complement big-endian of the unscaled value (Java
  ``BigInteger.toByteArray``).
Bucket id = ``(hash & Integer.MAX_VALUE) % N``.

The column-side implementation is an Arrow-batched pandas UDF: for
integral sources the hash is fully vectorized in numpy (uint32 lanes,
two fixed blocks — no per-row Python), so write-path bucketing of a
100 TB append stays a single codegen'd projection plus one vectorized
batch pass. String sources hash per row (variable length defeats lane
vectorization) — still Arrow-batched, and only on the write path.

Verified against the public spec's Appendix B test vectors
(tests/test_iceberg_export.py::test_murmur3_spec_vectors).
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve from module globals

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF
_EPOCH = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1)


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3_x86_32 over ``data``; returns a SIGNED int32 (Java's
    convention, which the spec's published vectors use)."""
    h = seed & _M32
    n_blocks = len(data) // 4
    for i in range(n_blocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n_blocks * 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _hash_long(v: int) -> int:
    return murmur3_32(struct.pack("<q", v))


def _min_twos_complement(v: int) -> bytes:
    """Minimal two's-complement big-endian bytes (Java
    ``BigInteger.toByteArray``) — the spec's byte representation for a
    decimal's unscaled value."""
    length = max(1, (v.bit_length() + 7) // 8)
    try:
        return v.to_bytes(length, "big", signed=True)
    except OverflowError:  # positive value needing a leading sign byte
        return v.to_bytes(length + 1, "big", signed=True)


def _hash_decimal(v) -> int:
    exp = v.as_tuple().exponent
    unscaled = int(v.scaleb(-exp)) if exp < 0 else int(v)
    return murmur3_32(_min_twos_complement(unscaled))


def bucket_value(v, n: int) -> int | None:
    """Driver-side bucket id for a Python value (spec widening rules);
    None for None. Used for manifest pruning and export checks."""
    if v is None:
        return None
    if isinstance(v, bool):
        raise TypeError("bucket transform is undefined for boolean")
    if isinstance(v, int):
        if not (-(1 << 63) <= v < (1 << 63)):
            # outside int64: no stored long can equal this predicate
            # value, but the PRUNING caller guards on TypeError only —
            # struct.error from the pack would crash scan planning
            # instead of falling back to keep-all
            raise TypeError(f"bucket source value out of int64 range: {v}")
        h = _hash_long(v)
    elif isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        h = _hash_long((v - _EPOCH_DT) // timedelta(microseconds=1))
    elif isinstance(v, date):
        h = _hash_long((v - _EPOCH).days)
    elif isinstance(v, str):
        h = murmur3_32(v.encode("utf-8"))
    elif isinstance(v, (bytes, bytearray)):
        h = murmur3_32(bytes(v))
    elif isinstance(v, Decimal):
        h = _hash_decimal(v)
    else:
        raise TypeError(f"bucket transform unsupported for {type(v).__name__}")
    return (h & 0x7FFFFFFF) % n


# ---------------------------------------------------------------------------
# legacy xxhash64 mirror (Spark's F.xxhash64, seed 42) — lets EQUALITY
# predicates prune pre-murmur3 bucket layouts driver-side too. Pinned
# against Spark's own output in tests (the ground truth), public XXH64
# algorithm.
# ---------------------------------------------------------------------------

_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h


def xxhash64_long(v: int, seed: int = 42) -> int:
    """Spark XxHash64Function.hashLong: long/timestamp columns."""
    h = (seed + _XP5 + 8) & _M64
    k1 = (_rotl64((v & _M64) * _XP2 & _M64, 31) * _XP1) & _M64
    h ^= k1
    h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
    h = _xx_fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_int(v: int, seed: int = 42) -> int:
    """Spark XxHash64Function.hashInt: int/date columns."""
    h = (seed + _XP5 + 4) & _M64
    h ^= ((v & 0xFFFFFFFF) * _XP1) & _M64
    h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
    h = _xx_fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """Full XXH64 over a byte string (Spark hashUnsafeBytes: string and
    binary columns)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        while i + 32 <= length:
            k = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl64((v1 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl64((v2 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl64((v3 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl64((v4 + k * _XP2) & _M64, 31) * _XP1) & _M64
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XP2) & _M64, 31) * _XP1) & _M64
            h = (h * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + length) & _M64
    while i + 8 <= length:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((k * _XP2) & _M64, 31) * _XP1) & _M64
        h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= length:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < length:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    h = _xx_fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def legacy_bucket_value(v, n: int, source_type=None) -> int | None:
    """Driver-side mirror of the legacy layout column
    ``pmod(xxhash64(col), n)`` — enables equality pruning on bucket
    layouts written before the murmur3 switch. None for unsupported
    source types (caller keeps all files, never wrong).

    ``source_type`` (a Spark DataType) is REQUIRED for integer values:
    unlike the Iceberg Murmur3 (which widens int to long so both hash
    identically), Spark's xxhash64 uses the 4-byte hashInt path for
    IntegerType columns and the 8-byte hashLong path for LongType —
    deriving the wrong width prunes the wrong file. Without the type,
    a Python int returns None (keep all)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        from pyspark.sql import types as T

        if isinstance(source_type, T.LongType):
            h = xxhash64_long(v)
        elif isinstance(
            source_type, (T.IntegerType, T.ShortType, T.ByteType)
        ):
            h = xxhash64_int(v)
        else:
            return None  # unknown width: never guess a hash
    elif isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        h = xxhash64_long((v - _EPOCH_DT) // timedelta(microseconds=1))
    elif isinstance(v, date):
        h = xxhash64_int((v - _EPOCH).days)
    elif isinstance(v, str):
        h = xxhash64_bytes(v.encode("utf-8"))
    elif isinstance(v, (bytes, bytearray)):
        h = xxhash64_bytes(bytes(v))
    else:
        return None
    return ((h % n) + n) % n  # Spark pmod


def _mmh3_long_vec(vals):
    """Vectorized Murmur3_x86_32 of 8-byte little-endian longs: the two
    4-byte blocks are the low and high uint32 halves. Pure numpy uint32
    lane arithmetic (wrapping), no per-row Python."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = vals.astype(np.int64).view(np.uint64)
        h = np.zeros(v.shape, dtype=np.uint32)
        for blk in (
            (v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (v >> np.uint64(32)).astype(np.uint32),
        ):
            k = blk * np.uint32(_C1)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(_C2)
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # input length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


def bucket_column(source: str, n: int, dtype):
    """``bucket(N, source)`` as a Spark Column under the spec hash.

    Integral/temporal sources widen to long JVM-side first (codegen'd
    cast / unix_micros / datediff), so ONE numpy-vectorized pandas UDF
    over longs covers them all; strings get the per-row variant. The
    UDF is the write path's only Python step and is Arrow-batched."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _bucket_long(s: pd.Series) -> pd.Series:
        import numpy as np

        mask = s.isna()
        vals = s.fillna(0).to_numpy(dtype=np.int64)
        h = _mmh3_long_vec(vals).view(np.int32)
        out = (h & np.int32(0x7FFFFFFF)) % np.int32(n)
        res = pd.Series(out.astype("int32"))
        res[mask.to_numpy()] = None
        return res

    @pandas_udf("int")
    def _bucket_str(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None
            if x is None
            else (murmur3_32(str(x).encode("utf-8")) & 0x7FFFFFFF) % n
        ).astype("Int32")

    @pandas_udf("int")
    def _bucket_bytes(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None
            if x is None
            else (murmur3_32(bytes(x)) & 0x7FFFFFFF) % n
        ).astype("Int32")

    @pandas_udf("int")
    def _bucket_decimal(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None
            if x is None
            else (_hash_decimal(x) & 0x7FFFFFFF) % n
        ).astype("Int32")

    def _null_safe_long(expr):
        # nulls are handled SPARK-SIDE: a batch containing any null
        # reaches pandas as float64 with some pyarrow/pandas versions,
        # and int64 values beyond 2^53 then round BEFORE hashing — a
        # silently wrong bucket (wrong file placement + wrong pruning).
        # Coalescing to 0 keeps every batch pure int64; the when()
        # restores NULL for null sources.
        return F.when(
            expr.isNull(), F.lit(None).cast("int")
        ).otherwise(_bucket_long(F.coalesce(expr, F.lit(0).cast("long"))))

    col = F.col(source)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return _null_safe_long(col.cast("long"))
    if isinstance(dtype, T.DateType):
        return _null_safe_long(F.datediff(col, F.lit("1970-01-01")).cast("long"))
    if isinstance(dtype, T.TimestampType):
        return _null_safe_long(F.unix_micros(col))
    if isinstance(dtype, T.TimestampNTZType):
        # NTZ micros must be WALL-CLOCK: casting NTZ -> timestamp routes
        # through the session timezone and shifts the value (wrong
        # bucket on any non-UTC session); timestampdiff on NTZ operands
        # is pure calendar arithmetic, timezone-free
        return _null_safe_long(
            F.expr(
                f"timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {source})"
            )
        )
    if isinstance(dtype, T.StringType):
        return _bucket_str(col)
    if isinstance(dtype, T.BinaryType):
        return _bucket_bytes(col)
    if isinstance(dtype, T.DecimalType):
        # spec: murmur3 of the unscaled value's minimal two's-complement
        # big-endian bytes (Java BigInteger.toByteArray)
        return _bucket_decimal(col)
    raise TypeError(
        f"bucket transform unsupported for source type {dtype.simpleString()}"
    )
