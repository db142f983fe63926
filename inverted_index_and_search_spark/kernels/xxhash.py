"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression exactly.

Why: query-time bucket pruning needs ``pmod(xxhash64(term), n_buckets)``
for a handful of terms. Evaluating that through Spark requires building
a 1-row-per-term DataFrame and collecting it — a full (tiny) Spark job
on EVERY query, ~50-100 ms of pure scheduling latency. The query terms
are already driver-side strings, so hashing them driver-side removes
one job per query from the interactive path.

Correctness: Spark's ``XxHash64`` is the standard XXH64 algorithm over
the UTF-8 bytes with seed 42, producing a signed 64-bit value
(`org.apache.spark.sql.catalyst.expressions.XxHash64` — public Spark
source). Cross-checked against the JVM expression by a hypothesis
property test (tests/test_tokenizer.py) over random unicode strings.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

#: Spark's seed for the xxhash64 SQL expression
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_signed(s: str, seed: int = SPARK_SEED) -> int:
    """Signed 64-bit hash of a string — equals Spark ``xxhash64(col)``."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of ``index_build.term_bucket_col``:
    ``pmod(xxhash64(term), n_buckets)`` (pmod = non-negative modulus)."""
    return xxh64_signed(term) % n_buckets


def xxh64_signed_long(v: int, seed: int = SPARK_SEED) -> int:
    """Signed 64-bit hash of a LONG — equals Spark ``xxhash64(bigint)``.

    Spark's XxHash64 hashes a long via the specialized ``hashLong``
    path, which is exactly XXH64 over the value's 8 little-endian bytes
    (same ``n=8`` tail as the byte-stream algorithm) — cross-checked by
    a hypothesis property test vs the JVM expression."""
    h = xxh64(int(v).to_bytes(8, "little", signed=True), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def doc_bucket(doc_id: int, n_buckets: int) -> int:
    """Driver-side twin of ``index_build.doc_bucket_col``:
    ``pmod(xxhash64(doc_id), n_buckets)`` — the forward (doc-keyed)
    layout's partition key, evaluated without a Spark job so point
    lookups prune partitions driver-side."""
    return xxh64_signed_long(doc_id) % n_buckets
