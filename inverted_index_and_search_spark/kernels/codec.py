"""Delta + varint posting-list codec (numpy, Arrow-batch friendly).

North-rule feature absent in the reference (it stores postings as
plain ``"file:count"`` strings, ``spark/inverted_index_search.py:212``).
Format: classic LEB128 varint (7 data bits/byte, high bit =
continuation), doc_ids delta-encoded first (requires doc_id-ascending
postings — guaranteed by the build's sort_array).

Both encode and decode are vectorized numpy — no per-element Python in
the hot loop — so they run fast inside ``mapInPandas`` on executors.

Value domain: non-negative ints < 2**53 (doc-id gaps ≤ 2**40 and
tfs ≤ 2**20 per FIXTURES.md §4 are well inside).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 8  # ceil(53/7)


def encode_varint(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a non-negative int64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if values.min() < 0:
        raise ValueError("varint requires non-negative values")
    # byte j of value i: (v >> 7j) & 0x7f, with continuation bit if more
    shifts = np.arange(_MAX_BYTES, dtype=np.uint64) * np.uint64(7)
    chunks = (v[:, None] >> shifts[None, :]) & np.uint64(0x7F)  # (n, 8)
    # number of bytes per value: position of highest nonzero chunk + 1
    nbytes = np.maximum(
        _MAX_BYTES - (chunks[:, ::-1] != 0).argmax(axis=1), 1
    ) * (v != 0) + (v == 0)  # zero still takes 1 byte
    keep = np.arange(_MAX_BYTES)[None, :] < nbytes[:, None]
    cont = np.arange(_MAX_BYTES)[None, :] < (nbytes - 1)[:, None]
    out = (chunks | (np.uint64(0x80) * cont)).astype(np.uint8)
    return out[keep].tobytes()


def decode_varint(data: bytes, n: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode -> int64 array."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_end = (b & 0x80) == 0
    grp = np.zeros(b.size, dtype=np.int64)
    grp[1:] = np.cumsum(is_end)[:-1]
    n_groups = int(grp[-1]) + 1
    starts = np.zeros(n_groups, dtype=np.int64)
    ends = np.flatnonzero(is_end)
    starts[1:] = ends[:-1] + 1
    pos = np.arange(b.size) - starts[grp]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    vals = np.zeros(n_groups, dtype=np.uint64)
    np.add.at(vals, grp, contrib)
    out = vals.astype(np.int64)
    if n is not None and out.size != n:
        raise ValueError(f"decoded {out.size} values, expected {n}")
    return out


def encode_deltas(sorted_ids: np.ndarray) -> bytes:
    """Delta + varint encode a strictly-increasing int64 array
    (first value absolute, then gaps)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return b""
    deltas = np.empty_like(a)
    deltas[0] = a[0]
    np.subtract(a[1:], a[:-1], out=deltas[1:])
    if a.size > 1 and deltas[1:].min() <= 0:
        raise ValueError("doc_ids must be strictly increasing")
    return encode_varint(deltas)


def decode_deltas(data: bytes, n: int | None = None) -> np.ndarray:
    """Inverse of :func:`encode_deltas`."""
    d = decode_varint(data, n)
    return np.cumsum(d, dtype=np.int64)


def decode_position_lists(data: bytes, counts: np.ndarray) -> np.ndarray:
    """Decode a flat varint stream of per-list delta-encoded position
    lists (first value absolute, then gaps; list boundaries =
    ``counts``) back to a flat absolute-offset array. Grouped cumsum,
    fully vectorized."""
    v = decode_varint(bytes(data), int(counts.sum()))
    if v.size == 0:
        return v
    ends = np.cumsum(counts)
    starts = ends - counts
    c = np.cumsum(v)
    base = np.repeat(c[starts] - v[starts], counts)
    return (c - base).astype(np.int64)
