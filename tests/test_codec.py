"""Codec property tests (FIXTURES.md §4): decode∘encode = id on random
monotone doc_id arrays with gaps up to 2^40 and tfs up to 2^20."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from inverted_index_and_search_spark.kernels import bm25, codec


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=2000)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.asarray(values, dtype=np.int64)
    enc = codec.encode_varint(arr)
    dec = codec.decode_varint(enc, len(values) if values else None)
    assert dec.tolist() == values


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=2000),
    st.integers(min_value=0, max_value=2**30),
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(gaps, start):
    ids = np.cumsum([start + 1] + gaps).astype(np.int64)
    enc = codec.encode_deltas(ids)
    dec = codec.decode_deltas(enc, len(ids))
    assert (dec == ids).all()


def test_varint_compresses_small_gaps():
    ids = np.arange(0, 100_000, dtype=np.int64)  # gaps of 1
    enc = codec.encode_deltas(ids)
    assert len(enc) < 100_001  # ~1 byte per posting vs 8 raw


def test_non_monotone_rejected():
    import pytest

    with pytest.raises(ValueError):
        codec.encode_deltas(np.array([5, 5, 6]))
    with pytest.raises(ValueError):
        codec.encode_varint(np.array([-1]))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2**20),   # tf
            st.integers(min_value=1, max_value=100_000), # dl
        ),
        min_size=1, max_size=500,
    ),
    st.integers(min_value=1, max_value=10**6),  # n_docs
)
@settings(max_examples=100, deadline=None)
def test_block_max_is_upper_bound(postings, n_docs):
    tf = np.array([p[0] for p in postings], dtype=np.int64)
    dl = np.array([p[1] for p in postings], dtype=np.int64)
    ids = np.arange(len(postings), dtype=np.int64)
    df = len(postings)
    scores = bm25.posting_scores(tf, dl, bm25.idf(max(n_docs, df), df), avgdl=250.0)
    bmx, blast = bm25.block_maxes(scores, ids, block=128)
    for i, s in enumerate(scores):
        bi = i // 128
        assert bmx[bi] >= s  # max_score ≥ every in-block score
    for bi in range(len(blast)):
        last_idx = min((bi + 1) * 128, len(postings)) - 1
        assert blast[bi] == ids[last_idx]  # last_doc_id = block's final id


# ------------------------------------------------------ xxhash64 twin

@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=40))
@settings(max_examples=30, deadline=None)
def test_xxh64_pure_python_reference(words):
    """Pure-python XXH64 self-consistency across lengths (all code
    paths: <4, <8, <32, >=32 bytes) — deterministic and total."""
    from inverted_index_and_search_spark.kernels.xxhash import (
        term_bucket,
        xxh64_signed,
    )

    for w in words:
        h = xxh64_signed(w)
        assert -(1 << 63) <= h < (1 << 63)
        assert xxh64_signed(w) == h
        assert 0 <= term_bucket(w, 32) < 32


def test_xxh64_matches_spark_expression(spark):
    """The driver-side twin must equal Spark's xxhash64 EXACTLY —
    a mismatch silently prunes matching buckets at query time."""
    import random

    from pyspark.sql import functions as F

    from inverted_index_and_search_spark.kernels.xxhash import xxh64_signed

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_ünïcode✓漢字"
    words = [""] + ["x" * n for n in (1, 3, 4, 7, 8, 9, 31, 32, 33, 100)] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 60)))
        for _ in range(80)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["h"] for r in df.select("w", F.xxhash64("w").alias("h")).collect()}
    for w in words:
        assert xxh64_signed(w) == got[w], repr(w)


def test_xxh64_long_matches_spark_expression(spark):
    """The LONG twin (forward-layout doc buckets) must equal Spark's
    xxhash64(bigint) exactly — a mismatch silently prunes the wrong
    doc_bucket partition on every forward point lookup."""
    import random

    from pyspark.sql import functions as F

    from inverted_index_and_search_spark.kernels.xxhash import (
        doc_bucket,
        xxh64_signed_long,
    )

    rng = random.Random(11)
    vals = [0, 1, -1, 7, 42, 2**31, -(2**31), 2**62, -(2**62),
            (1 << 63) - 1, -(1 << 63)] + \
        [rng.randrange(-(1 << 63), 1 << 63) for _ in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in
           df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert xxh64_signed_long(v) == got[v], v
        assert 0 <= doc_bucket(v, 32) < 32
