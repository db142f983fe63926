"""Randomized differential test: block-max WAND must be rank-identical
to exhaustive evaluation for arbitrary posting-list shapes (this is the
test class that catches pruning bugs — e.g. shallow skips must be
capped at the first cursor beyond the pivot)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from inverted_index_and_search_spark.kernels import bm25


@st.composite
def term_sets(draw):
    n_docs = draw(st.integers(min_value=5, max_value=400))
    n_terms = draw(st.integers(min_value=1, max_value=5))
    seed = draw(st.integers(min_value=0, max_value=2**31))
    rng = np.random.default_rng(seed)
    dl = rng.integers(1, 300, n_docs).astype(np.int64)
    avgdl = float(dl.mean())
    terms = []
    for _ in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        ids = np.sort(rng.choice(n_docs, df, replace=False)).astype(np.int64)
        tf = rng.integers(1, 20, df).astype(np.int64)
        block = int(rng.choice([4, 16, 128]))
        terms.append((ids, tf, dl[ids], bm25.idf(n_docs, df), avgdl, block))
    k = draw(st.integers(min_value=1, max_value=20))
    conj = draw(st.booleans())
    return terms, k, conj


def _mk(terms):
    return [
        bm25.TermPostings.from_arrays(ids, tf, dls, t_idf, avgdl, block=block)
        for ids, tf, dls, t_idf, avgdl, block in terms
    ]


@given(term_sets())
@settings(max_examples=300, deadline=None)
def test_wand_equals_exhaustive(case):
    terms, k, conj = case
    got = bm25.wand_topk(_mk(terms), k, conjunctive=conj)
    want = bm25.exhaustive_topk(_mk(terms), k, conjunctive=conj)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9
