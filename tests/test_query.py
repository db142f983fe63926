"""Query correctness vs the oracle: boolean AND set-identical (incl.
missing-term short-circuit + query-side lowercasing), BM25 top-k
rank-identical with scores to 1e-6."""

from __future__ import annotations

import pytest

from inverted_index_and_search_spark import oracle
from inverted_index_and_search_spark.operators import index_build as ib
from inverted_index_and_search_spark.operators import query as q
from tests.conftest import QUERY_SET


@pytest.fixture(scope="module")
def index(docs_df):
    idx = ib.build_index(docs_df)
    idx.postings.cache().count()
    idx.doc_stats.cache().count()
    return idx


@pytest.mark.parametrize("terms", QUERY_SET, ids=["-".join(t) for t in QUERY_SET])
def test_boolean_and(index, oracle_idx, terms):
    got = [r["doc_id"] for r in q.boolean_and(index, terms).collect()]
    want = oracle.boolean_and(oracle_idx, terms)
    assert got == want


@pytest.mark.parametrize("terms", QUERY_SET, ids=["-".join(t) for t in QUERY_SET])
def test_bm25_topk_disjunctive(index, oracle_idx, terms):
    got = [(r["doc_id"], r["score"]) for r in q.bm25_topk(index, terms, k=10).collect()]
    want = oracle.bm25_topk(oracle_idx, terms, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], "rank mismatch"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (gd, gs, ws)


@pytest.mark.parametrize("terms", QUERY_SET, ids=["-".join(t) for t in QUERY_SET])
def test_bm25_topk_conjunctive(index, oracle_idx, terms):
    got = [
        (r["doc_id"], r["score"])
        for r in q.bm25_topk(index, terms, k=10, conjunctive=True).collect()
    ]
    want = oracle.bm25_topk(oracle_idx, terms, k=10, conjunctive=True)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6


def test_empty_query(index):
    assert q.boolean_and(index, []).count() == 0
    assert q.bm25_topk(index, []).count() == 0
