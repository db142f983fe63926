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


def test_nondefault_bucket_count_roundtrip(spark, docs_df, tmp_path_factory):
    """n_buckets is persisted with the index and used for query-time
    bucket pruning: an index built with a non-default modulus must
    return complete results after write/read (round-1 hardcoded 32 at
    query time, silently pruning away matching postings)."""
    import inverted_index_and_search_spark.operators.index_build as ib

    idx7 = ib.build_index(docs_df, n_buckets=7)
    out = str(tmp_path_factory.mktemp("idx7"))
    ib.write_index(idx7, out)
    r7 = ib.read_index(spark, out)
    assert r7.n_buckets == 7
    base = ib.build_index(docs_df)  # in-memory default
    for terms in [["def"], ["def", "return", "if", "int"], ["var_3_0"]]:
        got = [r["doc_id"] for r in q.boolean_and(r7, terms).collect()]
        want = [r["doc_id"] for r in q.boolean_and(base, terms).collect()]
        assert got == want, terms
        if terms == ["def"]:
            assert want, "hot keyword must match docs"
        gb = [(r["doc_id"], round(r["score"], 9))
              for r in q.bm25_topk(r7, terms, k=10).collect()]
        wb = [(r["doc_id"], round(r["score"], 9))
              for r in q.bm25_topk(base, terms, k=10).collect()]
        assert gb == wb, terms


# ----------------------------------- prefix / fuzzy / filtered queries

def test_prefix_docs_oracle(index, oracle_idx):
    want = sorted({d for t, posts in oracle_idx.postings.items()
                   if t.startswith("re") for d in posts})
    got = [r["doc_id"] for r in q.prefix_docs(index, "re").collect()]
    assert got == want and got
    assert q.prefix_docs(index, "zzzqqq").collect() == []
    assert q.prefix_docs(index, "").collect() == []


def test_fuzzy_docs_oracle(index, oracle_idx):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    for term, d in [("retrn", 1), ("def", 1), ("xx", 2)]:
        want = sorted({doc for t, posts in oracle_idx.postings.items()
                       if lev(t, term) <= d for doc in posts})
        got = [r["doc_id"]
               for r in q.fuzzy_docs(index, term, d).collect()]
        assert got == want, (term, d)


def test_bm25_doc_filter_restricts_results(spark, index, oracle_idx):
    from inverted_index_and_search_spark import oracle as orc

    allowed = spark.createDataFrame(
        [(d,) for d in range(0, 60, 2)], "doc_id long")
    got = [(r["doc_id"], round(r["score"], 9))
           for r in q.bm25_topk(index, ["def", "return"], k=10,
                                doc_filter=allowed).collect()]
    full = orc.bm25_topk(oracle_idx, ["def", "return"], k=10_000)
    want = [(d, round(s, 9)) for d, s in full if d % 2 == 0][:10]
    assert got == want and got


# ------------------------------------------- sorted dictionary side table

def test_persisted_dictionary_prefix_fuzzy_equal_inmemory(
        spark, index, tmp_path_factory):
    """write_index emits the sorted dictionary; the dictionary-first
    prefix/fuzzy path returns exactly what the in-memory direct scan
    returns."""
    import inverted_index_and_search_spark.operators.index_build as ib

    out = str(tmp_path_factory.mktemp("dictidx"))
    ib.write_index(index, out)
    disk = ib.read_index(spark, out)
    assert disk.dictionary is not None
    for p in ("re", "d", "zzzqqq"):
        got = [r["doc_id"] for r in q.prefix_docs(disk, p).collect()]
        want = [r["doc_id"] for r in q.prefix_docs(index, p).collect()]
        assert got == want, p
    for t, d in (("retrn", 1), ("xx", 2)):
        got = [r["doc_id"] for r in q.fuzzy_docs(disk, t, d).collect()]
        want = [r["doc_id"] for r in q.fuzzy_docs(index, t, d).collect()]
        assert got == want, (t, d)


def test_dictionary_files_cover_disjoint_term_ranges(
        spark, index, tmp_path_factory):
    """The dictionary is range-partitioned + sorted by term, so parquet
    min/max stats can skip whole files for a term-range predicate —
    the property the side table exists for."""
    import glob

    import pyarrow.parquet as pq

    import inverted_index_and_search_spark.operators.index_build as ib

    out = str(tmp_path_factory.mktemp("dictrange"))
    ib.write_index(index, out)
    ranges = []
    for f in glob.glob(f"{out}/dictionary/*.parquet"):
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        if terms:
            assert terms == sorted(terms), f
            ranges.append((terms[0], terms[-1]))
    assert len(ranges) > 1  # genuinely split, not one file
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint, ordered ranges
