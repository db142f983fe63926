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


# ----------------------------------------------- more-like-this + facets

def _oracle_mlt(oracle_idx, src: int, k_terms: int = 10, k: int = 10):
    import math

    n = oracle_idx.n_docs
    prof = sorted(
        ((t, posts[src] * math.log((n + 1.0) / (len(posts) + 1.0)))
         for t, posts in oracle_idx.postings.items() if src in posts),
        key=lambda x: (-x[1], x[0]))[:k_terms]
    terms = [t for t, _ in prof]
    cand = {d for t in terms for d in oracle_idx.postings[t]} - {src}
    scored = sorted(((d, oracle.bm25_score(oracle_idx, d, terms))
                     for d in cand), key=lambda x: (-x[1], x[0]))[:k]
    return terms, scored


@pytest.mark.parametrize("src", [0, 3, 17])
def test_more_like_this_matches_oracle(index, oracle_idx, src):
    terms, want = _oracle_mlt(oracle_idx, src)
    got = [(r["doc_id"], r["score"])
           for r in q.more_like_this(index, src, k_terms=10, k=10).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (gd, gs, ws)
    assert src not in [g[0] for g in got]


def test_more_like_this_empty_doc(index, spark):
    # a doc_id with no postings (out of range) -> empty result, stable schema
    res = q.more_like_this(index, 10_000_000)
    assert res.columns == ["doc_id", "score"] and res.count() == 0


def test_facet_counts_matches_pandas(index, docs_df, corpus_pdf, oracle_idx):
    from inverted_index_and_search_spark.operators import facets as fc

    matched = q.boolean_and(index, ["def"])
    match_ids = set(oracle.boolean_and(oracle_idx, ["def"]))
    assert match_ids, "fixture must match"
    sub = corpus_pdf[corpus_pdf["doc_id"].isin(match_ids)]
    want = []
    for f in ("lang", "repo"):
        vc = sub[f].value_counts()
        want += sorted(((f, v, int(c)) for v, c in vc.items()),
                       key=lambda r: (-r[2], r[1]))
    got = [(r["field"], r["value"], r["n_docs"])
           for r in fc.facet_counts(matched, docs_df, ["lang", "repo"])
           .collect()]
    assert got == want


def test_facet_counts_rejects_unknown_field(index, docs_df):
    from inverted_index_and_search_spark.operators import facets as fc

    with pytest.raises(ValueError, match="unknown facet"):
        fc.facet_counts(q.boolean_and(index, ["def"]), docs_df, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        fc.facet_counts(q.boolean_and(index, ["def"]), docs_df, [])


def test_search_facets_composes_with_field_atoms(index, docs_df, corpus_pdf):
    """Facets over a field-filtered expression: the lang facet of
    'def AND NOT lang:markdown' must contain no markdown bucket."""
    from inverted_index_and_search_spark.operators import facets as fc

    rows = fc.search_facets(index, "def AND NOT lang:markdown",
                            docs_df, ["lang"]).collect()
    langs = {r["value"] for r in rows}
    assert langs and "markdown" not in langs
