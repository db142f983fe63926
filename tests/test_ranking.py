"""Ranking-model correctness vs pure-Python twins: Dirichlet QLD,
Lucene-classic TF-IDF, weighted BM25, and the full RM3-shape PRF
pipeline (feedback -> expansion -> interpolated rescore)."""

from __future__ import annotations

import math

import pytest

from inverted_index_and_search_spark.operators import index_build as ib
from inverted_index_and_search_spark.operators import query as q
from inverted_index_and_search_spark.operators import ranking as rk
from tests.conftest import QUERY_SET

MU = rk.DEFAULT_MU


@pytest.fixture(scope="module")
def index(docs_df):
    idx = ib.build_index(docs_df)
    idx.postings.cache().count()
    idx.doc_stats.cache().count()
    return idx


def _norm(terms):
    return sorted({t.lower() for t in terms})


def _py_qld(oracle_idx, terms, k=10):
    norm = [t for t in _norm(terms) if oracle_idx.cf(t) > 0]
    if not norm:
        return []
    c_total = float(oracle_idx.n_docs) * oracle_idx.avgdl
    cand = sorted({d for t in norm for d in oracle_idx.postings[t]})
    out = []
    for d in cand:
        s = sum(
            math.log(1.0 + oracle_idx.postings[t].get(d, 0) * c_total
                     / (MU * oracle_idx.cf(t)))
            for t in norm if d in oracle_idx.postings[t])
        s += len(norm) * math.log(MU / (oracle_idx.dl[d] + MU))
        out.append((d, round(s, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def _py_tfidf(oracle_idx, terms, k=10):
    norm = _norm(terms)
    present = [t for t in norm if oracle_idx.df(t) > 0]
    if not present:
        return []
    n = float(oracle_idx.n_docs)
    cand = sorted({d for t in present for d in oracle_idx.postings[t]})
    out = []
    for d in cand:
        raw, nm = 0.0, 0
        for t in present:
            tf = oracle_idx.postings[t].get(d, 0)
            if tf:
                idf = 1.0 + math.log(n / (oracle_idx.df(t) + 1.0))
                raw += math.sqrt(tf) * idf * idf / math.sqrt(oracle_idx.dl[d])
                nm += 1
        out.append((d, round(raw * nm / len(norm), 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def _py_weighted_bm25(oracle_idx, weights):
    scored = {}
    for t, w in weights.items():
        for d, tf in oracle_idx.postings.get(t, {}).items():
            dl = oracle_idx.dl[d]
            s = (w * oracle_idx.idf(t) * tf * (rk.K1 + 1.0)
                 / (tf + rk.K1 * (1.0 - rk.B + rk.B * dl / oracle_idx.avgdl)))
            scored[d] = scored.get(d, 0.0) + s
    return scored


def _py_prf(oracle_idx, terms, k=10, fb_k=10, fb_m=5, beta=0.5):
    norm = _norm(terms)
    base = _py_weighted_bm25(oracle_idx, {t: 1.0 for t in norm})
    fb = sorted(((d, round(s, 6)) for d, s in base.items()),
                key=lambda x: (-x[1], x[0]))[:fb_k]
    fb_ids = [d for d, _ in fb]
    if not fb_ids:
        return []
    wsum: dict[str, float] = {}
    for t, post in oracle_idx.postings.items():
        if t in norm:
            continue
        w = sum(post[d] / oracle_idx.dl[d] for d in fb_ids if d in post)
        if w > 0:
            wsum[t] = round(w, 9)
    exp = sorted(wsum.items(), key=lambda x: (-x[1], x[0]))[:fb_m]
    total = sum(w for _, w in exp) or 1.0
    weights = {t: 1.0 for t in norm}
    for t, w in exp:
        weights[t] = weights.get(t, 0.0) + beta * w / total
    final = _py_weighted_bm25(oracle_idx, weights)
    out = sorted(((d, round(s, 6)) for d, s in final.items()),
                 key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("terms", QUERY_SET,
                         ids=["-".join(t) for t in QUERY_SET])
def test_qld_matches_python_twin(index, oracle_idx, terms):
    got = [(r["doc_id"], r["score"])
           for r in rk.qld_topk(index, terms).collect()]
    want = _py_qld(oracle_idx, terms)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-6)


@pytest.mark.parametrize("terms", QUERY_SET,
                         ids=["-".join(t) for t in QUERY_SET])
def test_tfidf_matches_python_twin(index, oracle_idx, terms):
    got = [(r["doc_id"], r["score"])
           for r in rk.classic_tfidf_topk(index, terms).collect()]
    want = _py_tfidf(oracle_idx, terms)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-6)


@pytest.mark.parametrize("terms", QUERY_SET[:4],
                         ids=["-".join(t) for t in QUERY_SET[:4]])
def test_prf_matches_python_twin(index, oracle_idx, terms):
    got = [(r["doc_id"], r["score"])
           for r in rk.bm25_prf_topk(index, terms).collect()]
    want = _py_prf(oracle_idx, terms)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-6)


def test_weighted_bm25_unit_weights_is_plain_bm25(index):
    terms = ["def", "return"]
    plain = {r["doc_id"]: r["score"]
             for r in q.bm25_scores(index, terms).collect()}
    weighted = {r["doc_id"]: r["score"]
                for r in rk.weighted_bm25_scores(
                    index, {t: 1.0 for t in terms}).collect()}
    assert set(plain) == set(weighted)
    for d in plain:
        assert weighted[d] == pytest.approx(plain[d], abs=1e-9)


def test_expansion_excludes_query_terms(index, oracle_idx):
    fb = [r["doc_id"]
          for r in q.bm25_topk(index, ["def", "return"], k=5).collect()]
    exp = rk.expansion_terms(index, fb, ["def", "return"], 5)
    assert len(exp) == 5
    assert all(t not in ("def", "return") for t, _ in exp)
    # L1-normalized weights
    assert sum(w for _, w in exp) == pytest.approx(1.0, abs=1e-9)
    # deterministic: weight desc, term asc
    ws = [w for _, w in exp]
    assert ws == sorted(ws, reverse=True)


def test_empty_and_absent_queries(index):
    assert rk.qld_topk(index, []).count() == 0
    assert rk.classic_tfidf_topk(index, []).count() == 0
    assert rk.bm25_prf_topk(index, []).count() == 0
    assert rk.qld_topk(index, ["zzzqqqxx"]).count() == 0
    assert rk.bm25_prf_topk(index, ["zzzqqqxx"]).count() == 0


def test_ranking_models_union_shape(index):
    out = rk.ranking_models(index, ["def", "return"], k=5).collect()
    assert [r["model"] for r in out] == (
        ["bm25"] * 5 + ["qld"] * 5 + ["tfidf"] * 5)
    for model in ("bm25", "qld", "tfidf"):
        scores = [r["score"] for r in out if r["model"] == model]
        assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------- segments

@pytest.fixture(scope="module")
def seg_index(spark, docs_df, oracle_idx, tmp_path_factory):
    from inverted_index_and_search_spark.operators import segments as seg

    tok = ib.tokens(docs_df)
    tf = ib.term_doc_tf(tok)
    idx = seg.build_segment_index(tf, oracle_idx.n_docs, oracle_idx.avgdl)
    out = str(tmp_path_factory.mktemp("rk_segidx"))
    seg.write_segment_index(idx, out)
    return seg.read_segment_index(spark, out)


@pytest.fixture(scope="module")
def sharded_seg_index(spark, docs_df, oracle_idx, tmp_path_factory):
    from inverted_index_and_search_spark.operators import segments as seg

    tok = ib.tokens(docs_df)
    tf = ib.term_doc_tf(tok)
    idx = seg.build_segment_index(tf, oracle_idx.n_docs, oracle_idx.avgdl,
                                  hot=tf.select("term").distinct())
    out = str(tmp_path_factory.mktemp("rk_shsegidx"))
    seg.write_segment_index(idx, out)
    return seg.read_segment_index(spark, out)


@pytest.mark.parametrize("model", ["qld", "tfidf"])
@pytest.mark.parametrize("terms", QUERY_SET[:5],
                         ids=["-".join(t) for t in QUERY_SET[:5]])
def test_segment_models_match_dataframe_path(index, seg_index, terms, model):
    """model_topk over compressed segments == the DataFrame operator,
    rank and rounded score (the cursors' raw tf/dl arrays feed the
    numpy kernels)."""
    from inverted_index_and_search_spark.operators import segments as seg

    op = rk.qld_topk if model == "qld" else rk.classic_tfidf_topk
    want = [(r["doc_id"], r["score"]) for r in op(index, terms).collect()]
    got = seg.model_topk(seg_index, terms, k=10, model=model)
    assert got == [(d, pytest.approx(s, abs=1e-6)) for d, s in want]


@pytest.mark.parametrize("model", ["qld", "tfidf"])
def test_sharded_segment_models_identical(index, sharded_seg_index, model):
    """Forced-all-hot sharded rows merge into cursors whose tf/dl
    arrays give the same model scores as the unsharded layout."""
    from inverted_index_and_search_spark.operators import segments as seg

    terms = ["def", "return", "if"]
    op = rk.qld_topk if model == "qld" else rk.classic_tfidf_topk
    want = [(r["doc_id"], r["score"]) for r in op(index, terms).collect()]
    got = seg.model_topk(sharded_seg_index, terms, k=10, model=model)
    assert got == [(d, pytest.approx(s, abs=1e-6)) for d, s in want]


@pytest.mark.parametrize("model", ["qld", "tfidf"])
def test_server_models_warm_path(index, seg_index, model):
    """QueryServer.model_topk: cold fetch == warm repeat == DataFrame
    operator; absent-term queries come back empty."""
    from inverted_index_and_search_spark.operators import segments as seg

    server = seg.QueryServer(seg_index)
    terms = ["def", "var_3_0"]
    op = rk.qld_topk if model == "qld" else rk.classic_tfidf_topk
    want = [(r["doc_id"], r["score"]) for r in op(index, terms).collect()]
    cold = server.model_topk(terms, k=10, model=model)
    warm = server.model_topk(terms, k=10, model=model)
    assert cold == warm
    assert cold == [(d, pytest.approx(s, abs=1e-6)) for d, s in want]
    assert server.model_topk(["zzzqqqxx"], k=10, model=model) == []


# ------------------------------------------------- synonyms + associations

def _py_synonym_bm25(oracle_idx, terms, synonyms, k=10):
    groups = {}
    for t in sorted({x.lower() for x in terms}):
        groups[t] = t
        for s in synonyms.get(t, []):
            groups.setdefault(s.lower(), t)
    by_group: dict[str, list[str]] = {}
    for m, g in groups.items():
        if oracle_idx.df(m) > 0:
            by_group.setdefault(g, []).append(m)
    scored: dict[int, float] = {}
    n = oracle_idx.n_docs
    for g, members in by_group.items():
        gdf = max(oracle_idx.df(m) for m in members)
        idf = math.log(1.0 + (n - gdf + 0.5) / (gdf + 0.5))
        gtf: dict[int, int] = {}
        for m in members:
            for d, tf in oracle_idx.postings[m].items():
                gtf[d] = gtf.get(d, 0) + tf
        for d, tf in gtf.items():
            dl = oracle_idx.dl[d]
            s = (idf * tf * (rk.K1 + 1.0)
                 / (tf + rk.K1 * (1.0 - rk.B + rk.B * dl / oracle_idx.avgdl)))
            scored[d] = scored.get(d, 0.0) + s
    out = sorted(((d, round(s, 6)) for d, s in scored.items()),
                 key=lambda x: (-x[1], x[0]))
    return out[:k]


SYN_MAP = {"def": ["return", "zzzmissing"], "var_3_0": ["var_5_0"]}


@pytest.mark.parametrize("terms", [["def"], ["def", "var_3_0"], ["int"]],
                         ids=["def", "def-var", "nosyn"])
def test_synonym_bm25_matches_python_twin(index, oracle_idx, terms):
    got = [(r["doc_id"], r["score"])
           for r in rk.synonym_bm25_topk(index, terms, SYN_MAP).collect()]
    want = _py_synonym_bm25(oracle_idx, terms, SYN_MAP)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-6)


def test_synonym_bm25_no_synonyms_is_plain_bm25(index):
    """An empty thesaurus degenerates to ordinary disjunctive BM25."""
    terms = ["def", "return"]
    got = [(r["doc_id"], r["score"])
           for r in rk.synonym_bm25_topk(index, terms, {}).collect()]
    want = [(r["doc_id"], round(r["score"], 6))
            for r in q.bm25_topk(index, terms, k=10).collect()]
    assert got == [(d, pytest.approx(s, abs=1e-6)) for d, s in want]


def test_synonym_member_claimed_once(index, oracle_idx):
    """A member listed under two heads joins the FIRST (sorted) head
    only — no double counting."""
    got = rk.synonym_bm25_topk(
        index, ["def", "if"],
        {"def": ["return"], "if": ["return"]}).collect()
    want = _py_synonym_bm25(oracle_idx, ["def", "if"],
                            {"def": ["return"], "if": ["return"]})
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(d, pytest.approx(s, abs=1e-6)) for d, s in want]


def _py_related(oracle_idx, seed, k=10, min_co=2):
    seed_docs = set(oracle_idx.postings.get(seed, ()))
    if not seed_docs:
        return []
    n, sdf = oracle_idx.n_docs, len(seed_docs)
    out = []
    for t, post in oracle_idx.postings.items():
        if t == seed:
            continue
        co = len(seed_docs & set(post))
        if co >= min_co:
            pmi = round(math.log(n * co / (sdf * len(post))), 6)
            out.append((t, co, pmi))
    out.sort(key=lambda x: (-x[2], -x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("seed", ["def", "var_3_0"])
def test_related_terms_matches_python_twin(index, oracle_idx, seed):
    got = [(r["term"], r["co_df"], r["pmi"])
           for r in q.related_terms(index, seed, k=8, min_co=2).collect()]
    assert got == _py_related(oracle_idx, seed, k=8, min_co=2)


def test_related_terms_absent_seed_empty(index):
    assert q.related_terms(index, "zzzqqqxx").count() == 0
