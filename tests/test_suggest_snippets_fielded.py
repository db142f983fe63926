"""Round-4 surface: spell suggestion, best-window snippets, BM25F
fielded ranking — each checked against an independent pure-Python twin
computed from the same corpus rows."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from inverted_index_and_search_spark import oracle
from inverted_index_and_search_spark.operators import index_build as ib
from inverted_index_and_search_spark.operators import query as q
from inverted_index_and_search_spark.operators.fielded import (
    build_fielded_index,
)
from inverted_index_and_search_spark.operators.snippets import bm25_snippets

_TOKEN = re.compile(r"[^\W_]+", re.UNICODE)

K1, B = 1.2, 0.75


def _tok(s: str) -> list[str]:
    return _TOKEN.findall(s.lower())


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def index(docs_df):
    idx = ib.build_index(docs_df)
    idx.postings.cache().count()
    idx.doc_stats.cache().count()
    return idx


# ----------------------------------------------------------- suggestions

def _py_suggest(corpus_pdf, term, max_dist, k):
    cf: Counter = Counter()
    for text in corpus_pdf["content"]:
        cf.update(_tok(text))
    cand = [(t, _lev(t, term), c) for t, c in cf.items()
            if abs(len(t) - len(term)) <= max_dist]
    cand = [(t, d, c) for t, d, c in cand if d <= max_dist]
    cand.sort(key=lambda x: (x[1], -x[2], x[0]))
    return cand[:k]


@pytest.mark.parametrize("term,max_dist", [
    ("retur", 1),      # typo of a hot keyword
    ("def", 1),        # exact term present -> dist 0 leads
    ("vr_3_0", 2),     # identifier typo
    ("zzzzzzzz", 2),   # nothing within reach -> empty
])
def test_suggest_terms_matches_python_twin(index, corpus_pdf, term, max_dist):
    got = [(r["term"], r["dist"], r["cf"])
           for r in q.suggest_terms(index, term, max_dist=max_dist,
                                    k=5).collect()]
    want = _py_suggest(corpus_pdf, term, max_dist, 5)
    assert got == want


def test_suggest_exact_term_is_distance_zero(index):
    rows = q.suggest_terms(index, "DEF", max_dist=1, k=3).collect()
    assert rows and rows[0]["term"] == "def" and rows[0]["dist"] == 0


def test_suggest_empty_term(index):
    assert q.suggest_terms(index, "", max_dist=2, k=5).count() == 0


# -------------------------------------------------------------- snippets

def _py_best_window(tokens, terms, width):
    ps = [i for i, t in enumerate(tokens) if t in terms]
    best_cnt, best_start = -1, 0
    for p in ps:
        c = sum(1 for x in ps if p <= x < p + width)
        if c > best_cnt:
            best_cnt, best_start = c, p
    return max(best_cnt, 0), best_start


def _py_snippets(corpus_pdf, oracle_idx, terms, k, width, mark=None):
    top = oracle.bm25_topk(oracle_idx, terms, k=k)
    text_by_id = dict(zip(corpus_pdf["doc_id"], corpus_pdf["content"]))
    out = []
    for doc_id, score in top:
        toks = _tok(text_by_id[doc_id])
        hits, start = _py_best_window(toks, set(terms), width)
        window = toks[start:start + width]
        if mark:
            window = [mark[0] + t + mark[1] if t in set(terms) else t
                      for t in window]
        out.append((doc_id, score, hits, " ".join(window)))
    return out


@pytest.mark.parametrize("terms,width", [
    (["def", "return"], 8),
    (["var_3_0"], 5),
    (["if", "int", "def"], 12),
])
def test_bm25_snippets_match_python_twin(index, docs_df, corpus_pdf,
                                         oracle_idx, terms, width):
    got = [(r["doc_id"], r["score"], r["hits"], r["snippet"])
           for r in bm25_snippets(index, docs_df, terms, k=10,
                                  width=width).collect()]
    want = _py_snippets(corpus_pdf, oracle_idx, terms, 10, width)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-6
        assert g[2:] == w[2:]


def test_bm25_snippets_marking(index, docs_df, corpus_pdf, oracle_idx):
    got = bm25_snippets(index, docs_df, ["def"], k=3, width=6,
                        mark=("[", "]")).collect()
    want = _py_snippets(corpus_pdf, oracle_idx, ["def"], 3, 6,
                        mark=("[", "]"))
    assert [(r["doc_id"], r["hits"], r["snippet"]) for r in got] == \
        [(w[0], w[2], w[3]) for w in want]
    assert all("[def]" in r["snippet"] for r in got)


def test_bm25_snippets_absent_terms_empty(index, docs_df):
    assert bm25_snippets(index, docs_df, ["zzzqqqxx"], k=5).count() == 0


# ---------------------------------------------------------------- BM25F

FIELDS = {"content": 1.0, "path": 3.0}


def _py_bm25f_topk(corpus_pdf, terms, k):
    rows = corpus_pdf.to_dict("records")
    wtf: dict[int, Counter] = {}
    wdl: dict[int, float] = {}
    for r in rows:
        c: Counter = Counter()
        dl = 0.0
        for f, w in FIELDS.items():
            for t in _tok(str(r[f])):
                c[t] += w
                dl += w
        wtf[r["doc_id"]] = c
        wdl[r["doc_id"]] = dl
    n = len(rows)
    avgdl = sum(wdl.values()) / n
    df: Counter = Counter()
    for c in wtf.values():
        df.update(set(c))
    scored = []
    for doc_id, c in wtf.items():
        s = 0.0
        matched = False
        for t in set(x.lower() for x in terms):
            if c.get(t, 0) > 0:
                matched = True
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                tf = c[t]
                s += idf * tf * (K1 + 1) / (
                    tf + K1 * (1 - B + B * wdl[doc_id] / avgdl))
        if matched:
            scored.append((doc_id, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


@pytest.fixture(scope="module")
def fielded_idx(docs_df):
    idx = build_fielded_index(docs_df, FIELDS)
    idx.postings.cache().count()
    idx.doc_stats.cache().count()
    return idx


@pytest.mark.parametrize("terms", [
    ["def"],                    # content-only term
    ["py"],                     # path-only term (extension token)
    ["def", "dir12"],           # mixed: path tokens carry 3x weight
    ["src", "var_3_0"],
])
def test_bm25f_topk_matches_python_twin(fielded_idx, corpus_pdf, terms):
    got = [(r["doc_id"], r["score"])
           for r in q.bm25_topk(fielded_idx, terms, k=10).collect()]
    want = _py_bm25f_topk(corpus_pdf, terms, 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (gd, gs, ws)


def test_bm25f_path_boost_changes_ranking(docs_df, corpus_pdf):
    """A path-heavy query must rank path-hits above body-hits under
    BM25F but not necessarily under single-field BM25 — proves the
    weights flow through (and that the two indexes differ)."""
    terms = ["py"]  # every .py path yields token 'py'; bodies rarely
    fielded = build_fielded_index(docs_df, FIELDS)
    got = q.bm25_topk(fielded, terms, k=5).collect()
    assert got, "path tokens must be indexed"
    plain = ib.build_index(docs_df)  # content only
    assert q.bm25_topk(plain, terms, k=5).count() <= len(got)


def test_generic_operators_run_on_fielded_index(fielded_idx, corpus_pdf):
    # boolean AND across fields: doc matches if the term occurs in ANY field
    got = [r["doc_id"] for r in q.boolean_and(fielded_idx, ["py"]).collect()]
    want = sorted(
        r["doc_id"] for r in corpus_pdf.to_dict("records")
        if any("py" in _tok(str(r[f])) for f in FIELDS))
    assert got == want
    # suggestions work too (cf is weighted — ordering only)
    sug = q.suggest_terms(fielded_idx, "fil", max_dist=2, k=3).collect()
    assert sug and sug[0]["term"] == "file"


# ------------------------------------------------------------ autocomplete

def test_complete_terms_matches_python_twin(index, corpus_pdf):
    cf: Counter = Counter()
    for text in corpus_pdf["content"]:
        cf.update(_tok(text))
    want = sorted(((t, c) for t, c in cf.items() if t.startswith("re")),
                  key=lambda x: (-x[1], x[0]))[:5]
    got = [(r["term"], r["cf"])
           for r in q.complete_terms(index, "RE", k=5).collect()]
    assert got == want and want


def test_index_stats_matches_python_twin(index, corpus_pdf):
    cf: Counter = Counter()
    df: Counter = Counter()
    dls = []
    for text in corpus_pdf["content"]:
        toks = _tok(text)
        dls.append(len(toks))
        cf.update(toks)
        df.update(set(toks))
    got = q.index_stats(index, top=5)
    assert got["n_docs"] == len(corpus_pdf)
    assert abs(got["avgdl"] - sum(dls) / len(dls)) < 1e-9
    assert got["n_terms"] == len(cf)
    assert got["n_postings"] == sum(df.values())
    assert got["n_tokens"] == sum(cf.values())
    want_top = sorted(cf.items(), key=lambda x: (-x[1], x[0]))[:5]
    assert got["top_terms"] == want_top


def test_snippets_use_index_tokenizer(spark):
    """A code-tokenizer index must tokenize stored content with the
    SAME splitter when building snippets: code-split query terms
    ('file') can never match a standard token ('getfilename') —
    r4-advice fix (snippets.py threaded tokenizer like analyzer)."""
    from inverted_index_and_search_spark.operators.index_build import (
        build_index,
    )
    from inverted_index_and_search_spark.operators.snippets import (
        bm25_snippets,
    )

    docs = spark.createDataFrame(
        [(0, "int getFileName(Path p) { return p.name; }"),
         (1, "nothing relevant here")],
        "doc_id long, content string")
    idx = build_index(docs, tokenizer="code")
    rows = bm25_snippets(idx, docs, ["file"], k=2,
                         mark=("[", "]")).collect()
    assert rows and rows[0]["doc_id"] == 0
    # the camelCase identifier is split, so 'file' is marked
    assert "[file]" in rows[0]["snippet"]
    assert rows[0]["hits"] >= 1
