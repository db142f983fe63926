"""Pure-Python oracle engine — the differential-correctness reference.

Re-implements, without Spark, exactly the semantics the engine claims
(SURVEY.md §5.2): reference-parity tokenization + postings + boolean
AND (incl. the missing-term short-circuit of the reference's
``search-query.py:61-62``), plus the north-rule additions (doc/collection
stats, BM25 k1=1.2 b=0.75 with Lucene-style non-negative IDF,
deterministic tie-break score desc then doc_id asc).

Everything is float64 with a canonical summation order (term-sorted) so
Spark results can be compared to 1e-6.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

from inverted_index_and_search_spark.tokenizer import tokenize_py

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    dl: dict[int, int] = field(default_factory=dict)  # doc -> length in tokens
    sha: dict[int, str] = field(default_factory=dict)  # doc -> sha256(content)
    n_docs: int = 0

    @property
    def avgdl(self) -> float:
        return (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def cf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    def idf(self, term: str) -> float:
        # Lucene-style non-negative IDF: ln(1 + (N - df + 0.5)/(df + 0.5))
        d = self.df(term)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))


def build_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: list of (doc_id, content)."""
    idx = OracleIndex()
    idx.n_docs = len(docs)
    for doc_id, content in docs:
        toks = tokenize_py(content)
        idx.dl[doc_id] = len(toks)
        idx.sha[doc_id] = hashlib.sha256(content.encode("utf-8")).hexdigest()
        for t in toks:
            idx.postings.setdefault(t, {})
            idx.postings[t][doc_id] = idx.postings[t].get(doc_id, 0) + 1
    return idx


def boolean_and(idx: OracleIndex, terms: list[str]) -> list[int]:
    """Conjunctive query, reference parity (``search-query.py:53-73``):
    lowercase the query terms, missing term => empty, result sorted asc."""
    norm = [t.lower() for t in terms]
    if not norm:
        return []
    sets = []
    for t in norm:
        if t not in idx.postings:  # short-circuit, search-query.py:61-62
            return []
        sets.append(set(idx.postings[t]))
    out = set.intersection(*sets)
    return sorted(out)


def bm25_score(idx: OracleIndex, doc_id: int, terms: list[str]) -> float:
    """Score one doc for a (deduplicated, term-sorted) term list."""
    avgdl = idx.avgdl
    dl = idx.dl[doc_id]
    norm = K1 * (1.0 - B + B * dl / avgdl)
    score = 0.0
    for t in sorted(set(terms)):  # canonical summation order
        tf = idx.postings.get(t, {}).get(doc_id, 0)
        if tf:
            score += idx.idf(t) * (tf * (K1 + 1.0)) / (tf + norm)
    return score


def bm25_topk(
    idx: OracleIndex, terms: list[str], k: int = 10, conjunctive: bool = False
) -> list[tuple[int, float]]:
    """Disjunctive (default) or conjunctive BM25 top-k.

    Returns [(doc_id, score)] ordered by score desc, doc_id asc.
    """
    norm_terms = sorted({t.lower() for t in terms})
    if not norm_terms:
        return []
    if conjunctive:
        cand = boolean_and(idx, norm_terms)
    else:
        cand_set: set[int] = set()
        for t in norm_terms:
            cand_set.update(idx.postings.get(t, ()))
        cand = sorted(cand_set)
    scored = [(d, bm25_score(idx, d, norm_terms)) for d in cand]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]
