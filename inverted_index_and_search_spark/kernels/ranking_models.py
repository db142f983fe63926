"""Alternate ranking models over decoded segment cursors (numpy).

The warm QueryServer's cached :class:`~.bm25.TermPostings` carry the
raw per-posting tf and dl arrays beside the precomputed BM25
contributions, so Dirichlet query likelihood (Zhai & Lafferty 2001)
and Lucene-ClassicSimilarity TF-IDF evaluate from the SAME cursors —
no second fetch, no Spark job. Semantics are identical to the
DataFrame operators in ``operators/ranking.py`` (the pytest twins
assert rank + rounded-score equality path-by-path).

Both are exhaustive candidate-union evaluations (np.unique +
np.add.at, the deterministic sorted-term accumulation order of
``bm25.exhaustive_topk``): model-specific score upper bounds for a
WAND-style skip would need per-model block metadata the segment layout
doesn't store — at server scale the candidate lists are the query
terms' postings only, which exhaustive vectorized scoring handles in
the same sub-millisecond regime as the BM25 kernel's short-list path.
"""

from __future__ import annotations

import numpy as np

from inverted_index_and_search_spark.kernels.bm25 import TermPostings


def _require_model_arrays(terms: list[TermPostings]) -> None:
    for t in terms:
        if t.tfs is None or t.dls is None:
            raise ValueError(
                "cursor lacks tf/dl arrays — alternate ranking models "
                "need segments decoded by this engine version")


def _candidates(terms: list[TermPostings]):
    """(uniq_ids, inv, dl_per_uniq) over the union of posting lists."""
    all_ids = np.concatenate([t.doc_ids for t in terms])
    all_dls = np.concatenate([t.dls for t in terms])
    uniq, inv = np.unique(all_ids, return_inverse=True)
    dl_u = np.zeros(uniq.size, dtype=np.float64)
    dl_u[inv] = all_dls  # duplicate writes carry the same dl
    return uniq, inv, dl_u


def _topk_rounded(uniq: np.ndarray, scores: np.ndarray,
                  k: int) -> list[tuple[int, float]]:
    """(doc_id, round(score, 6)) top-k, score desc then doc_id asc —
    rounding BEFORE the order, matching the DataFrame operators'
    oracle-comparison contract."""
    if uniq.size == 0:
        return []
    r = np.round(scores, 6)
    order = np.lexsort((uniq, -r))[: min(k, uniq.size)]
    return [(int(uniq[i]), float(r[i])) for i in order]


def qld_topk(terms: list[TermPostings], n_docs: int, avgdl: float,
             k: int, *, mu: float = 2000.0) -> list[tuple[int, float]]:
    """Dirichlet QLD over candidate docs:
    sum ln(1 + tf*C/(mu*cf)) + |q| * ln(mu/(dl+mu))."""
    if not terms:
        return []
    _require_model_arrays(terms)
    c_total = float(n_docs) * float(avgdl)
    uniq, inv, dl_u = _candidates(terms)
    sums = np.zeros(uniq.size, dtype=np.float64)
    # np.log(1.0 + x), not log1p: byte-order parity with the DataFrame
    # operator's F.log(1.0 + ...) so rounded scores agree exactly
    contrib = np.concatenate([
        np.log(1.0 + t.tfs.astype(np.float64) * c_total / (mu * float(t.cf)))
        for t in terms])
    np.add.at(sums, inv, contrib)
    scores = sums + len(terms) * np.log(mu / (dl_u + mu))
    return _topk_rounded(uniq, scores, k)


def tfidf_topk(terms: list[TermPostings], n_docs: int, k: int, *,
               n_query_terms: int | None = None) -> list[tuple[int, float]]:
    """Lucene ClassicSimilarity over candidate docs:
    (n_matched/|q|) * sum sqrt(tf) * idf^2 / sqrt(dl),
    idf = 1 + ln(N/(df+1)). ``n_query_terms`` defaults to the present
    terms but callers pass the full normalized query length so absent
    terms still discount coord (maxOverlap semantics)."""
    if not terms:
        return []
    _require_model_arrays(terms)
    nq = float(n_query_terms if n_query_terms else len(terms))
    uniq, inv, _dl_u = _candidates(terms)
    sums = np.zeros(uniq.size, dtype=np.float64)
    contrib = np.concatenate([
        np.sqrt(t.tfs.astype(np.float64))
        * (1.0 + np.log(float(n_docs) / (float(t.df) + 1.0))) ** 2
        / np.sqrt(t.dls.astype(np.float64))
        for t in terms])
    np.add.at(sums, inv, contrib)
    counts = np.bincount(inv, minlength=uniq.size)
    scores = sums * counts / nq
    return _topk_rounded(uniq, scores, k)
