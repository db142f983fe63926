"""BM25 scoring + block-max WAND top-k over decoded posting segments.

North-rule query path (the reference's query side is an exhaustive
set-intersection REPL, ``search-query.py:53-73``; no ranking, no early
termination). Public-literature algorithms: WAND (Broder et al., CIKM
2003) and Block-Max WAND (Ding & Suel, SIGIR 2011).

Scores are float64 with the exact formula of the pure-Python oracle
(k1=1.2, b=0.75, Lucene-style non-negative IDF), so WAND results are
rank-identical to exhaustive evaluation — asserted in tests.

The kernel operates on per-term numpy arrays (doc_ids, tf, dl) decoded
from compressed segments; per-posting scores are computed lazily per
block so skipped blocks never pay the scoring cost.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def posting_scores(
    tf: np.ndarray, dl: np.ndarray, term_idf: float, avgdl: float
) -> np.ndarray:
    """Exact per-posting BM25 contribution (float64, oracle formula)."""
    tf64 = tf.astype(np.float64)
    return term_idf * (tf64 * (K1 + 1.0)) / (
        tf64 + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl)
    )


def block_maxes(scores: np.ndarray, last_ids: np.ndarray, block: int):
    """(block_max: float64[], block_last: int64[]) for fixed-size blocks."""
    n = scores.size
    nb = (n + block - 1) // block
    bm = np.empty(nb, dtype=np.float64)
    bl = np.empty(nb, dtype=np.int64)
    for i in range(nb):
        s = slice(i * block, min((i + 1) * block, n))
        bm[i] = scores[s].max()
        bl[i] = last_ids[s.stop - 1]
    return bm, bl


@dataclass
class TermPostings:
    """Decoded postings of one query term, ready for WAND."""

    doc_ids: np.ndarray  # int64, ascending
    scores: np.ndarray  # float64, exact per-posting BM25 contribution
    block_max: np.ndarray  # float64 per block
    block_last: np.ndarray  # int64 last doc_id per block
    block: int  # block size (postings per block)
    pos: int = 0
    #: optional positional payload (segments built from a positional tf
    #: relation): the ENCODED stream is carried and decoded lazily on
    #: first phrase use (ensure_positions) so BM25-only queries over a
    #: positional index never pay the 2-4x positional decode. Posting
    #: i's positions are positions_flat[pos_bounds[i-1]:pos_bounds[i]]
    #: (pos_bounds = cumsum of tfs); dls enable self-contained phrase
    #: scoring.
    positions_enc: bytes | None = None
    positions_flat: np.ndarray | None = None
    pos_bounds: np.ndarray | None = None
    dls: np.ndarray | None = None
    #: raw per-posting term frequencies + term-level stats (segment
    #: decode keeps them beside the precomputed BM25 contributions so
    #: the warm server can evaluate ALTERNATE ranking models — QLD,
    #: classic TF-IDF — from the same cached cursor; int64 per posting,
    #: a bounded constant-factor residency increase under max_terms)
    tfs: np.ndarray | None = None
    df: int = 0
    cf: int = 0
    ub: float = field(init=False)

    def ensure_positions(self) -> np.ndarray:
        """Decode (once) and return the flat position array."""
        if self.positions_flat is None:
            from inverted_index_and_search_spark.kernels.codec import (
                decode_position_lists,
            )

            counts = np.diff(np.concatenate(([0], self.pos_bounds)))
            self.positions_flat = decode_position_lists(
                self.positions_enc, counts)
        return self.positions_flat

    def __post_init__(self) -> None:
        self.ub = float(self.block_max.max()) if self.block_max.size else 0.0

    @classmethod
    def from_arrays(cls, doc_ids, tf, dl, term_idf, avgdl, block=128,
                    block_max=None, block_last=None) -> "TermPostings":
        scores = posting_scores(tf, dl, term_idf, avgdl)
        if block_max is None or block_last is None:
            block_max, block_last = block_maxes(scores, doc_ids, block)
        return cls(doc_ids=np.asarray(doc_ids, np.int64), scores=scores,
                   block_max=np.asarray(block_max, np.float64),
                   block_last=np.asarray(block_last, np.int64), block=block)

    @property
    def cur(self) -> int:
        return int(self.doc_ids[self.pos]) if self.pos < self.doc_ids.size else _SENTINEL

    def next_geq(self, target: int) -> None:
        if self.pos < self.doc_ids.size and self.doc_ids[self.pos] < target:
            self.pos += int(
                np.searchsorted(self.doc_ids[self.pos:], target, side="left")
            )

    def block_max_at(self, doc: int) -> float:
        """Upper bound for the block containing (or following) doc."""
        bi = int(np.searchsorted(self.block_last, doc, side="left"))
        return float(self.block_max[bi]) if bi < self.block_max.size else 0.0

    def block_boundary_at(self, doc: int) -> int:
        """Last doc_id of the block containing doc (for shallow skips)."""
        bi = int(np.searchsorted(self.block_last, doc, side="left"))
        return int(self.block_last[bi]) if bi < self.block_last.size else _SENTINEL


_SENTINEL = 2**62


@dataclass
class WandStats:
    docs_scored: int = 0
    blocks_skipped: int = 0
    pivots: int = 0


def wand_topk(
    terms: list[TermPostings], k: int, *, conjunctive: bool = False,
    stats: WandStats | None = None,
) -> list[tuple[int, float]]:
    """Block-max WAND top-k. Returns [(doc_id, score)] by score desc,
    doc_id asc (deterministic tie rule).

    ``conjunctive=True`` evaluates boolean-AND + BM25 (missing-term
    short-circuit handled by the caller via empty `terms`).
    """
    if not terms or (conjunctive and any(t.doc_ids.size == 0 for t in terms)):
        return []
    st = stats or WandStats()
    n_req = len(terms) if conjunctive else 1
    # heap of (score, -doc_id) so the weakest kept entry is heap[0]
    heap: list[tuple[float, int]] = []
    theta = -np.inf

    while True:
        live = sorted(terms, key=lambda t: t.cur)
        if live[0].cur == _SENTINEL:
            break
        if conjunctive:
            # pivot = doc of the last cursor; all must align
            pivot_doc = live[-1].cur
            if pivot_doc == _SENTINEL:
                break
            # conjunctive upper bound: sum of all ubs must reach theta
            # (>= not >: an exact-theta score can still win the doc_id
            # tie-break, so only prune on strict inequality)
            if sum(t.ub for t in terms) < theta and len(heap) >= k:
                break
            if live[0].cur != pivot_doc:
                for t in live:
                    t.next_geq(pivot_doc)
                continue
            pivot_idx = len(live) - 1
        else:
            # find pivot: smallest prefix whose ub sum exceeds theta
            acc = 0.0
            pivot_idx = -1
            for i, t in enumerate(live):
                acc += t.ub
                if acc >= theta or len(heap) < k:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break  # no doc can beat theta
            pivot_doc = live[pivot_idx].cur
            if pivot_doc == _SENTINEL:
                break
            # extend the prefix over every cursor already AT the pivot
            # doc — their contributions belong in the block bound, and
            # a skip past pivot_doc must account for them
            while pivot_idx + 1 < len(live) and live[pivot_idx + 1].cur == pivot_doc:
                pivot_idx += 1
        st.pivots += 1

        # block-max refinement (Ding & Suel 2011): tighter bound from the
        # blocks the pivot doc actually falls in
        if len(heap) >= k:
            ub_block = sum(t.block_max_at(pivot_doc) for t in live[: pivot_idx + 1])
            if ub_block < theta:
                # Shallow skip: jump past the earliest block boundary of
                # the pivot prefix — but capped at the first cursor
                # BEYOND the pivot: a doc inside the skipped range can
                # still reach theta with contributions from suffix terms
                # that the prefix block bound does not account for.
                boundary = min(
                    t.block_boundary_at(pivot_doc) for t in live[: pivot_idx + 1]
                )
                target = boundary + 1
                if pivot_idx + 1 < len(live):
                    target = min(target, live[pivot_idx + 1].cur)
                target = max(target, pivot_doc + 1)  # guarantee progress
                for t in live[: pivot_idx + 1]:
                    t.next_geq(target)
                st.blocks_skipped += 1
                continue

        if live[0].cur == pivot_doc:
            # fully evaluate pivot_doc
            score = 0.0
            n_hit = 0
            for t in terms:
                if t.cur == pivot_doc:
                    score += float(t.scores[t.pos])
                    n_hit += 1
                    t.pos += 1
            st.docs_scored += 1
            if n_hit >= n_req:
                entry = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                    if len(heap) == k:
                        theta = heap[0][0]
                else:
                    if entry > heap[0]:
                        heapq.heapreplace(heap, entry)
                        theta = heap[0][0]
        else:
            # advance all cursors before the pivot up to it
            for t in live[:pivot_idx]:
                t.next_geq(pivot_doc)

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]


def exhaustive_topk(
    terms: list[TermPostings], k: int, *, conjunctive: bool = False
) -> list[tuple[int, float]]:
    """Vectorized full evaluation (no pruning) — the differential
    baseline for WAND and the fastest path for short lists."""
    if not terms or (conjunctive and any(t.doc_ids.size == 0 for t in terms)):
        return []
    all_ids = np.concatenate([t.doc_ids for t in terms])
    all_scores = np.concatenate([t.scores for t in terms])
    uniq, inv = np.unique(all_ids, return_inverse=True)
    sums = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(sums, inv, all_scores)
    if conjunctive:
        counts = np.bincount(inv, minlength=uniq.size)
        mask = counts == len(terms)
        uniq, sums = uniq[mask], sums[mask]
    if uniq.size == 0:
        return []
    kk = min(k, uniq.size)
    # top-k by (score desc, doc_id asc): lexsort on (-score, doc_id)
    order = np.lexsort((uniq, -sums))[:kk]
    return [(int(uniq[i]), float(sums[i])) for i in order]
