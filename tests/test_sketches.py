"""Heavy-hitters sketch (functions/sketches.py): the Misra-Gries
guarantees must hold against EXACT counts on the fixture corpus, for
both generous and adversarially-tiny counter budgets."""

from __future__ import annotations

from collections import Counter

import pytest

from inverted_index_and_search_spark.functions import sketches as sk
from inverted_index_and_search_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def exact_counts(corpus_pdf):
    c: Counter = Counter()
    for r in corpus_pdf.itertuples():
        c.update(tokenize_py(r.content))
    return c


def test_misra_gries_py_guarantees(exact_counts, corpus_pdf):
    tokens = [t for r in corpus_pdf.itertuples()
              for t in tokenize_py(r.content)]
    for m in (8, 64, 1024):
        counters, dec = sk.misra_gries_py(tokens, m)
        assert len(counters) <= m
        assert dec <= len(tokens) // (m + 1)
        for t, est in counters.items():
            true = exact_counts[t]
            assert est <= true <= est + dec, (t, m)
        # no false negatives above the bound
        for t, true in exact_counts.items():
            if true > dec:
                assert t in counters, (t, m)


@pytest.mark.parametrize("m", [16, 65536])
def test_top_terms_sketch_vs_exact(spark, docs_df, exact_counts, m):
    rows = sk.top_terms_sketch(docs_df, k=15, m=m).collect()
    assert rows
    bound = rows[0]["est_max"] - rows[0]["est"]
    for r in rows:
        true = exact_counts[r["term"]]
        assert r["est"] <= true <= r["est_max"], (r, m)
        assert r["est_max"] - r["est"] == bound  # one global bound
    # with a generous budget the sketch IS exact and the ranking
    # matches the true top-k exactly
    if m == 65536:
        # every partition holds its full vocabulary: zero decrements,
        # the sketch degenerates to exact counting
        assert bound == 0
        want = sorted(exact_counts.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:15]
        got = [(r["term"], r["est"]) for r in rows]
        assert got == want


def test_sketch_no_token_shuffle(spark, docs_df):
    """The only exchange in the merged plan carries the P x m summary
    rows — token-level data never shuffles (the reason the sketch
    exists)."""
    plan = (sk.top_terms_sketch(docs_df, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    # the plan root is the checkpointed summaries scan + one agg
    # exchange; the tokenize pass happened before the checkpoint
    assert "Exchange" in plan
    assert "mapInPandas" not in plan.lower().replace("_", "")
