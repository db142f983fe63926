"""Reference-parity surfaces: text/JSON index sinks, --limit-mb input
budgeting (greedy largest-first + smallest-file fallback), and the
build/search CLI (one-shot and missing-term wording)."""

from __future__ import annotations

import json

import pytest

from inverted_index_and_search_spark import cli
from inverted_index_and_search_spark.operators import index_build as ib


@pytest.fixture(scope="module")
def index(docs_df):
    idx = ib.build_index(docs_df)
    idx.postings.cache().count()
    return idx


def test_text_sink_format(index, oracle_idx, tmp_path):
    out = str(tmp_path / "txt")
    ib.write_index_text(index, out)
    spark = index.postings.sparkSession
    lines = [r["value"] for r in spark.read.text(out).collect()]
    assert len(lines) == len(oracle_idx.postings)
    by_term = {ln.split("\t", 1)[0]: ln for ln in lines}
    for term, posts in list(oracle_idx.postings.items())[:50]:
        fields = by_term[term].split("\t")
        want = [f"{d}:{tf}" for d, tf in sorted(posts.items())]
        assert fields[1:] == want, term


def test_json_sink_format(index, oracle_idx, tmp_path):
    out = str(tmp_path / "js")
    ib.write_index_json(index, out)
    spark = index.postings.sparkSession
    rows = [json.loads(r["value"]) for r in spark.read.text(out).collect()]
    assert len(rows) == len(oracle_idx.postings)
    got = {r["word"]: r["docs"] for r in rows}
    for term, posts in list(oracle_idx.postings.items())[:50]:
        assert got[term] == [f"{d}:{tf}" for d, tf in sorted(posts.items())]


@pytest.mark.parametrize("limit_mb", [0.02, 0.1])
def test_budget_input_greedy(docs_df, corpus_pdf, limit_mb):
    picked = {r["doc_id"]
              for r in ib.budget_input(docs_df, limit_mb).select("doc_id").collect()}
    # reference semantics (inverted_index_search.py:142-147): size desc,
    # skip-and-continue on overflow
    sizes = sorted(
        ((len(c), i) for i, c in zip(corpus_pdf["doc_id"], corpus_pdf["content"])),
        key=lambda t: (-t[0], t[1]))
    cap = int(limit_mb * 1024 * 1024)
    want, cum = set(), 0
    for sz, i in sizes:
        if cum + sz <= cap:
            cum += sz
            want.add(i)
    assert picked == want and picked


def test_budget_input_fallback_smallest(docs_df, corpus_pdf):
    rows = ib.budget_input(docs_df, 1e-6).select("doc_id").collect()
    smallest = min(
        zip(corpus_pdf["doc_id"], corpus_pdf["content"]),
        key=lambda t: (len(t[1]), t[0]))[0]
    assert [r["doc_id"] for r in rows] == [smallest]


def test_cli_build_and_search(spark, tmp_path, capsys):
    docs = "/root/testdata/sf0.001/documents.parquet"
    idx_dir = str(tmp_path / "cliidx")
    cli.main(["build", "--input", docs, "--content-col", "text",
              "--output", idx_dir, "--limit-mb", "0.05"])
    cli.main(["search", "--index", idx_dir, "--query", "table query"])
    out = capsys.readouterr().out
    assert "index written" in out
    body = out.splitlines()
    assert len(body) > 1  # at least one doc id or "No matches found."

    cli.main(["search", "--index", idx_dir, "--query", "zzznotaterm"])
    assert "No matches found." in capsys.readouterr().out

    cli.main(["search", "--index", idx_dir, "--bm25", "--topk", "3",
              "--query", "table query"])
    bm = [ln for ln in capsys.readouterr().out.splitlines() if "\t" in ln]
    assert 0 < len(bm) <= 3
    scores = [float(ln.split("\t")[1]) for ln in bm]
    assert scores == sorted(scores, reverse=True)


def test_cli_text_format_build(spark, tmp_path, capsys):
    docs = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "clitxt")
    cli.main(["build", "--input", docs, "--content-col", "text",
              "--output", out, "--format", "text"])
    assert spark.read.text(out).count() > 0


def test_versioned_output_path(tmp_path):
    base = str(tmp_path / "output-spark")
    assert ib.versioned_output_path(base) == f"{base}-0"
    import os
    os.makedirs(f"{base}-0")
    os.makedirs(f"{base}-1")
    assert ib.versioned_output_path(base) == f"{base}-2"
