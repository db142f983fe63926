"""Symbol extraction (operators/symbols.py): Spark output equals the
pure-Python regex oracle on every doc; search/lookup paths agree;
persisted layout prunes by symbol bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inverted_index_and_search_spark.operators import symbols as sy

ROWS = [
    (0, "python", "import os\n\ndef parse_args(argv):\n    pass\n\n"
                  "class Config:\n    def __init__(self):\n        pass\n"),
    (1, "go", "package main\n\nfunc ParseArgs(a []string) {}\n"
              "func (s *Srv) Handle(w io.Writer) {}\n"
              "type Config struct {\n}\n"),
    (2, "rust", "pub fn parse_args() {}\nstruct Config {}\n"
                "pub trait Runner {}\nfn helper() {}\n"),
    (3, "java", "public class Config {\n  void run() {}\n}\n"
                "interface Runner {}\n"),
    (4, "javascript", "export function parseArgs(a) {}\n"
                      "class Config {}\nconst x = 1\n"),
    (5, "c", "#define MAX_LEN 64\ntypedef struct Config {\n} cfg_t;\n"),
    (6, "python", "x = 1  # def not_a_def(y) in a comment is matched\n"
                  "y = 'class NotAClass:'\n"),
    (7, "fortran", "SUBROUTINE FOO\nEND\n"),  # lang with no patterns
]


@pytest.fixture(scope="module")
def sym_docs(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, content string")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def sym_df(sym_docs):
    return sy.extract_symbols(sym_docs)


def test_extract_matches_py_oracle(spark, sym_df):
    got = sorted((r["doc_id"], r["kind"], r["symbol"], r["line_no"])
                 for r in sym_df.collect())
    want = sorted(
        (doc_id, k, s, ln)
        for doc_id, lang, text in ROWS
        for k, s, ln in sy.extract_symbols_py(text, lang))
    assert got == want and got


def test_extract_expected_names(spark, sym_df):
    by_doc = {}
    for r in sym_df.collect():
        by_doc.setdefault(r["doc_id"], set()).add((r["kind"], r["symbol"]))
    assert by_doc[0] == {("function", "parse_args"),
                         ("function", "__init__"), ("class", "Config")}
    assert by_doc[1] == {("function", "ParseArgs"), ("function", "Handle"),
                         ("type", "Config")}
    assert by_doc[2] == {("function", "parse_args"), ("function", "helper"),
                         ("struct", "Config"), ("trait", "Runner")}
    assert by_doc[3] == {("class", "Config"), ("interface", "Runner")}
    assert by_doc[4] == {("function", "parseArgs"), ("class", "Config")}
    assert by_doc[5] == {("macro", "MAX_LEN"), ("struct", "Config")}
    # string/comment content and pattern-less langs extract nothing
    assert 6 not in by_doc and 7 not in by_doc


def test_extract_on_synth_corpus_matches_oracle(spark, docs_df, corpus_pdf):
    got = sorted(
        (r["doc_id"], r["kind"], r["symbol"], r["line_no"])
        for r in sy.extract_symbols(docs_df).collect())
    want = sorted(
        (int(r.doc_id), k, s, ln)
        for r in corpus_pdf.itertuples()
        for k, s, ln in sy.extract_symbols_py(r.content, r.lang))
    assert got == want


def test_symbol_search(spark, sym_df):
    got = {(r["doc_id"], r["lang"]) for r in
           sy.symbol_search(sym_df, "Config").collect()}
    assert got == {(0, "python"), (1, "go"), (2, "rust"), (3, "java"),
                   (4, "javascript"), (5, "c")}
    got = {r["doc_id"] for r in
           sy.symbol_search(sym_df, "Config", kind="class").collect()}
    assert got == {0, 3, 4}
    got = {r["symbol"] for r in
           sy.symbol_search(sym_df, "parse", prefix=True).collect()}
    assert got == {"parse_args", "parseArgs"}


def test_cli_symbols_build_and_lookup(spark, sym_docs, tmp_path, capsys):
    from inverted_index_and_search_spark import cli

    src = str(tmp_path / "symdocs.parquet")
    sym_docs.write.parquet(src)
    out = str(tmp_path / "symidx_cli")
    cli.main(["symbols-build", "--input", src, "--output", out])
    assert "symbol index written" in capsys.readouterr().out

    cli.main(["symbols", "Config", "--index", out, "--kind", "class"])
    lines = [ln for ln in capsys.readouterr().out.splitlines() if "\t" in ln]
    assert {int(ln.split(":")[0]) for ln in lines} == {0, 3, 4}

    cli.main(["symbols", "parse", "--index", out, "--prefix"])
    lines = [ln for ln in capsys.readouterr().out.splitlines() if "\t" in ln]
    assert {ln.split("\t")[2] for ln in lines} == {"parse_args", "parseArgs"}

    cli.main(["symbols", "zzznope", "--index", out])
    assert "No definitions found." in capsys.readouterr().out


def test_persisted_lookup_prunes(spark, sym_df, tmp_path):
    out = str(tmp_path / "symidx")
    sy.write_symbol_index(sym_df, out)
    back, nb = sy.read_symbol_index(spark, out)
    rows = sy.symbol_lookup(back, nb, "parse_args").collect()
    assert {(r["doc_id"], r["line_no"]) for r in rows} == {(0, 3), (2, 1)}
    plan = sy.symbol_lookup(back, nb, "parse_args") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "sym_bucket" in plan  # partition-pruned point lookup
