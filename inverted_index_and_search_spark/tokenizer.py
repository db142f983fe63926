"""Canonical tokenizer — the single term semantics of the engine.

The reference implements four near-identical tokenizers (SURVEY.md §2.8);
the majority semantics (Hadoop ``TokenizerMapperStateful.java:46-49``,
Spark-RDD ``RDD_inverted_index_search.py:199-202``, SPIMI
``non-parallel/non-parallel.py:150-154``) is:

    lowercase -> replace every char that is not a Unicode letter or
    digit (underscore included) with a space -> split on whitespace
    runs -> drop empties

We deliberately do NOT reproduce the Spark-DF variant's double-escape
regex bug (``spark/inverted_index_search.py:200`` leaves literal
backslashes in tokens); source code contains backslashes and the other
three variants agree on stripping them.

Three equivalent implementations, cross-tested in
``tests/test_tokenizer.py``:

- :func:`tokenize_py`     — pure-Python oracle (re module, ``\\w`` based)
- :func:`tokens_col`      — JVM built-in expression (regexp_replace +
                            split; whole-stage-codegen'd, zero Python)
- :func:`tokenize_pandas_udf` — Arrow-vectorized pandas UDF (north-star
                            path; batch string ops, no per-row Python)

And the matching ANSI/DuckDB SQL fragment for the correctness oracle:
:data:`TOKENIZE_SQL_DUCKDB`.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Python-side regex: chars to blank out (reference RDD semantics:
#: ``re.sub(r"[^\w\s]|_", " ", text.lower())`` then ``.split()``).
#: ``[^\w\s]|_`` ≡ "not (letter|digit|underscore|space) OR underscore"
#: ≡ "not (letter|digit|space)" since split() eats whitespace anyway.
_PY_STRIP = re.compile(r"[^\w\s]|_", re.UNICODE)

#: Equivalent single-pass form: a token is a maximal run of word chars
#: excluding underscore. ~18% faster than replace+split in pandas
#: (one regex pass, no intermediate string); token-identical to
#: ``_PY_STRIP``-then-split on every input (property-tested).
_PY_TOKEN = re.compile(r"[^\W_]+", re.UNICODE)

#: Java-regex equivalent for Spark built-ins: every char not a Unicode
#: letter or digit becomes a space (whitespace too — split repairs it).
JAVA_STRIP_REGEX = r"[^\p{L}\p{N}]"

#: RE2 equivalent for the DuckDB oracle (same char classes as Java).
DUCKDB_STRIP_REGEX = r"[^\p{L}\p{N}]"


def tokenize_py(text: str) -> list[str]:
    """Pure-Python oracle tokenizer (reference-parity semantics)."""
    return _PY_STRIP.sub(" ", text.lower()).split()


JAVA_TOKEN_REGEX = r"[\p{L}\p{N}]+"


def tokens_col(content: Column) -> Column:
    """Built-in-expression tokenizer: ``array<string>`` of terms.

    Whole-stage-codegen'd JVM path — the fastest tokenizer at scale
    (no Python worker, no Arrow transfer). Single regex pass: a token
    is a maximal run of Unicode letters/digits — token-identical to
    replace(``JAVA_STRIP_REGEX``)+split+filter (cross-/property-tested)
    but without materializing two full-document intermediate strings,
    which matters on a memory-bandwidth-bound host at 32 threads.
    """
    return F.regexp_extract_all(F.lower(content), F.lit(JAVA_TOKEN_REGEX), F.lit(0))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(content: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer (north-star path: pandas/Arrow UDF,
    no per-row Python in the hot loop — pandas .str ops are C-level)."""
    return content.str.lower().str.findall(_PY_TOKEN)


def tokens_sql_duckdb(text_expr: str) -> str:
    """DuckDB SQL fragment producing the same ``list<varchar>`` of terms.

    Used by ``__spark_entry__.oracle_sql`` so the driver's DuckDB oracle
    tokenizes byte-identically to the engine.
    """
    return (
        "list_filter(string_split_regex("
        f"regexp_replace(lower({text_expr}), '{DUCKDB_STRIP_REGEX}', ' ', 'g')"
        ", '\\s+'), t -> t <> '')"
    )
