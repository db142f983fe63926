"""Symbol extraction: a ctags-style definition index over source code.

Code-search products answer "where is `parseArgs` DEFINED?" as a
first-class query (ctags; Zoekt's symbol ranking boost; OpenGrok's
definitions index) — a plain term query cannot, because the definition
line and every call site carry the same tokens. The public design this
follows is regex-based definition capture (exactly ctags' approach):
per-language line patterns that anchor a definition keyword and capture
the introduced name.

Spark shape (100 TB honest): ONE map-side pass — lines posexplode
(O(total bytes), no shuffle), a per-language `rlike` prefilter keeps
only candidate lines, `regexp_extract` captures the name. The output
relation (doc_id, lang, kind, symbol, line_no) is tiny relative to the
corpus (definitions, not occurrences), so the optional persisted layout
bucket-partitions it by symbol hash for point-lookup pruning — the same
layout discipline as term postings (index_build.py).

The patterns are deliberately the DETERMINISTIC, syntax-anchored subset
(start-of-line, keyword, identifier): no parsing, no type inference —
false negatives on exotic styles are documented ctags behavior, never
false positives on call sites.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inverted_index_and_search_spark.operators.index_build import (
    DEFAULT_BUCKETS,
    bucket_route_col,
    term_bucket_col,
)

__all__ = [
    "LANG_PATTERNS",
    "extract_symbols",
    "extract_symbols_py",
    "symbol_search",
    "write_symbol_index",
    "read_symbol_index",
    "symbol_lookup",
]

_ID = r"[A-Za-z_][A-Za-z0-9_]*"

#: lang -> [(kind, line_regex_with_one_capture_group)] — Java-regex and
#: Python-`re` compatible (no lookbehind), anchored at line start with
#: optional indentation; the single capture group IS the symbol name.
LANG_PATTERNS: dict[str, list[tuple[str, str]]] = {
    "python": [
        ("function", rf"^\s*def\s+({_ID})\s*\("),
        ("class", rf"^\s*class\s+({_ID})\s*[:(]"),
    ],
    "go": [
        ("function", rf"^func\s+(?:\([^)]*\)\s*)?({_ID})\s*\("),
        ("type", rf"^type\s+({_ID})\s+"),
    ],
    "rust": [
        ("function", rf"^\s*(?:pub\s+)?fn\s+({_ID})"),
        ("struct", rf"^\s*(?:pub\s+)?struct\s+({_ID})"),
        ("trait", rf"^\s*(?:pub\s+)?trait\s+({_ID})"),
    ],
    "java": [
        ("class", rf"^\s*(?:public\s+|final\s+|abstract\s+)*class\s+({_ID})"),
        ("interface", rf"^\s*(?:public\s+)?interface\s+({_ID})"),
    ],
    "javascript": [
        ("function", rf"^\s*(?:export\s+)?(?:async\s+)?function\s+({_ID})"),
        ("class", rf"^\s*(?:export\s+)?class\s+({_ID})"),
    ],
    "c": [
        ("macro", rf"^\s*#\s*define\s+({_ID})"),
        ("struct", rf"^\s*(?:typedef\s+)?struct\s+({_ID})\s*\{{"),
    ],
}


def extract_symbols(docs: DataFrame, *, content_col: str = "content",
                    id_col: str = "doc_id", lang_col: str = "lang",
                    patterns: dict[str, list[tuple[str, str]]] | None = None,
                    ) -> DataFrame:
    """(doc_id, lang, kind, symbol, line_no) — one row per captured
    definition; 1-based line numbers; map-side only (no shuffle).

    Per line, per (kind, pattern) of the row's language: a codegen'd
    `regexp_extract` captures the name (empty = no match, filtered).
    Languages absent from ``patterns`` contribute nothing.
    """
    patterns = LANG_PATTERNS if patterns is None else patterns
    lines = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.posexplode(F.split(F.col(content_col), "\n", -1))
        .alias("_ln0", "line"),
    )
    # one (kind, name) extraction column per pattern of the row's lang:
    # langs are a tiny closed set, so a CASE over lang picks the
    # pattern list; stack unpivots the per-pattern extractions
    per_kind = []
    kinds = sorted({k for pats in patterns.values() for k, _ in pats})
    for kind in kinds:
        expr = F.lit("")
        for lang, pats in sorted(patterns.items()):
            for k, pat in pats:
                if k == kind:
                    expr = F.when(F.col("lang") == lang,
                                  F.regexp_extract("line", pat, 1)
                                  ).otherwise(expr)
        per_kind.append((kind, expr))
    stacked = lines.select(
        "doc_id", "lang", (F.col("_ln0") + 1).alias("line_no"),
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("kind"), e.alias("symbol"))
            for k, e in per_kind
        ])).alias("s"),
    )
    return (stacked.where(F.col("s.symbol") != "")
            .select("doc_id", "lang", F.col("s.kind").alias("kind"),
                    F.col("s.symbol").alias("symbol"), "line_no"))


def extract_symbols_py(text: str, lang: str,
                       patterns: dict | None = None,
                       ) -> list[tuple[str, str, int]]:
    """Pure-Python oracle twin: [(kind, symbol, line_no_1based)] in
    (kind-alphabetical, line) order-insensitive comparison shape."""
    patterns = LANG_PATTERNS if patterns is None else patterns
    out = []
    for i, line in enumerate(text.split("\n")):
        for kind, pat in patterns.get(lang, []):
            m = re.search(pat, line)
            if m and m.group(1):
                out.append((kind, m.group(1), i + 1))
    return out


def symbol_search(symbols: DataFrame, name: str, *,
                  kind: str | None = None,
                  prefix: bool = False) -> DataFrame:
    """(doc_id, lang, kind, symbol, line_no) rows defining ``name``
    (exact, or names starting with it under ``prefix``) — pushed-down
    equality/StringStartsWith filters on the symbol relation."""
    cond = (F.col("symbol").startswith(name) if prefix
            else F.col("symbol") == name)
    if kind is not None:
        cond = cond & (F.col("kind") == kind)
    return symbols.where(cond)


# ---------------------------------------------------- persisted layout

def write_symbol_index(symbols: DataFrame, out_dir: str, *,
                       n_buckets: int = DEFAULT_BUCKETS,
                       mode: str = "overwrite") -> None:
    """Bucket-partition the symbol relation by symbol hash (Murmur3
    1:1 write routing, same layout as term postings) so a lookup reads
    one bucket directory."""
    import json
    import os

    spark = symbols.sparkSession
    withb = symbols.withColumn(
        "sym_bucket", term_bucket_col(F.col("symbol"), n_buckets))
    route = bucket_route_col(spark, F.col("sym_bucket"), n_buckets)
    (withb.repartition(n_buckets, route)
     .sortWithinPartitions("sym_bucket", "symbol", "doc_id")
     .write.mode(mode).partitionBy("sym_bucket")
     .parquet(f"{out_dir}/symbols"))
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/meta.json", "w") as f:
        json.dump({"n_buckets": n_buckets}, f)


def read_symbol_index(spark, out_dir: str) -> tuple[DataFrame, int]:
    import json
    import os

    n_buckets = DEFAULT_BUCKETS
    meta = f"{out_dir}/meta.json"
    if os.path.exists(meta):
        with open(meta) as f:
            n_buckets = int(json.load(f)["n_buckets"])
    return spark.read.parquet(f"{out_dir}/symbols"), n_buckets


def symbol_lookup(symbols: DataFrame, n_buckets: int, name: str, *,
                  kind: str | None = None) -> DataFrame:
    """Point lookup on a PERSISTED symbol index: driver-side bucket
    hash prunes to one sym_bucket partition + pushed symbol equality
    (the same prune-then-push shape as query._query_postings)."""
    from inverted_index_and_search_spark.kernels.xxhash import term_bucket

    b = term_bucket(name, n_buckets)
    out = symbols.where((F.col("sym_bucket") == b)
                        & (F.col("symbol") == name))
    if kind is not None:
        out = out.where(F.col("kind") == kind)
    return out.select("doc_id", "lang", "kind", "symbol", "line_no")
