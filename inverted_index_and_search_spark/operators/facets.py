"""Faceted search: per-field value counts over a query's match set.

The reference engine stops at returning matching doc lists
(``search-query.py:52-75`` prints docIDs); every production search UI
layered on an inverted index also wants Lucene-faceting /
Elasticsearch-terms-aggregation counts ("of the 1 243 matches: lang
de=312, fr=201, ..."). This module adds that as a declarative
composition: match set -> semi-join to the metadata relation -> one
``stack`` unpivot -> one (field, value) hash aggregation, so ALL
requested facet fields share a single shuffle whose cardinality is the
number of distinct facet values — tiny regardless of corpus size.

Scale notes (100 TB): the match set is produced by the pruned query
paths (term_bucket partition pruning, pushed `term IN`), the semi-join
broadcasts whichever side AQE measures as small (a selective query's
match set, or nothing when the match set is huge — then it is an
ordinary co-partitioned join), and the unpivot is map-side: the only
full-width shuffle carries (field, value) pairs AFTER partial
aggregation, i.e. at most n_fields x n_distinct_values rows per task.
No driver-side iteration anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["facet_counts", "search_facets"]


def facet_counts(matched: DataFrame, meta: DataFrame,
                 fields: list[str]) -> DataFrame:
    """(field, value, n_docs) — for each requested metadata field, how
    many matched docs carry each distinct value, n_docs desc then value
    asc per field (Elasticsearch terms-agg ordering, untruncated).

    ``matched`` is any (doc_id, ...) relation (need not be distinct —
    the semi-join tolerates duplicates); ``meta`` is the corpus /
    metadata relation, unique per doc_id. Null field values are not
    counted (a doc without a lang contributes to no lang bucket), like
    Lucene faceting. Unknown fields raise rather than silently
    producing an empty facet."""
    missing = [f for f in fields if f not in meta.columns]
    if missing:
        raise ValueError(
            f"unknown facet fields {missing}; metadata columns: "
            f"{[c for c in meta.columns if c != 'doc_id']}")
    if not fields:
        raise ValueError("facet_counts needs at least one field")
    if "doc_id" not in meta.columns:
        raise ValueError("metadata relation has no doc_id column")
    # one unpivot: stack(n, 'lang', lang, 'source', source, ...) —
    # field names are validated against meta.columns above, so the
    # generated SQL fragment cannot contain anything but column refs
    pairs = ", ".join(f"'{f}', cast(`{f}` as string)" for f in fields)
    return (
        meta.join(matched.select("doc_id"), "doc_id", "left_semi")
        .select(F.expr(f"stack({len(fields)}, {pairs}) as (field, value)"))
        .where(F.col("value").isNotNull())
        .groupBy("field", "value")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("field", F.col("n_docs").desc(), "value")
    )


def search_facets(index, query: str, meta: DataFrame,
                  fields: list[str]) -> DataFrame:
    """Facet counts of a boolean query-language match set: parse +
    evaluate ``query`` (full language incl. phrases / NEAR / wildcard /
    fuzzy / field atoms; field atoms also filter against ``meta``),
    then :func:`facet_counts` over the matched docs."""
    from inverted_index_and_search_spark.operators import search_expr as se

    matched = se.eval_expr(index, se.parse(query), meta)
    return facet_counts(matched, meta, fields)
