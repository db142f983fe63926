"""Boolean query-expression language over the index operators.

The reference REPL evaluates only implicit-AND term lists
(``search-query.py:53-73``). This module adds the full boolean surface
as a tiny recursive-descent grammar:

    expr   := or
    or     := and ( OR and )*
    and    := unary ( [AND] unary )*          # adjacency = implicit AND
    unary  := NOT unary | prox
    prox   := atom ( NEAR/k atom )?           # proximity, plain terms only
    atom   := '(' expr ')' | '"' word+ '"'
            | term | term'*' | term'~'d       # wildcard / fuzzy atoms
            | field':'value                   # metadata field filter

``"quoted words"`` are exact token phrases (positional index required);
``a NEAR/3 b`` matches docs where the terms occur within 3 token
offsets (positional index required; same semantics as
positional.terms_within_window, including the same-term
two-distinct-occurrences rule);
``tab*`` matches docs containing any term with that prefix (trailing
star only — Lucene PrefixQuery) and ``tble~1`` any term within
Levenshtein distance d (``~`` alone means 1; d in 0..2 like Lucene's
FuzzyQuery) — both resolve through the sorted dictionary side table on
persisted indexes and are plain dictionary scans otherwise;
bare terms and operators are case-insensitive except that AND/OR/NOT in
upper case are keywords (reference-parity: a lowercase ``and`` is a
search term, so plain term lines behave exactly like the reference);
``lang:de`` filters on a metadata column of the corpus relation
(Lucene field-query syntax — the north-star input table carries
``repo/path/commit/lang`` beside ``content``): the value is matched
VERBATIM against the stored column (metadata values are not tokenized,
so unlike terms they stay case-sensitive), a trailing ``*`` makes it a
prefix match (``source:src1*``), and a bare ``field:*`` matches any doc
where the field is non-null. Indexed terms are alnum-only runs (the
tokenizer strips ``:``), so the syntax can never shadow a real term.

Evaluation is set algebra on (doc_id) DataFrames — inner join for AND,
union-distinct for OR, left-anti for NOT — with each leaf touching only
its own term's bucket-pruned postings (query._query_postings). Negation
is only valid AND-ed against at least one positive branch (NOT alone or
OR-ed would be a corpus complement — not scale-safe, rejected at parse
time like most search engines do).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from inverted_index_and_search_spark.operators.index_build import Index
from inverted_index_and_search_spark.operators.query import (
    _norm_terms,
    _query_postings,
)

__all__ = ["parse", "eval_expr", "search_expr", "ExprError",
           "Term", "Phrase", "And", "Or", "Not", "Near", "Boosted",
           "PrefixAtom", "FuzzyAtom", "FieldAtom", "field_cond"]


class ExprError(ValueError):
    """Malformed query expression."""


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Phrase:
    words: tuple[str, ...]


@dataclass(frozen=True)
class And:
    parts: tuple  # of nodes; Not children legal here


@dataclass(frozen=True)
class Or:
    parts: tuple


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class Near:
    """``a NEAR/k b`` — both terms within k token offsets (positional
    index required; same-term queries need two distinct occurrences)."""

    term_a: str
    term_b: str
    window: int


@dataclass(frozen=True)
class Boosted:
    """``term^2.5`` / ``"a phrase"^2`` — a Lucene-style clause boost:
    matching is unchanged (evaluates exactly as the child), but in
    ranked mode the child's scoring terms carry the multiplicative
    weight. Plain terms and phrases only; a boost on wildcard/fuzzy/
    field atoms is a parse error (their term set is dictionary-driven
    and their semantics are filters). Boolean (unranked) mode ignores
    boosts, as Lucene does."""

    child: object  # Term | Phrase
    weight: float


@dataclass(frozen=True)
class PrefixAtom:
    """``tab*`` — any term starting with the prefix (trailing star only)."""

    prefix: str


@dataclass(frozen=True)
class FuzzyAtom:
    """``tble~1`` — any term within Levenshtein distance ``dist``
    (``~`` alone means 1; 0..2 like Lucene's FuzzyQuery)."""

    term: str
    dist: int


@dataclass(frozen=True)
class FieldAtom:
    """``lang:de`` — docs whose metadata column ``field`` equals
    ``value`` verbatim (``prefix=True`` for a trailing ``*``:
    starts-with; an empty-prefix ``field:*`` means "field non-null").
    Purely a filter: contributes no scoring terms in ranked mode."""

    field: str
    value: str
    prefix: bool = False


_NEAR_RE = re.compile(r"NEAR/(\d+)$")

_BOOST_RE = re.compile(r"^(.*)\^(\d+(?:\.\d+)?)$")

_FIELD_ATOM_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.*)$")

_FUZZY_ATOM_RE = re.compile(r"^([^~*]+)~([0-2]?)$")

#: Lucene-style TooManyClauses bound for scoring-time wildcard expansion
MAX_EXPANSION = 1024


_TOKEN_RE = re.compile(r'\(|\)|"[^"]*"|[^\s()"]+')


def _lex(s: str) -> list[str]:
    toks = _TOKEN_RE.findall(s)
    rest = _TOKEN_RE.sub(" ", s).strip()
    if '"' in rest:
        raise ExprError("unbalanced quote")
    return toks


def parse(query: str):
    """Parse a query string to an AST; raises ExprError on bad syntax."""
    toks = _lex(query)
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def take() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        parts = [parse_and()]
        while peek() == "OR":
            take()
            parts.append(parse_and())
        if len(parts) == 1:
            return parts[0]
        if any(isinstance(p, Not) for p in parts):
            raise ExprError("NOT cannot be OR-ed (corpus complement); "
                            "AND it with a positive branch")
        return Or(tuple(parts))

    def parse_and():
        parts = [parse_unary()]
        while True:
            nxt = peek()
            if nxt == "AND":
                take()
                parts.append(parse_unary())
            elif nxt is not None and nxt not in (")", "OR"):
                parts.append(parse_unary())  # adjacency
            else:
                break
        if len(parts) == 1:
            return parts[0]
        if all(isinstance(p, Not) for p in parts):
            raise ExprError("pure-negation AND is a corpus complement")
        return And(tuple(parts))

    def parse_unary():
        if peek() == "NOT":
            take()
            child = parse_unary()
            if isinstance(child, Not):  # NOT NOT x == x
                return child.child
            return Not(child)
        return parse_prox()

    def parse_prox():
        left = parse_atom()
        while (t := peek()) is not None and (m := _NEAR_RE.match(t)):
            take()
            right = parse_atom()
            if not (isinstance(left, Term) and isinstance(right, Term)):
                raise ExprError("NEAR/k joins two plain terms")
            left = Near(left.term, right.term, int(m.group(1)))
        return left

    def parse_atom():
        t = peek()
        if t is None:
            raise ExprError("unexpected end of query")
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise ExprError("missing ')'")
            take()
            return node
        if t == ")":
            raise ExprError("unexpected ')'")
        if t.startswith('"'):
            take()
            # canonical tokenizer, not whitespace split: "new-york
            # times" must query the token sequence (new, york, times) —
            # the literal token 'new-york' can never exist in the index
            from inverted_index_and_search_spark.tokenizer import tokenize_py

            words = tuple(tokenize_py(t[1:-1]))
            if not words:
                raise ExprError("empty phrase")
            nxt = peek()
            if nxt is not None and nxt.startswith("^"):
                take()
                m = re.fullmatch(r"\^(\d+(?:\.\d+)?)", nxt)
                if not m:
                    raise ExprError(f"bad boost {nxt!r}: ^N or ^N.N")
                return Boosted(Phrase(words), float(m.group(1)))
            return Phrase(words)
        if t in ("AND", "OR") or _NEAR_RE.match(t):
            raise ExprError(f"operator {t} needs operands")
        take()
        boost = None
        bm = _BOOST_RE.match(t)
        if bm and bm.group(1):
            t, boost = bm.group(1), float(bm.group(2))
            if any(c in t for c in "*~:^"):
                raise ExprError(
                    f"boost on {t!r}: ^w applies to plain terms and "
                    "phrases only (wildcard/fuzzy/field atoms are "
                    "filters)")
        if boost is not None:
            return Boosted(Term(t.lower()), boost)
        if ":" in t:
            # field filter — checked before the wildcard/fuzzy branches
            # so 'source:src1*' reads as a field prefix value, not a
            # malformed term wildcard. The value is taken verbatim
            # (metadata is not tokenized); only the field name folds.
            m = _FIELD_ATOM_RE.match(t)
            if not m:
                raise ExprError(
                    f"field atom {t!r}: expected field:value with a "
                    "field of letters/digits/underscore")
            field, value = m.group(1).lower(), m.group(2)
            if not value:
                raise ExprError(f"field atom {t!r} needs a value "
                                "(use field:* for is-not-null)")
            if value.endswith("*"):
                return FieldAtom(field, value[:-1], prefix=True)
            if "*" in value:
                raise ExprError(f"field atom {t!r}: * is only valid "
                                "trailing in the value")
            return FieldAtom(field, value)
        if t.endswith("*"):
            body = t[:-1]
            if not body or "*" in body or "~" in body:
                raise ExprError(f"wildcard atom {t!r}: exactly one "
                                "trailing * after a non-empty prefix")
            return PrefixAtom(body.lower())
        if "*" in t:
            raise ExprError(f"wildcard atom {t!r}: * is only valid "
                            "trailing (no leading/infix wildcards — "
                            "they cannot use the sorted dictionary)")
        if "~" in t:
            m = _FUZZY_ATOM_RE.match(t)
            if not m:
                raise ExprError(f"fuzzy atom {t!r}: term~d with d in "
                                "0..2 (bare ~ means 1)")
            return FuzzyAtom(m.group(1).lower(),
                             int(m.group(2)) if m.group(2) else 1)
        if "^" in t:
            # any ^ not consumed by the boost regex is malformed (the
            # tokenizer strips ^ from documents, so no term contains it)
            raise ExprError(f"bad boost in {t!r}: term^N or term^N.N")
        return Term(t.lower())

    node = parse_or()
    if pos != len(toks):
        raise ExprError(f"trailing input at token {toks[pos]!r}")
    if isinstance(node, Not):
        raise ExprError("top-level NOT is a corpus complement")
    return node


def _ids(df: DataFrame) -> DataFrame:
    return df.select("doc_id")


def _require_positions(index: Index, what: str) -> None:
    post_t = index.postings.schema["postings"].dataType.elementType
    if "positions" not in post_t.fieldNames():
        raise ExprError(f"{what} need a positional index "
                        "(build with positions)")


def _any_term_docs(index: Index, terms: list[str]) -> DataFrame:
    """Distinct (doc_id) matching ANY term — UNSORTED (the sorted user
    surface is query.boolean_or; embedding its global orderBy in every
    expression leaf would pay a range-exchange per leaf that the
    enclosing joins/unions immediately destroy)."""
    norm = _norm_terms(terms)
    qp = _query_postings(index, norm)
    return (qp.select(F.explode("postings").alias("p"))
            .select(F.col("p.doc_id").alias("doc_id"))
            .distinct())


def _all_terms_docs(index: Index, terms: list[str]) -> DataFrame:
    """Distinct (doc_id) matching EVERY term — unsorted k-way semi-join
    via matched-term counting (same plan as query.boolean_and minus the
    final sort)."""
    norm = _norm_terms(terms)
    qp = _query_postings(index, norm)
    exploded = qp.select("term", F.explode("postings").alias("p")).select(
        "term", F.col("p.doc_id").alias("doc_id"))
    return (exploded.groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n_matched"))
            .filter(F.col("n_matched") == len(norm))
            .select("doc_id"))


def eval_expr(index: Index, node, meta: DataFrame | None = None) -> DataFrame:
    """(doc_id) doc set of an AST node — unsorted and distinct;
    callers order once. ``meta`` is the corpus/metadata relation
    (unique per doc_id) that field atoms filter; queries without field
    atoms never touch it."""
    from inverted_index_and_search_spark.operators.positional import (
        _phrase_starts,
    )

    if isinstance(node, Boosted):
        return eval_expr(index, node.child, meta)
    if isinstance(node, Term):
        return _any_term_docs(index, [node.term])
    if isinstance(node, FieldAtom):
        return _field_docs(meta, node)
    if isinstance(node, PrefixAtom):
        from inverted_index_and_search_spark.operators.query import (
            _atom_matched_docs,
        )

        return _atom_matched_docs(index,
                                  F.col("term").startswith(node.prefix))
    if isinstance(node, FuzzyAtom):
        from inverted_index_and_search_spark.operators.query import (
            _atom_matched_docs,
            _fuzzy_cond,
        )

        return _atom_matched_docs(index, _fuzzy_cond(node.term, node.dist))
    if isinstance(node, Phrase):
        _require_positions(index, '"phrase" atoms')
        return _ids(_phrase_starts(index, [w for w in node.words]))
    if isinstance(node, Near):
        from inverted_index_and_search_spark.operators.positional import (
            near_doc_ids,
        )

        _require_positions(index, "NEAR/k")
        return near_doc_ids(index, node.term_a, node.term_b, node.window)
    if isinstance(node, Or):
        # one pruned scan for all plain-term children; recurse the rest
        terms = [p.term for p in node.parts if isinstance(p, Term)]
        parts = [eval_expr(index, p, meta) for p in node.parts
                 if not isinstance(p, Term)]
        if terms:
            parts.append(_any_term_docs(index, terms))
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out.distinct()
    if isinstance(node, And):
        terms = [p.term for p in node.parts if isinstance(p, Term)]
        pos_parts = [eval_expr(index, p, meta) for p in node.parts
                     if not isinstance(p, (Term, Not))]
        neg_parts = [eval_expr(index, p.child, meta) for p in node.parts
                     if isinstance(p, Not)]
        if terms:
            # k-way semi-join in ONE aggregation (matched-term counting)
            pos_parts.append(_all_terms_docs(index, terms))
        # every part is a distinct doc set keyed by doc_id, so the
        # inner-join chain stays distinct — no re-distinct needed
        out = pos_parts[0]
        for p in pos_parts[1:]:
            out = out.join(p, "doc_id", "inner")
        for p in neg_parts:
            out = out.join(p, "doc_id", "left_anti")
        return out
    raise ExprError(f"unknown node {node!r}")


def search_expr(index: Index, query: str,
                meta: DataFrame | None = None) -> DataFrame:
    """(doc_id) sorted asc for a boolean query-language string.
    ``meta`` (the corpus/metadata relation) enables field atoms."""
    return eval_expr(index, parse(query), meta).orderBy("doc_id")


def search_expr_ranked(index: Index, query: str, k: int = 10,
                       meta: DataFrame | None = None) -> DataFrame:
    """(doc_id, score) — BM25 top-k restricted to the expression's
    boolean match set, score desc then doc_id asc.

    Scoring terms are the expression's positive leaves (phrase words
    included, negated branches and field atoms excluded — they only
    filter, like Lucene's ConstantScore field queries). The plan is
    the ordinary disjunctive BM25 scorer left-semi-joined to the match
    set before the top-k, so ranking touches only the query's terms'
    postings plus the (already small) match relation.
    """
    from pyspark.sql import functions as F

    from inverted_index_and_search_spark.operators.query import bm25_scores

    node = parse(query)
    terms = _norm_terms(expr_terms(node)
                        + expand_atom_terms(node, _df_atom_expander(index)))
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    matched = eval_expr(index, node, meta)
    boosts = expr_boosts(node)
    if boosts:
        from inverted_index_and_search_spark.operators.ranking import (
            weighted_bm25_scores,
        )

        weights = {t: boosts.get(t, 1.0) for t in terms}
        scored = weighted_bm25_scores(index, weights)
    else:
        scored = bm25_scores(index, terms)
    return (scored
            .join(matched.select("doc_id"), "doc_id", "left_semi")
            .select("doc_id", "score")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def expr_terms(node) -> list[str]:
    """All positive (non-negated) PLAIN terms/phrase words — the exact
    term set a ranked layer scores with. Wildcard/fuzzy atoms are not
    included here (their term set needs a dictionary): ranked callers
    add :func:`expand_atom_terms`."""
    if isinstance(node, Boosted):
        return expr_terms(node.child)
    if isinstance(node, Term):
        return [node.term]
    if isinstance(node, Phrase):
        return list(node.words)
    if isinstance(node, Near):
        return _norm_terms([node.term_a, node.term_b])
    if isinstance(node, (And, Or)):
        out: list[str] = []
        for p in node.parts:
            if not isinstance(p, Not):
                out.extend(expr_terms(p))
        return _norm_terms(out)
    return []


def expr_boosts(node) -> dict[str, float]:
    """term -> boost weight from the expression's positive Boosted
    clauses (phrase boosts apply to each phrase word). A term boosted
    more than once keeps the MAX weight (deterministic; Lucene
    composes per-clause, but this scorer is term-level disjunctive)."""
    out: dict[str, float] = {}

    def walk(n) -> None:
        if isinstance(n, Boosted):
            for t in expr_terms(n.child):
                out[t] = max(out.get(t, 0.0), n.weight)
        elif isinstance(n, (And, Or)):
            for p in n.parts:
                if not isinstance(p, Not):
                    walk(p)

    walk(node)
    return out


def atom_cond(node):
    """The dictionary predicate (a Column) of a wildcard/fuzzy atom."""
    from inverted_index_and_search_spark.operators.query import _fuzzy_cond

    if isinstance(node, PrefixAtom):
        return F.col("term").startswith(node.prefix)
    if isinstance(node, FuzzyAtom):
        return _fuzzy_cond(node.term, node.dist)
    raise ExprError(f"not a dictionary atom: {node!r}")


def field_cond(meta: DataFrame, node: FieldAtom):
    """The metadata predicate (a Column) of a field atom over ``meta``.

    String columns compare natively so equality / StringStartsWith push
    down to the scan; other types compare on their string form (the
    query language has no typed literals). Unknown fields raise —
    silently matching nothing would mask typos."""
    if node.field not in meta.columns:
        raise ExprError(
            f"unknown field {node.field!r}; metadata columns: "
            f"{', '.join(c for c in meta.columns if c != 'doc_id')}")
    col = F.col(node.field)
    if dict(meta.dtypes)[node.field] != "string":
        col = col.cast("string")
    if node.prefix:
        # startswith('') is null-rejecting true — field:* ≡ non-null
        return col.startswith(node.value)
    return col == node.value


def _field_docs(meta: DataFrame | None, node: FieldAtom) -> DataFrame:
    """(doc_id) doc set of a field atom — one pushed, pruned scan of
    the metadata relation. ``meta`` must be unique per doc_id (it is
    the corpus/metadata table itself), so no distinct is needed and the
    enclosing join algebra stays shuffle-minimal."""
    if meta is None:
        raise ExprError(
            f"field atom {node.field}:... needs a metadata relation "
            "(pass meta= the corpus table with doc_id + field columns)")
    if "doc_id" not in meta.columns:
        raise ExprError("metadata relation has no doc_id column")
    return meta.filter(field_cond(meta, node)).select("doc_id")


def _df_atom_expander(index: Index):
    """expander(atom) -> matched dictionary terms, for the DataFrame
    layouts: the sorted dictionary side table when present, else a
    narrow pushed scan of the postings term column."""
    from inverted_index_and_search_spark.operators.query import (
        _atom_matched_terms,
    )

    def expand(atom) -> list[str]:
        cond = atom_cond(atom)
        terms = _atom_matched_terms(index, cond)
        if terms is None:
            # direct-scan fallback, collected only up to the expansion
            # bound + 1 — and raising RIGHT HERE when it overflows: a
            # truncated list handed to the caller could dedup under the
            # bound against an overlapping atom and silently rank with
            # an incomplete term set
            terms = sorted({r["term"] for r in
                            index.postings.filter(cond)
                            .select("term").distinct()
                            .limit(MAX_EXPANSION + 1).collect()})
            if len(terms) > MAX_EXPANSION:
                raise ExprError(
                    f"atom {atom!r} matches more than {MAX_EXPANSION} "
                    "terms; narrow it for ranked queries")
        return terms

    return expand


def expand_atom_terms(node, expander) -> list[str]:
    """Matched dictionary terms of every positive wildcard/fuzzy atom —
    Lucene's scoring-mode rewrite (each matched term scores like a
    query term). ``expander(atom)`` resolves one atom to its terms for
    the caller's layout. Raises ExprError past MAX_EXPANSION, like
    Lucene's TooManyClauses."""
    out: list[str] = []

    def walk(n) -> None:
        if isinstance(n, Boosted):
            walk(n.child)
        elif isinstance(n, (PrefixAtom, FuzzyAtom)):
            out.extend(expander(n))
        elif isinstance(n, (And, Or)):
            for p in n.parts:
                if not isinstance(p, Not):
                    walk(p)

    walk(node)
    # dedup BEFORE the bound: overlapping atoms (de* OR def*) must not
    # spuriously trip TooManyClauses when the distinct set is in bounds
    uniq = _norm_terms(out)
    if len(uniq) > MAX_EXPANSION:
        raise ExprError(
            f"wildcard/fuzzy atoms expand to {len(uniq)} terms "
            f"(> {MAX_EXPANSION}); narrow the prefix for ranked queries")
    return uniq
