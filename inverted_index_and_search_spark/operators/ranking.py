"""Alternative ranking models + pseudo-relevance feedback.

The reference ranks exclusively with BM25 (``search-query.py:64-93``:
one hand-rolled scorer, k1/b constants inlined). A production engine
exposes a FAMILY of ranking functions behind one query surface
(Lucene's ``Similarity`` plug point; Terrier/Anserini model flags), so
this module adds the two classic public alternatives plus the standard
relevance-feedback wrapper, all over the SAME pruned postings access
path as :func:`query.bm25_topk` — no new layouts, no new shuffles:

- :func:`qld_topk` — query likelihood with Dirichlet smoothing
  (Zhai & Lafferty, "A Study of Smoothing Methods for Language Models
  Applied to Ad Hoc Information Retrieval", SIGIR 2001):

      score(q,d) = sum_{t in q, tf>0} ln(1 + tf / (mu * cf_t / C))
                   + |q| * ln(mu / (dl_d + mu))

  the standard candidate-docs decomposition: only matched (t,d) pairs
  are touched, the missing-term background folds into the per-doc
  second addend, and C (total collection length) and |q| (count of
  query terms present in the index) are scalars.

- :func:`classic_tfidf_topk` — Lucene ClassicSimilarity (the public
  TFIDFSimilarity formula; VSM practical scoring, IIR ch. 6):

      score(q,d) = (n_matched / |q|)
                   * sum_{t in q∩d} sqrt(tf) * idf(t)^2 / sqrt(dl_d)
      idf(t)     = 1 + ln(N / (df_t + 1))

- :func:`bm25_prf_topk` — pseudo-relevance feedback in the RM3 shape
  (Lavrenko & Croft relevance models; Abdul-Jaleel et al., TREC 2004):
  rank with BM25, treat the top ``fb_k`` docs as relevant, extract the
  ``fb_m`` highest-weight expansion terms by

      w(t) = sum_{d in fb} tf_{t,d} / dl_d        (t not in q)

  (the relevance-model p(t|d) estimate under uniform doc priors),
  L1-normalize, and rescore with the interpolated weighted query
  ``q + beta * w`` — original terms at weight 1, expansion terms at
  ``beta * w(t)``. Deterministic ties: feedback docs ROUNDED(6) score
  desc / doc_id asc, expansion terms ROUNDED(9) weight desc / term asc
  — the intermediate selections order by rounded values on BOTH the
  engine and oracle sides, so float summation order (Spark's parallel
  sum vs DuckDB's serial one) cannot flip a near-tie and cascade into
  a different expansion set.

Scale shape: every scorer touches only the query terms'
bucket-pruned postings rows + the broadcast doc-stats side (identical
to BM25); PRF adds two BOUNDED driver collects (fb_k doc ids, fb_m
expansion terms — both << 100 rows by contract), exactly the
more-like-this profile pattern (query.py:more_like_this), and its
expansion-profile scan is the same inverted-layout limitation
documented there (a doc-bucketed forward index turns it into a
partition-pruned lookup; the scorer stages are unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inverted_index_and_search_spark.operators.index_build import Index
from inverted_index_and_search_spark.operators.query import (
    K1,
    B,
    _norm_terms,
    _query_postings,
    bm25_scores,
    bm25_topk,
    exploded_with_dl,
)

__all__ = [
    "qld_topk", "classic_tfidf_topk", "bm25_prf_topk",
    "weighted_bm25_scores", "expansion_terms", "ranking_models",
]

#: Dirichlet smoothing pseudo-count (Zhai & Lafferty's recommended
#: order of magnitude for short queries)
DEFAULT_MU = 2000.0


def _empty_scores(index: Index) -> DataFrame:
    return index.postings.sparkSession.createDataFrame(
        [], "doc_id long, score double")


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """score desc, doc_id asc — TakeOrderedAndProject tail shared by
    every ranking model (round 6: the oracle-comparison contract)."""
    return (scored
            .select("doc_id", F.round("score", 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(int(k)))


def qld_topk(index: Index, terms: list[str], k: int = 10, *,
             mu: float = DEFAULT_MU) -> DataFrame:
    """(doc_id, score) — Dirichlet query-likelihood top-k.

    One job, same plan skeleton as BM25: pruned postings fetch ->
    explode -> broadcast dl join -> per-doc hash agg -> top-k. The two
    query-level scalars ride in-plan: C = N * avgdl is exact (avgdl is
    sum(dl)/N over the same doc_stats), |q| is a 1-row aggregate of the
    pruned postings relation cross-joined in (a term absent from the
    index has cf = 0 — no probability mass — and drops from the query,
    the standard convention).
    """
    norm = _norm_terms(terms)
    if not norm:
        return _empty_scores(index)
    n_docs, avgdl = index.collection_stats()
    c_total = float(n_docs) * avgdl  # == exact sum(dl)

    qp = _query_postings(index, norm)
    # |q| restricted to index-present terms: 1-row agg of the pruned
    # (<= |q|-row) relation, broadcast via cross join — no driver collect
    qn = qp.agg(F.countDistinct("term").alias("q_n"))

    base = exploded_with_dl(index, qp, [F.col("cf")])
    scored = (
        base
        .withColumn(
            "term_ll",
            F.log(1.0 + F.col("tf") * F.lit(c_total)
                  / (F.lit(float(mu)) * F.col("cf"))))
        .groupBy("doc_id", "dl")
        .agg(F.sum("term_ll").alias("match_ll"))
        .crossJoin(F.broadcast(qn))
        .withColumn(
            "score",
            F.col("match_ll")
            + F.col("q_n")
            * F.log(F.lit(float(mu)) / (F.col("dl") + F.lit(float(mu))))))
    return _topk(scored, k)


def classic_tfidf_topk(index: Index, terms: list[str],
                       k: int = 10) -> DataFrame:
    """(doc_id, score) — Lucene-ClassicSimilarity VSM top-k.

    ``|q|`` is the normalized query length (a driver literal — absent
    terms still count toward the coord denominator, as Lucene's
    maxOverlap does); everything else is the standard pruned-postings
    plan.
    """
    norm = _norm_terms(terms)
    if not norm:
        return _empty_scores(index)
    n_docs, _ = index.collection_stats()

    qp = _query_postings(index, norm)
    idf = 1.0 + F.log(F.lit(float(n_docs)) / (F.col("df") + 1.0))
    base = exploded_with_dl(index, qp,
                            [F.col("term"), idf.alias("idf")])
    scored = (
        base
        .withColumn(
            "w",
            F.sqrt(F.col("tf")) * F.col("idf") * F.col("idf")
            / F.sqrt(F.col("dl")))
        .groupBy("doc_id")
        .agg(F.sum("w").alias("raw"),
             F.countDistinct("term").alias("n_matched"))
        .withColumn(
            "score",
            F.col("raw") * F.col("n_matched") / F.lit(float(len(norm)))))
    return _topk(scored, k)


def expansion_terms(index: Index, fb_doc_ids: list[int],
                    exclude: list[str], fb_m: int) -> list[tuple[str, float]]:
    """Top ``fb_m`` (term, L1-normalized weight) over the feedback docs
    by w(t) = sum tf/dl, excluding ``exclude``; weight desc, term asc.

    Bounded: the collect is <= fb_m rows. With a FORWARD layout the
    feedback docs' rows are a partition-pruned point lookup (fb_k ids,
    driver-side bucket hashes — see query.forward_doc_rows); without
    one the scan is the inverted layout's doc->terms limitation shared
    with more_like_this."""
    from inverted_index_and_search_spark.operators.query import (
        forward_doc_rows,
    )

    dl = F.broadcast(
        index.doc_stats.select("doc_id", "dl")
        .where(F.col("doc_id").isin([int(d) for d in fb_doc_ids])))
    fwd = forward_doc_rows(index, [int(d) for d in fb_doc_ids])
    if fwd is not None:
        base = fwd.select("term", "doc_id", "tf")
    else:
        base = (index.postings
                .select("term", F.explode("postings").alias("p"))
                .select("term", F.col("p.doc_id").alias("doc_id"),
                        F.col("p.tf").alias("tf")))
    rows = (
        base
        .join(dl, "doc_id")
        .where(~F.col("term").isin(list(exclude)))
        .groupBy("term")
        .agg(F.round(F.sum(F.col("tf") / F.col("dl")), 9).alias("w"))
        .orderBy(F.col("w").desc(), F.col("term").asc())
        .limit(int(fb_m))
        .collect())
    total = sum(r["w"] for r in rows) or 1.0
    return [(r["term"], r["w"] / total) for r in rows]


def weighted_bm25_scores(index: Index,
                         weights: dict[str, float]) -> DataFrame:
    """(doc_id, score, n_matched) — BM25 with per-term multiplicative
    weights (a tiny literal map; terms at weight 1.0 are plain BM25).
    The composable scorer under PRF and future query-boost syntax."""
    norm = sorted(weights)
    n_docs, avgdl = index.collection_stats()
    qp = _query_postings(index, norm)
    idf_col = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    wmap = F.create_map(
        *[F.lit(x) for t in norm for x in (t, float(weights[t]))])
    base = exploded_with_dl(index, qp,
                            [F.col("term"), idf_col.alias("idf")])
    return (
        base
        .withColumn(
            "term_score",
            wmap[F.col("term")]
            * F.col("idf")
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / avgdl)))
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"),
             F.countDistinct("term").alias("n_matched")))


def bm25_prf_topk(index: Index, terms: list[str], k: int = 10, *,
                  fb_k: int = 10, fb_m: int = 5,
                  beta: float = 0.5) -> DataFrame:
    """(doc_id, score) — BM25 with RM3-shape pseudo-relevance feedback.

    Three bounded stages (see module docstring): feedback top-``fb_k``
    collect, expansion-term profile collect, one weighted-BM25 scoring
    job over original-plus-expansion terms.
    """
    norm = _norm_terms(terms)
    if not norm:
        return _empty_scores(index)
    fb = [r["doc_id"] for r in _topk(bm25_scores(index, norm), fb_k).collect()]
    if not fb:
        return _empty_scores(index)
    exp = expansion_terms(index, fb, norm, fb_m)
    weights = {t: 1.0 for t in norm}
    for t, w in exp:
        weights[t] = weights.get(t, 0.0) + float(beta) * w
    return _topk(weighted_bm25_scores(index, weights), k)


def synonym_bm25_topk(index: Index, terms: list[str],
                      synonyms: dict[str, list[str]], k: int = 10,
                      ) -> DataFrame:
    """(doc_id, score) — BM25 with query-time synonym expansion, Lucene
    ``SynonymQuery`` semantics: each query term t becomes the group
    {t} ∪ synonyms(t); a group scores as ONE pseudo-term with
    tf = sum of member tfs in the doc and df = max member df (Lucene's
    blended docFreq — union-df would need a distinct-count the postings
    stats can't answer, and max is the standard conservative blend).

    One job, the standard plan: the pruned fetch covers ALL group
    members' buckets, a tiny literal term->group map folds members onto
    their group, a (group, doc) partial agg sums member tfs and maxes
    member dfs, then ordinary BM25 per group. Group idf uses the
    blended df; ties round(6)/doc_id asc as everywhere."""
    norm = _norm_terms(terms)
    spark = index.postings.sparkSession
    if not norm:
        return _empty_scores(index)
    groups: dict[str, str] = {}  # member -> group head
    for t in norm:
        groups[t] = t
        for s in synonyms.get(t, []):
            s = s.lower()
            # a member already claimed by an earlier group keeps the
            # FIRST head (sorted-norm order): deterministic
            groups.setdefault(s, t)
    members = sorted(groups)
    n_docs, avgdl = index.collection_stats()
    qp = _query_postings(index, members)
    gmap = F.create_map(*[F.lit(x) for m in members
                          for x in (m, groups[m])])
    # group-LEVEL blended df (max over all index-present members, not
    # per-doc — the same idf must apply to every doc the group touches):
    # a tiny agg of the pruned term-level rows, broadcast back
    gdf = (qp.select(gmap[F.col("term")].alias("grp"), "df")
           .groupBy("grp").agg(F.max("df").alias("gdf")))
    base = exploded_with_dl(index, qp, [gmap[F.col("term")].alias("grp")])
    # dl is constant per doc — max() just carries it through the
    # (grp, doc) partial agg, whichever side it arrived from (inline
    # posting struct or the broadcast join inside exploded_with_dl)
    grouped = (base.groupBy("grp", "doc_id")
               .agg(F.sum("tf").alias("gtf"), F.max("dl").alias("dl"))
               .join(F.broadcast(gdf), "grp"))
    idf_col = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("gdf") + 0.5)
        / (F.col("gdf") + 0.5))
    scored = (
        grouped
        .withColumn(
            "term_score",
            idf_col
            * (F.col("gtf") * (K1 + 1.0))
            / (F.col("gtf") + K1 * (1.0 - B + B * F.col("dl") / avgdl)))
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score")))
    return _topk(scored, k)


def ranking_models(index: Index, terms: list[str], k: int = 10, *,
                   mu: float = DEFAULT_MU) -> DataFrame:
    """(model, doc_id, score) — the three ranking models' top-k side by
    side for one query (model asc, score desc, doc_id asc): the
    engine's ``Similarity`` surface as data, driver-verified as one
    tagged union."""
    out = None
    for tag, df in (
        ("bm25", bm25_topk(index, terms, k=k)
                 .select("doc_id", F.round("score", 6).alias("score"))),
        ("qld", qld_topk(index, terms, k=k, mu=mu)),
        ("tfidf", classic_tfidf_topk(index, terms, k=k)),
    ):
        tagged = df.select(F.lit(tag).alias("model"), "doc_id", "score")
        out = tagged if out is None else out.unionByName(tagged)
    return out.orderBy("model", F.col("score").desc(), F.col("doc_id").asc())
