"""Inverted-index construction — the engine's core pipeline.

Logical dataflow (same semantics as all four reference variants,
SURVEY.md §0: scan -> tokenize -> tf per (term, doc) -> postings per
term -> sink), expressed declaratively so Catalyst supplies what the
reference built by hand:

- partial/final HashAggregate replaces the Hadoop in-mapper combiner
  (reference ``TokenizerMapperStateful.java:29-85``) and combiner
  (``CombinerDocCounts.java``);
- column pruning drops ``content`` right after tokenization;
- AQE coalesces post-shuffle partitions.

North-rule additions absent in the reference: doc-length / collection /
per-term statistics for BM25, explicit term-hash bucketing
(``term_bucket``) for pruned query-time lookups, skew salting for hot
terms (``salted`` path), typed ``struct<doc_id,tf>`` postings instead of
``"file:count"`` strings (reference ``spark/inverted_index_search.py:212``).

Shuffle budget: exactly two wide exchanges (tf agg, postings agg) —
the same count as the reference's winning DF variant, SURVEY.md §4.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_and_search_spark.tokenizer import tokenize_pandas_udf, tokens_col

#: default number of term-hash buckets for the persisted index layout
DEFAULT_BUCKETS = 32

#: docs containing a term in more partitions than this fraction of the
#: corpus are treated as skewed ("hot") and salted during aggregation
DEFAULT_HOT_DF = 10_000


def term_bucket_col(term: F.Column, n_buckets: int) -> F.Column:
    """Stable bucket id: pmod(xxhash64(term), P). Used for index layout,
    query-time partition pruning, and co-located segment builds."""
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def tokens(docs: DataFrame, *, use_pandas_udf: bool = True,
           content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) — one row per token occurrence.

    ``use_pandas_udf=True`` is the north-star path (Arrow-vectorized);
    ``False`` uses the pure-JVM expression tokenizer (whole-stage
    codegen, fastest). Both are cross-tested for identical output.
    """
    tok = tokenize_pandas_udf(F.col(content_col)) if use_pandas_udf else tokens_col(F.col(content_col))
    return docs.select(F.col(id_col).alias("doc_id"), F.explode(tok).alias("term"))


def term_doc_tf(tok: DataFrame) -> DataFrame:
    """(term, doc_id, tf) — Catalyst emits partial+final HashAggregate,
    which IS the reference's in-mapper-combining, for free."""
    return tok.groupBy("term", "doc_id").agg(F.count("*").cast("int").alias("tf"))


def doc_stats(docs: DataFrame, tf: DataFrame, *, content_col: str = "content",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl, content_sha256).

    dl (token count) from the tf pass (no re-tokenize); sha256 is the
    per-row invariant vs the source row (BASELINE.json input_hint).
    """
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    sha = docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(content_col), 256).alias("content_sha256"),
    )
    # dl join is on doc_id; both sides already small (2-3 cols)
    return sha.join(dl, "doc_id", "left").fillna({"dl": 0})


def postings(tf: DataFrame, *, n_buckets: int = DEFAULT_BUCKETS,
             salt_hot_terms: bool = False, hot_df: int = DEFAULT_HOT_DF,
             salt_factor: int = 16) -> DataFrame:
    """(term, term_bucket, df, cf, postings: array<struct<doc_id,tf>>).

    Postings sorted by doc_id asc (required for delta encoding and for
    deterministic output regardless of partitioning — SURVEY.md §7).

    ``salt_hot_terms``: two-phase aggregation for skewed terms. Phase 1
    aggregates (term, salt) groups where salt = pmod(hash(doc_id), s),
    phase 2 merges the s partial lists per term. Output is byte-identical
    to the unsalted path (verified in tests) because the final
    sort_array restores canonical doc_id order. This bounds the largest
    single collect_list task at ~df/s postings, the engine's answer to
    the reference's IMC flush threshold (TokenizerMapperStateful.java:14).
    """
    post = F.struct(F.col("doc_id"), F.col("tf"))
    if not salt_hot_terms:
        agg = tf.groupBy("term").agg(
            F.sort_array(F.collect_list(post)).alias("postings"),
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
    else:
        salted = tf.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_factor)))
        partial = salted.groupBy("term", "salt").agg(
            F.collect_list(post).alias("p_postings"),
            F.count("*").cast("long").alias("p_df"),
            F.sum("tf").cast("long").alias("p_cf"),
        )
        agg = partial.groupBy("term").agg(
            F.sort_array(F.flatten(F.collect_list("p_postings"))).alias("postings"),
            F.sum("p_df").cast("long").alias("df"),
            F.sum("p_cf").cast("long").alias("cf"),
        )
    return agg.withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets)).select(
        "term", "term_bucket", "df", "cf", "postings"
    )


@dataclass
class Index:
    """In-memory handle on the index tables (all lazy DataFrames)."""

    postings: DataFrame  # term, term_bucket, df, cf, postings
    doc_stats: DataFrame  # doc_id, dl, content_sha256
    _n_docs: int | None = None
    _avgdl: float | None = None

    def collection_stats(self) -> tuple[int, float]:
        """(N, avgdl) — collected once, tiny."""
        if self._n_docs is None:
            row = self.doc_stats.agg(
                F.count("*").alias("n"), F.avg("dl").alias("avgdl")
            ).collect()[0]
            self._n_docs, self._avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
        return self._n_docs, self._avgdl


def build_index(docs: DataFrame, *, content_col: str = "content",
                id_col: str = "doc_id", use_pandas_udf: bool = True,
                n_buckets: int = DEFAULT_BUCKETS,
                salt_hot_terms: bool = False) -> Index:
    """End-to-end logical plan for the index build (lazy)."""
    tok = tokens(docs, use_pandas_udf=use_pandas_udf,
                 content_col=content_col, id_col=id_col)
    tf = term_doc_tf(tok)
    return Index(
        postings=postings(tf, n_buckets=n_buckets, salt_hot_terms=salt_hot_terms),
        doc_stats=doc_stats(docs, tf, content_col=content_col, id_col=id_col),
    )


def write_index(index: Index, out_dir: str, *, mode: str = "overwrite") -> None:
    """Persist the index: postings parquet partitioned by term_bucket
    (query-time ``WHERE term_bucket IN (...)`` prunes files), doc_stats
    as a small side table. Iceberg would use ``writeTo(...).using("iceberg")``
    with the same partition spec; jars absent in this sandbox."""
    (index.postings.repartition("term_bucket")
     .sortWithinPartitions("term")
     .write.mode(mode).partitionBy("term_bucket")
     .parquet(f"{out_dir}/postings"))
    index.doc_stats.write.mode(mode).parquet(f"{out_dir}/doc_stats")


def read_index(spark: SparkSession, out_dir: str) -> Index:
    return Index(
        postings=spark.read.parquet(f"{out_dir}/postings"),
        doc_stats=spark.read.parquet(f"{out_dir}/doc_stats"),
    )
