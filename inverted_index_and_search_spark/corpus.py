"""Deterministic synthetic source-code corpus.

Per ``BASELINE.json`` ``input_hint`` the engine's input is an
Iceberg-shaped table ``(repo, path, commit, lang, content)`` of
source-code files. This sandbox has no Iceberg jars and no external
data, so we synthesise the table deterministically (seeded, identical
regardless of partitioning) following FIXTURES.md §1:

- Zipfian mix of ~50 hot code keywords (``def``, ``return``, ``if`` …)
  — the skewed stop-word-like terms that exercise salting;
- a per-document pool of unique identifiers (``var_{doc}_{j}``) — the
  high-cardinality tail (mirrors the reference corpus's 250 MB
  near-unique-token genome file, reference ``README.md:29``);
- interleaved punctuation/operators incl. backslash + underscore (the
  tokenizer's disputed chars, SURVEY.md §2.8);
- log-normal doc lengths, plus one "genome-like" outlier doc.

Determinism contract: ``doc_content(i)`` is a pure function of
``(seed, i)``; the Spark generator and the local generator produce the
same rows, so index bytes are reproducible at any parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

KEYWORDS = (
    "def return if else for while class import from as try except "
    "public private static void int long float double string bool "
    "self this new null none true false print len range map filter "
    "lambda yield break continue pass raise assert with open read "
    "write close struct enum match case const let var fn impl trait"
).split()  # 66 hot tokens

_PUNCT = ["(", ")", "{", "}", ";", "=", "+", "-", "*", "/", ".", "_", "\\", ":", ","]

LANGS = ["python", "java", "scala", "c", "markdown"]
_EXT = {"python": "py", "java": "java", "scala": "scala", "c": "c", "markdown": "md"}

#: Zipf exponent for keyword draws — heavy head, exercises term skew.
_ZIPF_A = 1.3


def _rng(seed: int, i: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))


def doc_row(i: int, n_docs: int, seed: int = 42) -> dict:
    """Pure function (seed, i) -> one corpus row."""
    rng = _rng(seed, i)
    repo = f"org{i % 7}/repo{i % 23}"
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    path = f"src/dir{int(rng.integers(0, 40))}/file_{i}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()

    if i == 0 and n_docs >= 50:
        # genome-like outlier: long doc of near-unique tokens
        n_tokens = 50_000
        words = [f"g{i}x{j}" for j in range(n_tokens)]
    else:
        n_tokens = int(min(np.exp(rng.normal(5.2, 0.7)), 50_000)) + 10
        kw_idx = np.minimum(rng.zipf(_ZIPF_A, n_tokens) - 1, len(KEYWORDS) - 1)
        uniq_mask = rng.random(n_tokens) < 0.18
        n_ident = max(1, n_tokens // 20)
        ident_pick = rng.integers(0, n_ident, n_tokens)
        words = [
            f"var_{i}_{ident_pick[t]}" if uniq_mask[t] else KEYWORDS[kw_idx[t]]
            for t in range(n_tokens)
        ]
    # interleave punctuation/operators after ~30% of tokens
    punct_mask = rng.random(len(words)) < 0.3
    punct_pick = rng.integers(0, len(_PUNCT), len(words))
    parts = []
    for t, w in enumerate(words):
        parts.append(w)
        if punct_mask[t]:
            parts.append(_PUNCT[punct_pick[t]])
        parts.append("\n" if (t + 1) % 12 == 0 else " ")
    content = "".join(parts)
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
    }


def corpus_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generator for small test corpora."""
    return pd.DataFrame([doc_row(i, n_docs, seed) for i in range(n_docs)])


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed generator: ``spark.range`` + ``mapInPandas``.

    Each task generates only its ids, from the pure per-id function, so
    output is independent of the partition count.
    """
    rng_range = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([doc_row(int(i), n_docs, seed) for i in pdf["id"]])

    return rng_range.mapInPandas(gen, schema=CORPUS_SCHEMA)


DOC_KEY = ("repo", "path", "commit")


def with_doc_id(df: DataFrame, *, num_partitions: int | None = None,
                key: tuple[str, ...] = DOC_KEY) -> DataFrame:
    """Attach the engine's deterministic ``doc_id`` = 0-based global rank
    over the natural key (default ``(repo, path, commit)``).

    Scale-safe two-pass assignment (round-1 used a partition-less
    ``Window.orderBy`` whose ``row_number`` forced every row through ONE
    task — VERDICT r01 #4):

    1. range-partition the narrow key projection into P ordered splits
       and rank locally within each split;
    2. count rows per split (tiny P-row table), prefix-sum the counts
       into per-split offsets, broadcast them back;
    3. ``doc_id = offset[split] + local_rank - 1``, joined to the full
       rows on the natural key.

    Deterministic regardless of where the range boundaries land: splits
    are ordered and keys unique, so offset+local_rank IS the global
    rank. Every stage is parallel in P; the only single-task work is
    the prefix sum over P counter rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    key = list(key)
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    pid = (df.select(*key)
           .repartitionByRange(p, *[F.col(c) for c in key])
           .withColumn("_pid", F.spark_partition_id()))
    local = pid.withColumn(
        "_rk", F.row_number().over(Window.partitionBy("_pid").orderBy(*key)))
    counts = pid.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"))
    ids = (local.join(F.broadcast(offsets), "_pid")
           .select(*key, (F.col("_off") + F.col("_rk") - 1)
                   .cast("long").alias("doc_id")))
    return df.join(ids, key)
