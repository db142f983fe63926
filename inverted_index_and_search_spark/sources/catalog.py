"""Iceberg-first table access with a parquet fallback.

The north-rule input is an Iceberg table of source-code files
``(repo, path, commit, lang, content)``. This sandbox ships no Iceberg
runtime jars, so the adapter resolves in order:

1. a catalog table name (``catalog.db.table`` / ``db.table``) via
   ``spark.read.table`` — this is the Iceberg path on a real cluster
   (snapshot isolation, partition pruning, hidden partitioning all come
   from the Iceberg source; no engine code changes needed);
2. a filesystem path via ``spark.read.parquet`` — the sandbox path.

Both return identical DataFrames, so every operator upstream is
source-agnostic. ``write_table`` mirrors the same split for sinks
(``writeTo(...).using("iceberg")`` vs ``write.parquet``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog implementation is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def load_documents(spark: SparkSession, source: str) -> DataFrame:
    """Load the documents table from an Iceberg catalog name or a
    parquet path (auto-detected: existing filesystem path -> parquet)."""
    if os.path.exists(source) or source.startswith(("file:", "hdfs:", "s3:")):
        return spark.read.parquet(source)
    return spark.read.table(source)


def _is_table_name(target: str) -> bool:
    """True only for a bare catalog identifier (``tbl`` / ``db.tbl`` /
    ``cat.db.tbl``) that does not exist on the filesystem — mirrors
    load_documents' detection so reads and writes classify targets the
    same way (a relative path like ``out/data.parquet`` or ``./out``
    must never be treated as an Iceberg name)."""
    import re

    ident = r"[A-Za-z_][A-Za-z0-9_]*"
    return (re.fullmatch(rf"{ident}(\.{ident}){{0,2}}", target) is not None
            and not os.path.exists(target))


def write_table(df: DataFrame, target: str, *, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """Write to an Iceberg table name or a parquet path, preserving the
    partition spec either way."""
    if not _is_table_name(target):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
        return
    wt = df.writeTo(target).using("iceberg")
    if partition_by:
        from pyspark.sql import functions as F

        wt = wt.partitionedBy(*[F.col(c) for c in partition_by])
    if mode == "overwrite":
        wt.createOrReplace()
    else:
        wt.append()
