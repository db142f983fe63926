"""Raw-file corpus ingestion — the reference's primary entry path.

The reference's every use case starts from a directory of plaintext
files: ``safe_read`` reads each input path with ``wholetext`` +
``recursiveFileLookup``, skips paths that fail, and projects the
basename as the document id (``spark/inverted_index_search.py:72-100``,
``spark/RDD_inverted_index_search.py:207-213``,
``TokenizerMapperStateful.java:31-38``); the Hadoop and SPIMI variants
additionally restrict to ``.txt`` files
(``InvertedIndexAndSearch.java:34``, ``non-parallel/non-parallel.py:119``).

Spark-first equivalents used here instead of hand-rolled mechanics:

- small-file packing: ``spark.sql.files.maxPartitionBytes`` /
  ``openCostInBytes`` subsume the reference's 152-line
  ``MyCombineTextInputFormat`` (SURVEY.md §2.1);
- suffix predicate: the DataSource ``pathGlobFilter`` option prunes at
  listing time (no post-hoc filter over read bytes);
- filename projection: ``input_file_name()`` + ``regexp_extract`` —
  same expression shape as the reference DF variant.

Output schema: ``(doc_key: string, content: string)`` where doc_key is
the base filename; :func:`docs_from_files` additionally assigns the
engine's dense ``doc_id`` (scale-safe two-pass rank, corpus.with_doc_id).

Caveat carried from the reference: basename-as-id collides when two
directories hold files with the same name — identical to the reference
behavior (later occurrences merge into one logical doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_and_search_spark.corpus import with_doc_id


def read_text_files(spark: SparkSession, input_paths: list[str] | str, *,
                    glob: str = "*.txt", recursive: bool = True,
                    verbose: bool = True) -> DataFrame:
    """(doc_key, content) — one row per file, content = whole file.

    Per-path failure skip (reference ``safe_read``): an unreadable /
    nonexistent path logs and is skipped; only if NO path yields data
    does the reader raise. ``glob=None`` disables the suffix predicate
    (reference Spark variants read everything; Hadoop/SPIMI filter .txt).
    """
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    result: DataFrame | None = None
    errors: list[str] = []
    for path in input_paths:
        try:
            # format("text").load: DataFrameReader.text() in PySpark 4
            # overrides a string-set "wholetext" option with its kwarg
            # default, silently reverting to line mode
            reader = (spark.read.format("text")
                      .option("wholetext", True)
                      .option("recursiveFileLookup", recursive))
            if glob:
                reader = reader.option("pathGlobFilter", glob)
            df = reader.load(path).select(
                F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1)
                .alias("doc_key"),
                F.col("value").alias("content"),
            )
            result = df if result is None else result.unionByName(df)
        except Exception as e:  # per-path skip, reference safe_read L93-97
            errors.append(f"{path}: {e}")
            if verbose:
                print(f"skipping unreadable input path {path}: {e}")
    if result is None:
        raise FileNotFoundError(
            f"no readable input path among {input_paths}: {errors}")
    return result


def docs_from_files(spark: SparkSession, input_paths: list[str] | str, *,
                    glob: str = "*.txt", recursive: bool = True) -> DataFrame:
    """(doc_id, doc_key, content) — raw files with the engine's dense
    0-based ``doc_id`` (global rank over doc_key, scale-safe two-pass)."""
    raw = read_text_files(spark, input_paths, glob=glob, recursive=recursive)
    return with_doc_id(raw, key=("doc_key",)).select(
        "doc_id", "doc_key", "content")
