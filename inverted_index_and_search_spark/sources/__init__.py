"""Input/output source adapters (Iceberg-first, parquet fallback)."""

from inverted_index_and_search_spark.sources.catalog import (  # noqa: F401
    iceberg_available,
    load_documents,
    write_table,
)
