"""Source adapter: parquet fallback path + Iceberg availability probe."""

from __future__ import annotations

from inverted_index_and_search_spark import sources


def test_load_documents_parquet_path(spark):
    df = sources.load_documents(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() > 0 and "text" in df.columns


def test_iceberg_probe_is_boolean(spark):
    # sandbox has no iceberg jars; probe must return False, not raise
    assert sources.iceberg_available(spark) is False


def test_write_table_parquet_roundtrip(spark, tmp_path):
    df = sources.load_documents(spark, "/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "roundtrip")
    sources.write_table(df.limit(20), out, partition_by=["lang"])
    back = sources.load_documents(spark, out)
    assert back.count() == 20
    assert set(back.columns) == set(df.columns)
