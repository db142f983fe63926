"""Resume test (FIXTURES.md §5): kill after 3 of 8 bucket commits,
restart, assert only the remaining buckets rebuild and the final index
content is identical to an uninterrupted build."""

from __future__ import annotations

import pytest

from inverted_index_and_search_spark import checkpoint as cp
from inverted_index_and_search_spark import oracle
from inverted_index_and_search_spark.operators import segments as seg
from tests.conftest import QUERY_SET


class Boom(RuntimeError):
    pass


def _content(spark, out_dir):
    rows = spark.read.parquet(f"{out_dir}/segments").select(
        "term", "df", "cf", "doc_ids_enc", "tfs_enc", "dls_enc"
    ).collect()
    return sorted(
        (r["term"], r["df"], r["cf"], bytes(r["doc_ids_enc"]),
         bytes(r["tfs_enc"]), bytes(r["dls_enc"]))
        for r in rows
    )


def test_resume_after_crash(spark, docs_df, oracle_idx, tmp_path):
    full = str(tmp_path / "full")
    cp.build_resumable(spark, docs_df, full, n_buckets=8)
    want = _content(spark, full)
    assert len(cp.manifest(full)) == 10  # stage0 + 8 buckets + dictionary

    crashed = str(tmp_path / "crashed")

    def die_after_3(b):
        if b == 2:
            raise Boom()

    with pytest.raises(Boom):
        cp.build_resumable(spark, docs_df, crashed, n_buckets=8,
                           on_bucket_done=die_after_3)
    m1 = cp.manifest(crashed)
    committed_before = {k for k in m1 if k.startswith("bucket_")}
    assert len(committed_before) == 3

    idx = cp.build_resumable(spark, docs_df, crashed, n_buckets=8)
    m2 = cp.manifest(crashed)
    # earlier commits untouched (same wall-second values = not rebuilt)
    for k in committed_before:
        assert m2[k] == m1[k]
    assert len({k for k in m2 if k.startswith("bucket_")}) == 8
    # byte-identical segment content vs the uninterrupted build
    assert _content(spark, crashed) == want

    # and the resumed index answers queries correctly
    for terms in QUERY_SET[:4]:
        got = seg.topk(idx, terms, k=10)
        wanted = oracle.bm25_topk(oracle_idx, terms, k=10)
        assert [g[0] for g in got] == [w[0] for w in wanted]


def test_manifest_records_lineage_and_metrics(spark, docs_df, tmp_path):
    out = str(tmp_path / "m")
    cp.build_resumable(spark, docs_df, out, n_buckets=4, input_desc="docs_df test")
    m = cp.manifest(out)
    assert m["stage0"]["input"] == "docs_df test"
    assert m["stage0"]["n_docs"] == docs_df.count()
    for b in range(4):
        e = m[f"bucket_{b}"]
        assert e["seconds"] >= 0 and "checksum" in e
        assert e["lineage"]["stage0"].endswith("stage0.json")
    # df totals across buckets == number of (term, doc) pairs
    assert sum(m[f"bucket_{b}"]["sum_df"] for b in range(4)) > 0


def test_run_metrics_artifact(spark, docs_df, tmp_path):
    """Run-level metrics JSON (engine analogue of the reference's
    collect_and_log_metrics, spark/inverted_index_search.py:262-457) is
    written next to the index with real shuffle/task numbers sourced
    from the AppStatusStore, and carries the lineage back-pointer."""
    from inverted_index_and_search_spark import metrics as mx

    out = str(tmp_path / "mx")
    cp.build_resumable(spark, docs_df, out, n_buckets=2)
    m = mx.read_run_metrics(out)
    assert m is not None and m["job"] == "resumable_build"
    assert m["wall_seconds"] > 0
    assert m["source"] == "status_store", m
    assert m["stages"]["shuffleWriteBytes"] > 0   # the build shuffles
    assert m["total_tasks"] > 0
    assert m["n_executors"] >= 1
    assert m["extra"]["lineage"]["stage0"].endswith("stage0.json")


def test_resumable_build_emits_dictionary(spark, docs_df, tmp_path):
    """The resumable builder writes the sorted dictionary side table
    (with its own manifest entry) so checkpoint-built indexes get the
    same term-range pruning as write_segment_index outputs."""
    import os

    from inverted_index_and_search_spark.operators import segments as seg

    out = str(tmp_path / "cpdict")
    idx = cp.build_resumable(spark, docs_df, out, n_buckets=2)
    assert os.path.isdir(f"{out}/dictionary")
    assert "dictionary" in cp.manifest(out)
    assert idx.dictionary is not None
    # read_segment_index on the checkpoint dir picks it up too, and
    # prefix queries answer through it
    back = seg.read_segment_index(spark, out)
    assert back.dictionary is not None
    got = seg.prefix_docs(back, "re")
    assert got == seg.prefix_docs(
        seg.SegmentIndex(segments=back.segments, n_docs=back.n_docs,
                         avgdl=back.avgdl, n_buckets=back.n_buckets,
                         block=back.block), "re")
    assert got
