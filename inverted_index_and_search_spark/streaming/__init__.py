"""Structured Streaming surface: watermarked windowed aggregation,
custom stateful operators (applyInPandasWithState), and LSM-style
incremental index ingest (foreachBatch delta segments + compaction)."""
