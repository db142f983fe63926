"""Structured Streaming operators.

The reference is batch-only (SURVEY.md §2.7); these cover the streaming
surface a production ingest pipeline needs, each verified against its
batch twin (same input -> identical rows):

- :func:`windowed_counts_stream` — file-source stream, 1-hour event-time
  watermark, tumbling-window aggregation, ``availableNow`` trigger.
  With a complete (bounded) input the result equals
  ``events.windowed_counts`` exactly — the watermark only matters for
  state eviction on unbounded streams.
- :func:`user_counts_stateful_stream` — custom stateful operator via
  ``applyInPandasWithState`` (GroupState per user): running event
  count + value sum, emitting the updated state per micro-batch; the
  final row per user equals the batch groupBy.

Both run the stream to completion on bounded input and return a plain
DataFrame over the sink, so they compose with the test/driver harness.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from inverted_index_and_search_spark.operators.events import WINDOW


def _stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    schema = spark.read.parquet(events_dir).schema
    df = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(events_dir))
    # parquet timestamps load as TIMESTAMP_NTZ; watermarks require TIMESTAMP
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_completion(stream_df: DataFrame, *, out_fmt: str = "memory",
                       query_name: str = "q", output_mode: str = "append",
                       checkpoint: str | None = None):
    writer = (stream_df.writeStream.format(out_fmt)
              .queryName(query_name).outputMode(output_mode)
              .trigger(availableNow=True))
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def windowed_counts_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Tumbling-hour counts via a watermarked stream; returns the final
    result table (== events.windowed_counts on bounded input)."""
    ev = _stream_events(spark, events_dir)
    w = F.window("ts", WINDOW)
    agg = (ev.withWatermark("ts", "1 hour")
           .groupBy(w.alias("w"), "event_type")
           .agg(F.count("*").cast("long").alias("n"),
                F.round(F.sum("value"), 6).alias("sum_value"))
           .select(F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
                   "event_type", "n", "sum_value"))
    name = f"wc_{abs(hash(events_dir)) % 10 ** 8}"
    ckpt = tempfile.mkdtemp(prefix="iis_stream_ckpt_")
    # complete mode: bounded input -> final correct aggregates for every
    # window (append mode would hold back windows newer than the
    # watermark at end-of-stream)
    _run_to_completion(agg, query_name=name, output_mode="complete",
                       checkpoint=ckpt)
    return spark.table(name)


_USER_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])
_USER_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _update_user(key, pdfs, state: GroupState):
    # state keeps the RAW running total; rounding happens only at emit —
    # round-at-each-update would compound representation error across
    # micro-batches and drift from the batch twin's round(sum(value), 6)
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [round(total, 6)]})


def user_counts_stateful_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Custom stateful operator: per-user running (count, value-sum)
    kept in GroupState, updated per micro-batch via Arrow batches.
    Returns one row per user per micro-batch that touched it; the last
    row per user is the final total (tests take max n_events)."""
    ev = _stream_events(spark, events_dir)
    updated = (ev.select("user_id", "value")
               .groupBy("user_id")
               .applyInPandasWithState(
                   _update_user, _USER_OUT_SCHEMA, _USER_STATE_SCHEMA,
                   "update", GroupStateTimeout.NoTimeout))
    name = f"uc_{abs(hash(events_dir)) % 10 ** 8}"
    ckpt = tempfile.mkdtemp(prefix="iis_stream_ckpt_")
    _run_to_completion(updated, query_name=name, output_mode="update",
                       checkpoint=ckpt)
    return spark.table(name)
