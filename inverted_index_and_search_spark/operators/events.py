"""Event-stream analytics operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props-json).

Batch window/aggregation coverage (SURVEY.md §2.7 marks these absent in
the reference; they are standard engine surface):

- :func:`windowed_counts` — epoch-aligned tumbling-window aggregation
  (the batch twin of streaming.windowed_counts_stream; both produce
  identical rows, asserted in tests).
- :func:`sessionize` — gap-based sessionization via window functions
  (lag + conditional cumsum), the canonical stateful-analytics shape.
- :func:`props_json_stats` — JSON extraction (`get_json_object`) over
  the props column.

All emit epoch-second longs instead of timestamps so the DuckDB oracle
compare is timezone-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: session gap threshold (seconds)
SESSION_GAP_S = 30 * 60
#: tumbling window width
WINDOW = "1 hour"


def windowed_counts(events: DataFrame) -> DataFrame:
    """(window_start, event_type, n, sum_value) per tumbling hour."""
    w = F.window("ts", WINDOW)
    return (events.groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
                    "event_type", "n", "sum_value"))


def windowed_counts_sql(table: str = "events") -> str:
    return f"""
SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS window_start,
       event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM {table} GROUP BY 1, 2
"""


def sessionize(events: DataFrame, *, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """(user_id, session_id, n_events, start_epoch, end_epoch, total_value)
    — sessions split on > gap_s of user inactivity.

    Window-function pipeline: lag(ts) per user -> new-session flag ->
    running sum = session ordinal -> per-session aggregate. Two narrow
    shuffles (both hash-partitioned by user_id; Catalyst reuses the
    exchange between the two window specs and the final groupBy).
    """
    from pyspark.sql import Window

    order = [F.col("ts").asc(), F.col("event_id").asc()]
    per_user = Window.partitionBy("user_id").orderBy(*order)
    # parquet timestamps load as TIMESTAMP_NTZ; epoch via timestamp
    ep = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag(ep).over(per_user)
    new_sess = F.when(prev.isNull() | ((ep - prev) > gap_s), 1).otherwise(0)
    with_sess = (events
                 .withColumn("_new", new_sess)
                 .withColumn("session_id",
                             F.sum("_new").over(
                                 per_user.rowsBetween(Window.unboundedPreceding, 0))
                             .cast("long")))
    return (with_sess.groupBy("user_id", "session_id")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.min(ep).alias("start_epoch"),
                 F.max(ep).alias("end_epoch"),
                 F.round(F.sum("value"), 6).alias("total_value")))


def sessionize_sql(table: str = "events", *, gap_s: int = SESSION_GAP_S) -> str:
    return f"""
WITH lagged AS (
  SELECT user_id, event_id, value, cast(floor(epoch(ts)) as BIGINT) AS ep,
         lag(cast(floor(epoch(ts)) as BIGINT)) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS prev
  FROM {table}
),
flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR ep - prev > {gap_s} THEN 1 ELSE 0 END AS newf
  FROM lagged
),
sess AS (
  SELECT *, sum(newf) OVER (PARTITION BY user_id ORDER BY ep ASC, event_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ::BIGINT AS session_id
  FROM flagged
)
SELECT user_id::BIGINT AS user_id, session_id,
       count(*)::BIGINT AS n_events,
       min(ep)::BIGINT AS start_epoch, max(ep)::BIGINT AS end_epoch,
       round(sum(value), 6) AS total_value
FROM sess GROUP BY 1, 2
"""


def props_json_stats(events: DataFrame) -> DataFrame:
    """(event_type, n, avg_k) — JSON field extraction from props."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (events.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.avg(k), 6).alias("avg_k")))


def props_json_stats_sql(table: str = "events") -> str:
    return f"""
SELECT event_type, count(*)::BIGINT AS n,
       round(avg((props ->> '$.k')::BIGINT), 6) AS avg_k
FROM {table} GROUP BY 1
"""
