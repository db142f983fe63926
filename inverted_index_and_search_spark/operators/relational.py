"""Relational join/aggregation coverage (TPC-H-style).

The reference executes no relational join (SURVEY.md §2.3 — its only
join-like op is the query-time doc-set intersection); Catalyst provides
them natively. These queries demonstrate the engine surface a user gets
for free and pin the *physical* strategies we care about at 100 TB:

- :func:`pricing_summary` (Q1-shape): scan + partial/final hash agg,
  filter pushed to the parquet scan, no join — the pure-agg baseline.
- :func:`shipping_priority` (Q3-shape): fact-fact sort-merge/shuffled
  hash join (orders x lineitem) with a *broadcast* of the filtered
  customer dim, two-level agg, top-k (TakeOrderedAndProject).
- :func:`region_revenue` (Q5-lite): a star join where every dimension
  (customer -> nation -> region) is broadcast so the single shuffle is
  the fact-fact orders x lineitem join.

Floats: sums of double products are summation-order sensitive, so all
money aggregates round(2) on both engines; at that granularity the
partial-agg reorderings are far below the rounding quantum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Q1-shape: per (returnflag, linestatus) pricing aggregates over
    shipments up to a cutoff; filter reaches the parquet scan."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (lineitem
            .where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.count("*").cast("long").alias("count_order")))


def pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""


def shipping_priority(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, *, segment: str = "BUILDING",
                      k: int = 10) -> DataFrame:
    """Q3-shape: top-k undelivered orders by revenue for one market
    segment. Customer dim is explicitly broadcast; orders x lineitem is
    the one real shuffle."""
    cutoff = F.lit("1995-03-15").cast("timestamp")
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < cutoff)
    line = lineitem.where(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (line
            .join(ords, line["l_orderkey"] == ords["o_orderkey"])
            .join(F.broadcast(cust), ords["o_custkey"] == cust["c_custkey"])
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(rev), 2).alias("revenue"))
            .select(F.col("l_orderkey").alias("orderkey"),
                    F.col("o_orderdate").cast("timestamp").cast("long")
                    .alias("orderdate_epoch"),
                    "o_orderpriority", "revenue")
            .orderBy(F.desc("revenue"), F.asc("orderkey"))
            .limit(k))


def shipping_priority_sql(*, segment: str = "BUILDING", k: int = 10) -> str:
    return f"""
SELECT l_orderkey AS orderkey,
       cast(floor(epoch(o_orderdate)) as BIGINT) AS orderdate_epoch,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, orderkey ASC
LIMIT {k}
"""


def region_revenue(customer: DataFrame, orders: DataFrame,
                   lineitem: DataFrame, nation: DataFrame,
                   region: DataFrame) -> DataFrame:
    """Q5-lite: revenue per nation — star join with every dimension
    broadcast (customer->nation->region chain collapses to one
    broadcast hash join each); the only shuffle is orders x lineitem
    plus the final agg."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (customer
            .join(F.broadcast(nation),
                  customer["c_nationkey"] == nation["n_nationkey"])
            .join(F.broadcast(region),
                  nation["n_regionkey"] == region["r_regionkey"])
            .select("c_custkey", "n_name", "r_name"))
    return (lineitem
            .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
            .join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
            .groupBy("r_name", "n_name")
            .agg(F.round(F.sum(rev), 2).alias("revenue"),
                 F.count("*").cast("long").alias("n_lineitems")))


def region_revenue_sql() -> str:
    return """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""
