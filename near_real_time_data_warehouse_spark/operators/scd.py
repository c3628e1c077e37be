"""Slowly-changing-dimension (SCD type 2) versioning from a change feed.

The reference warehouse upserts dims with first-writer-wins (SCD type 0
— /root/reference/hybrid_join.py:365-378, mirrored at etl.py:122). Real
warehouses usually need type 2: every attribute change opens a new
version row with ``valid_from``/``valid_to``/``is_current``, so facts
can join the dimension AS OF their event time.

Pipeline (all map-side-combinable or single-key-shuffle — scales):
  1. same-timestamp collapse: ``min_by(attr, tie)`` groupBy — exact
     because the tie column is unique, and partially aggregable;
  2. change compaction: drop rows whose attribute equals the previous
     version's (lag over the key) — the step that makes the history
     minimal;
  3. versioning: ``valid_to = lead(valid_from)``, open-ended for the
     current row; version numbers by row_number.
Steps 2-3 share one shuffle (same partitionBy key, same ordering).

The driver entry versions each customer's order-priority from the
orders table as the change feed; the oracle is the same window chain in
DuckDB (arg_min / LAG / LEAD), hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_tables
from . import registry


def scd2_versions(
    feed: DataFrame, key: str, ts: str, attr: str, tie: str
) -> DataFrame:
    """Minimal SCD2 history from a raw change feed.

    ``feed`` rows are observations (key, ts, attr, tie); ``tie`` must be
    unique per (key, ts) so the same-timestamp collapse is deterministic.
    Output: one row per retained version with version_no, valid_from,
    valid_to (null = open), is_current."""
    collapsed = feed.groupBy(key, ts).agg(F.min_by(attr, tie).alias(attr))
    w = Window.partitionBy(key).orderBy(ts)
    changes = (
        collapsed.withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .drop("_prev")
    )
    return changes.select(
        F.col(key),
        F.row_number().over(w).alias("version_no"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.col(attr),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )


def customer_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each customer's order priority: orders are the
    change feed (one observation per order day, min-orderkey wins the
    day), compacted to actual changes and versioned."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    feed = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("change_date"),
        "o_orderpriority",
        "o_orderkey",
    )
    hist = scd2_versions(feed, "o_custkey", "change_date", "o_orderpriority", "o_orderkey")
    return hist.select(
        F.col("o_custkey").alias("custkey"),
        "version_no",
        "valid_from",
        "valid_to",
        F.col("o_orderpriority").alias("priority"),
        "is_current",
    )


SCD2_SQL = """
WITH collapsed AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE) AS change_date,
         arg_min(o_orderpriority, o_orderkey) AS o_orderpriority
  FROM orders
  GROUP BY o_custkey, CAST(o_orderdate AS DATE)
),
ch AS (
  SELECT *,
         LAG(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY change_date) AS prev
  FROM collapsed
),
compacted AS (
  SELECT o_custkey, change_date, o_orderpriority
  FROM ch
  WHERE prev IS NULL OR prev <> o_orderpriority
)
SELECT o_custkey AS custkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY change_date) AS version_no,
       change_date AS valid_from,
       LEAD(change_date) OVER (PARTITION BY o_custkey ORDER BY change_date) AS valid_to,
       o_orderpriority AS priority,
       LEAD(change_date) OVER (PARTITION BY o_custkey ORDER BY change_date) IS NULL
         AS is_current
FROM compacted
"""


registry.register("orders_scd2_priority_history", customer_priority_history, SCD2_SQL)
