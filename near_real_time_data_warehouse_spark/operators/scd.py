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


# CTE block shared by the history oracle and the AS-OF join oracle.
SCD2_CTES = """collapsed AS (
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
),
scd2_hist AS (
  SELECT o_custkey AS custkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY change_date) AS version_no,
         change_date AS valid_from,
         LEAD(change_date) OVER (PARTITION BY o_custkey ORDER BY change_date) AS valid_to,
         o_orderpriority AS priority,
         LEAD(change_date) OVER (PARTITION BY o_custkey ORDER BY change_date) IS NULL
           AS is_current
  FROM compacted
)"""

SCD2_SQL = f"""
WITH {SCD2_CTES}
SELECT custkey, version_no, valid_from, valid_to, priority, is_current FROM scd2_hist
"""


def priority_asof_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (AS OF) fact→dimension join: each lineitem picks up the
    customer's priority version valid at its ship date.

    This is the read side of SCD2 and a distinct kernel from the
    union+window as-of (operators/events.asof_last_error): an equi-join
    on the dimension key with the validity interval as a *residual*
    predicate. Versions per key are few, so the residual filters a
    handful of candidate rows per probe — no range-join explosion, and
    the plan is a plain shuffle/broadcast hash join at any scale.
    Intervals tile and never overlap (tested), so at most one version
    matches; facts before the first version keep NULLs via the left
    join."""
    li = load_tables(spark, sf_dir, ("lineitem", "orders"))
    facts = (
        li["lineitem"]
        .select("l_orderkey", "l_linenumber", F.col("l_shipdate").cast("date").alias("ship_date"))
        .join(li["orders"].select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
    )
    hist = customer_priority_history(spark, sf_dir)
    cond = (
        (facts["o_custkey"] == hist["custkey"])
        & (hist["valid_from"] <= facts["ship_date"])
        & (hist["valid_to"].isNull() | (facts["ship_date"] < hist["valid_to"]))
    )
    return facts.join(hist, cond, "left").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("o_custkey").alias("custkey"),
        "ship_date",
        F.col("priority").alias("priority_at_ship"),
        "version_no",
    )


ASOF_SHIP_SQL = f"""
WITH {SCD2_CTES},
f AS (
  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
         CAST(l.l_shipdate AS DATE) AS ship_date
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT f.l_orderkey AS orderkey,
       f.l_linenumber AS linenumber,
       f.o_custkey AS custkey,
       f.ship_date,
       h.priority AS priority_at_ship,
       h.version_no
FROM f LEFT JOIN scd2_hist h
  ON f.o_custkey = h.custkey
 AND h.valid_from <= f.ship_date
 AND (h.valid_to IS NULL OR f.ship_date < h.valid_to)
"""


registry.register("orders_scd2_priority_history", customer_priority_history, SCD2_SQL)
registry.register("orders_priority_asof_ship", priority_asof_ship, ASOF_SHIP_SQL)
