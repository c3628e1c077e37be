"""Bucketed (co-located) warehouse layout — the shuffle-elimination path
for the ETL's one big-big join.

``plans/star.transactions`` joins lineitem ⋈ orders on the shared order
key; at 100 TB that shuffle IS the ETL's cost. Hive-style bucketing
removes it: write both tables bucketed (and sorted) on the join key with
the same bucket count, and Spark's bucketed scan reports a compatible
``HashPartitioning`` output, so the SortMergeJoin plans with ZERO
Exchange nodes — each task merge-joins bucket i of both tables in place.
``tests/test_bucketing.py`` asserts exactly that on the physical plan and
that results are identical to the shuffled join.

The same layout serves repeated fact⋈fact / fact⋈snapshot queries:
bucket the warehouse's largest tables on their dominant join key once at
load time, and every downstream join on that key is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_bucketed_db(spark: SparkSession, name: str, location: str) -> None:
    """Register a database whose tables live under ``location``."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table bucketed (optionally sorted) on
    ``bucket_key``. Sorting inside buckets lets the merge join skip its
    sort when the reader preserves order."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table)


def bucketed_fact_build(spark: SparkSession, db: str) -> DataFrame:
    """The ETL's lineitem ⋈ orders join over co-bucketed tables — the
    shuffle-free form of ``plans/star.transactions``."""
    from pyspark.sql import functions as F

    li = spark.table(f"{db}.lineitem_bucketed")
    orders = spark.table(f"{db}.orders_bucketed")
    return li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_linenumber").cast("long").alias("line_number"),
        F.col("o_orderdate").cast("date").alias("sale_date"),
        F.col("l_quantity").cast("long").alias("quantity"),
    )


def materialize_bucketed_staging(
    spark: SparkSession, sf_dir: str, db: str, location: str, n_buckets: int = 8
) -> None:
    """One-time load: stage lineitem and orders co-bucketed on the order
    key. At cluster scale this replaces the per-run shuffle with a
    write-once layout cost."""
    from .sources.testdata import load_tables

    create_bucketed_db(spark, db, location)
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    write_bucketed(t["lineitem"], f"{db}.lineitem_bucketed", "l_orderkey", n_buckets)
    write_bucketed(t["orders"], f"{db}.orders_bucketed", "o_orderkey", n_buckets)
