"""Readers for the driver-generated synthetic parquet tables.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def load_table_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table and spread it across the cluster's cores.

    The test fixtures are single-file, single-row-group parquet, which
    Spark cannot split (``maxPartitionBytes`` ranges never split a row
    group) — so a scan-heavy operator inherits ONE partition and runs
    serially. For CPU-dense derivations (shingling, hashing, vector
    scoring) an explicit round-robin repartition buys full parallelism for
    the price of shuffling a small table. On real multi-file datasets the
    scan is already split and this repartition is a no-op to skip."""
    df = load_table(spark, sf_dir, name)
    want = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        df = df.repartition(want)
    return df
