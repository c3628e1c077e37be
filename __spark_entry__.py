"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``near_real_time_data_warehouse_spark``; this
module is only the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from near_real_time_data_warehouse_spark import driver_api
from near_real_time_data_warehouse_spark.plans import analysis
from near_real_time_data_warehouse_spark.plans.star import build_star


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full star-schema ETL (enrichment joins + derived
    time dim + money measure) feeding q01 at sf0.001."""
    star = build_star(spark, "/root/testdata/sf0.001")
    return analysis.QUERIES["q01_top5_product_daytype_revenue"].spark(star)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_api.queries()


def oracle_sql() -> dict[str, str]:
    return driver_api.oracle_sql()
