"""Catalog + CBO: statistics must actually change plans.

The headline assertion: a join against a *filtered* dimension whose files
exceed the broadcast threshold plans as SortMergeJoin when the optimizer
only knows file sizes, and flips to BroadcastHashJoin — with NO hint —
once ANALYZE-recorded column stats let CBO estimate the filter's
selectivity. That flip is the entire point of maintaining statistics at
100 TB: hand-placed hints don't survive schema/workload drift; stats do.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark import catalog
from near_real_time_data_warehouse_spark.plans.star import star_tables

from .conftest import SF_SMALL


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


@pytest.fixture(scope="module")
def cbo_tables(spark):
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_test")
    spark.range(200_000).select(
        F.col("id").alias("fk"), (F.col("id") % 1000).alias("v")
    ).write.mode("overwrite").saveAsTable("cbo_test.fact")
    # Dim with a fat payload so its FILES comfortably exceed the broadcast
    # threshold the test pins below.
    spark.range(50_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
    ).write.mode("overwrite").saveAsTable("cbo_test.dim")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024))
    catalog.enable_cbo(spark)
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
    for k, v in catalog.CBO_CONFS.items():  # noqa: B007
        spark.conf.unset(k)
    spark.sql("DROP DATABASE cbo_test CASCADE")


def _filtered_join(spark):
    return spark.sql(
        """
        SELECT f.fk, f.v, d.payload
        FROM cbo_test.fact f
        JOIN (SELECT * FROM cbo_test.dim WHERE k < 100) d ON f.fk = d.k
        """
    )


def test_stats_flip_join_strategy(cbo_tables):
    spark = cbo_tables
    # Without stats the filtered dim is estimated at file size (> the
    # threshold): shuffle join.
    before = plan_of(_filtered_join(spark))
    assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before, before
    spark.sql("ANALYZE TABLE cbo_test.dim COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_test.dim COMPUTE STATISTICS FOR COLUMNS k")
    # With rowCount + min/max/ndv on k, CBO estimates ~0.2% selectivity:
    # the filtered dim now fits the threshold and broadcasts, no hint.
    after = plan_of(_filtered_join(spark))
    assert "BroadcastHashJoin" in after, after


def test_star_catalog_registers_and_analyzes(spark):
    star = star_tables(spark, SF_SMALL)
    catalog.register_star_catalog(spark, star, database="nrtdw_test")
    try:
        for name in ("customer_dim", "product_dim", "time_dim", "salefact"):
            assert spark.catalog.tableExists(f"nrtdw_test.{name}")
            stats = catalog.table_stats(spark, f"nrtdw_test.{name}")
            assert "rows" in stats.get("Statistics", ""), (name, stats)
        # catalog salefact keeps partition pruning on sale_year
        fact = spark.table("nrtdw_test.salefact")
        years = [r.sale_year for r in fact.select("sale_year").distinct().collect()]
        plan = plan_of(fact.filter(F.col("sale_year") == years[0]))
        assert "PartitionFilters" in plan and "sale_year" in plan
        # row parity with the source-of-truth star
        assert fact.count() == star["salefact"].count()
    finally:
        spark.sql("DROP DATABASE nrtdw_test CASCADE")
