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


@pytest.fixture(scope="module")
def snowflake_tables(spark):
    """7-table snowflake: fact → store → region, fact → prod → cat,
    fact → cust → seg, with cardinalities spanning 5 orders of magnitude."""
    spark.sql("CREATE DATABASE IF NOT EXISTS sn_test")
    spark.range(200_000).select(
        F.col("id").alias("sale_id"),
        (F.col("id") % 5_000).alias("store_id"),
        (F.col("id") % 20_000).alias("prod_id"),
        (F.col("id") % 50_000).alias("cust_id"),
        (F.col("id") % 97).alias("amt"),
    ).write.mode("overwrite").saveAsTable("sn_test.fact")
    dims = {
        "store": (5_000, "store_id", "region_id", 50),
        "prod": (20_000, "prod_id", "cat_id", 200),
        "cust": (50_000, "cust_id", "seg_id", 10),
    }
    for name, (n, pk, fk, nleaf) in dims.items():
        spark.range(n).select(
            F.col("id").alias(pk),
            (F.col("id") % nleaf).alias(fk),
            F.concat(F.lit("x" * 32), F.col("id").cast("string")).alias(f"{name}_pay"),
        ).write.mode("overwrite").saveAsTable(f"sn_test.{name}")
    for name, (n, pk) in {"region": (50, "region_id"), "cat": (200, "cat_id"),
                          "seg": (10, "seg_id")}.items():
        spark.range(n).select(
            F.col("id").alias(pk), F.col("id").cast("string").alias(f"{name}_name")
        ).write.mode("overwrite").saveAsTable(f"sn_test.{name}")
    catalog.enable_cbo(spark)
    yield spark
    for k in catalog.CBO_CONFS:
        spark.conf.unset(k)
    spark.sql("DROP DATABASE sn_test CASCADE")


_SNOWFLAKE_Q = """
SELECT r.region_name, c.cat_name, s2.seg_name, SUM(f.amt) AS total
FROM sn_test.cust cu
JOIN sn_test.fact f ON f.cust_id = cu.cust_id
JOIN sn_test.store st ON f.store_id = st.store_id
JOIN sn_test.prod p ON f.prod_id = p.prod_id AND p.cat_id < 4
JOIN sn_test.region r ON st.region_id = r.region_id
JOIN sn_test.cat c ON p.cat_id = c.cat_id
JOIN sn_test.seg s2 ON cu.seg_id = s2.seg_id
GROUP BY r.region_name, c.cat_name, s2.seg_name
"""


def _join_leaf_order(spark) -> list[str]:
    import re

    plan = spark.sql(_SNOWFLAKE_Q)._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    return re.findall(r"sn_test\.(\w+)", plan)


def test_stats_reorder_snowflake_join(snowflake_tables):
    """Join-ORDER stress: a 7-table snowflake written in a deliberately bad
    lexical order — every leaf join (region/cat/seg) trails AFTER all the
    fact-side joins, so each leg's intermediate carries the fat dim payload
    through the fact join. Without stats Catalyst keeps query order; with
    ANALYZE stats, CBO's joinReorder collapses each snowflake leg
    (dim ⋈ its leaf) before the expensive fact joins — the reorder depth
    no 2-table broadcast-flip test exercises. The exact leg sequence CBO
    picks varies with session confs, so the assertion is the structural
    property (legs collapsed), not one specific order."""
    spark = snowflake_tables
    before = _join_leaf_order(spark)
    # No stats → no reorder: leaves appear in query order, worst-first.
    assert before[:2] == ["cust", "fact"], before
    legs = [("store", "region"), ("prod", "cat"), ("cust", "seg")]
    adjacent_before = sum(
        abs(before.index(d) - before.index(leaf)) == 1 for d, leaf in legs
    )
    assert adjacent_before == 0, before  # query order interleaves every leg
    stat_cols = {
        "fact": "store_id,prod_id,cust_id", "store": "store_id,region_id",
        "prod": "prod_id,cat_id", "cust": "cust_id,seg_id",
        "region": "region_id", "cat": "cat_id", "seg": "seg_id",
    }
    for t, cols in stat_cols.items():
        spark.sql(f"ANALYZE TABLE sn_test.{t} COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE sn_test.{t} COMPUTE STATISTICS FOR COLUMNS {cols}")
    after = _join_leaf_order(spark)
    assert after != before, after
    adjacent_after = sum(
        abs(after.index(d) - after.index(leaf)) == 1 for d, leaf in legs
    )
    assert adjacent_after >= 2, after  # stats collapsed the snowflake legs


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
