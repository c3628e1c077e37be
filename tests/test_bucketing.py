"""Bucketed co-located join: the ETL's only big-big join must plan with
zero Exchange nodes over co-bucketed tables, and produce exactly the
rows of the shuffled form."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_spark.bucketing import (
    bucketed_fact_build,
    materialize_bucketed_staging,
)
from near_real_time_data_warehouse_spark.plans.star import transactions
from near_real_time_data_warehouse_spark.sources.testdata import load_tables

from .conftest import SF_SMALL

DB = "bucketed_wh_test"


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_wh")
    materialize_bucketed_staging(spark, SF_SMALL, DB, str(loc), n_buckets=4)
    yield DB
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_db):
    """Co-bucketed scan partitioning must satisfy the join's distribution
    requirement — no shuffle anywhere in the plan."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            bucketed_fact_build(spark, bucketed_db)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_shuffled_join(spark, bucketed_db):
    t = load_tables(spark, SF_SMALL, ("lineitem", "orders"))
    expected = {tuple(r) for r in transactions(t["lineitem"], t["orders"]).collect()}
    got = {tuple(r) for r in bucketed_fact_build(spark, bucketed_db).collect()}
    assert got == expected
