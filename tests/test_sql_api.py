"""SQL-API surface: every analysis query runs as spark.sql text against
the registered star views and agrees with its DataFrame form (both compile
through Catalyst — SURVEY.md §3.2)."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_spark.oracle_harness import _rowset
from near_real_time_data_warehouse_spark.plans import analysis
from near_real_time_data_warehouse_spark.plans.star import build_star

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def star(spark):
    s = build_star(spark, SF_SMALL)
    analysis.register_views(s)
    return s


@pytest.mark.parametrize("name", sorted(analysis.QUERIES))
def test_sql_matches_dataframe(spark, star, name):
    sql = analysis.spark_sql_text(name)
    assert sql is not None
    df_api = analysis.QUERIES[name].spark(star)
    sql_api = spark.sql(sql)
    a = _rowset(list(df_api.columns), [tuple(r) for r in df_api.collect()])
    b = _rowset(list(sql_api.columns), [tuple(r) for r in sql_api.collect()])
    assert a == b, f"{name}: DataFrame and spark.sql forms diverge"


def test_store_quarterly_sales_view(spark, star):
    """The reference's CREATE VIEW (Analysis_Queries.sql:169-176) is
    queryable via SQL after registration."""
    rows = spark.sql(
        "SELECT store_name, quarter, total_revenue FROM store_quarterly_sales"
    ).collect()
    assert len(rows) == analysis.QUERIES["q20_store_quarterly_sales_view"].spark(star).count()
