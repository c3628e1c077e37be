"""Differential tests: every analysis query vs its DuckDB oracle (sf0.001).

This mirrors the driver's correctness gate (row-count + columns +
order-insensitive values, floats bit-exact)."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_spark import driver_api
from near_real_time_data_warehouse_spark.oracle_harness import compare, duckdb_connection

from .conftest import SF_SMALL

QUERIES = driver_api.queries()
ORACLES = driver_api.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_matches_oracle(spark, con, name):
    res = compare(name, QUERIES[name](spark, SF_SMALL), con, ORACLES[name])
    assert res.ok, str(res)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    # No oracle (non-SQL-expressible op) — weaker check: runs and yields rows.
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
