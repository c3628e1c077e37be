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


# DuckDB widens integer SUMs to HUGEINT (int128); pandas/arrow fetch paths
# then coerce the column to float64/decimal128, so the driver's value hash
# diverges from Spark's int64 even when every number is equal (the round-1
# dedup_simhash failure — fetchall() gives Python ints and hides it). Any
# oracle output column must therefore be an explicitly-cast concrete type.
_UNPORTABLE = {"HUGEINT", "UHUGEINT"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_no_hugeint_oracle_outputs(con, name):
    schema = con.execute("DESCRIBE " + ORACLES[name]).fetchall()
    bad = [(c, t) for c, t, *_ in schema if t.upper() in _UNPORTABLE]
    assert not bad, f"{name}: oracle outputs unportable types {bad}; add CAST"
