"""Connector surface tests: format round-trips, partitioned writes,
optional-format probing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from near_real_time_data_warehouse_spark.sources import connectors

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(i, "ab"[i % 2], i / 10.0) for i in range(100)], SCHEMA
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_round_trip(spark, sample, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp(f"rt_{fmt}") / "data")
    connectors.write_table(sample, path, fmt=fmt, mode="overwrite")
    back = connectors.read_any(spark, path, fmt, schema=SCHEMA)
    assert back.count() == 100
    assert {r.id for r in back.select("id").collect()} == set(range(100))


def test_partitioned_write_prunes(spark, sample, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "data")
    connectors.write_table(sample, path, mode="overwrite", partition_by=("grp",))
    back = connectors.read_any(spark, path, "parquet", schema=None)
    pruned = back.filter(F.col("grp") == "a")
    plan = pruned._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert pruned.count() == 50
    # partition filter must reach the scan, not a post-filter
    assert "PartitionFilters: [isnotnull(grp" in plan


def test_streaming_requires_schema(spark, tmp_path_factory):
    with pytest.raises(ValueError, match="explicit schema"):
        connectors.read_any(spark, "/tmp/x", "csv", streaming=True)


def test_available_formats(spark):
    fmts = connectors.available_formats(spark)
    assert fmts["parquet"] and fmts["csv"]
    assert isinstance(fmts.get("delta"), bool)
