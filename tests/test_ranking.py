"""Distributed ranking equals the single-partition window semantics."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.operators.ranking import (
    global_row_number,
    scalable_ntile,
)


def _sample(spark, n=997):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 1000).alias("v"),  # many ties
    )


def test_global_row_number_matches_window(spark):
    df = _sample(spark)
    order = [F.desc("v"), F.col("id")]
    got = {
        (r.id, r.rn)
        for r in global_row_number(df, order, num_partitions=8).collect()
    }
    want = {
        (r.id, r.rn)
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_scalable_ntile_matches_window(spark):
    df = _sample(spark, n=1003)  # 1003 % 10 != 0 → uneven buckets
    order = [F.desc("v"), F.col("id")]
    got = {
        (r.id, r.bucket)
        for r in scalable_ntile(df, order, 10).collect()
    }
    want = {
        (r.id, r.bucket)
        for r in df.withColumn(
            "bucket", F.ntile(10).over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


def test_ntile_fewer_rows_than_buckets(spark):
    df = _sample(spark, n=4)
    got = sorted(
        (r.id, r.bucket) for r in scalable_ntile(df, [F.col("id")], 10).collect()
    )
    assert [b for _, b in got] == [1, 2, 3, 4]


def test_distributed_plan_has_no_single_partition_window(spark):
    df = _sample(spark)
    ranked = global_row_number(df, [F.desc("v"), F.col("id")], num_partitions=8)
    plan = ranked._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Window" not in plan
