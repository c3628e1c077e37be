"""Salting utilities: skewed workloads produce identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_join,
)


def _skewed(spark, n=20_000):
    # ~70% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 7, "HOT").otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    got = {
        (r.k, r.s, r.c)
        for r in salted_aggregate(
            df,
            ["k"],
            aggs=lambda: [F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
            merge=lambda: [F.sum("s").alias("s"), F.sum("c").alias("c")],
        ).collect()
    }
    want = {
        (r.k, r.s, r.c)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", 1.5)] + [(f"k{i}", i / 10.0) for i in range(97)], ["k", "w"]
    )
    got = salted_broadcast_join(big, small, "k")
    want = big.join(F.broadcast(small), "k", "inner")
    assert got.count() == want.count()
    gs = got.groupBy("k").agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
    ws = want.groupBy("k").agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
    assert {tuple(r) for r in gs.collect()} == {tuple(r) for r in ws.collect()}
