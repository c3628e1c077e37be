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


def test_aqe_splits_skewed_join_partitions(spark):
    """The implicit half of the skew story: for plain shuffle joins the
    engine's own mitigation (AQE skew-join) must engage — salting is only
    for the shapes AQE can't fix (aggregations, broadcast-averse joins).
    Asserts the executed adaptive plan actually marked the join skewed
    (`skew=true`), not just that the feature flag is on."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 8, F.lit(0)).otherwise(F.col("id") % 500).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(500).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("name")
        )
        joined = big.join(dim, "k")
        # Action the SAME DataFrame (a write spawns its own execution and
        # this df's adaptive plan would stay isFinalPlan=false).
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
