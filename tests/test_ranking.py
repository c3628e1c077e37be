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


def test_ntile_properties_random():
    """Property check (hypothesis): for random (n, k, partitions), the
    distributed ntile matches the closed-form ntile spec — bucket sizes
    differ by at most 1, larger buckets first, ranks stay contiguous."""
    from hypothesis import given, settings, strategies as st

    from near_real_time_data_warehouse_spark.session import get_spark

    spark = get_spark("nrtdw_tests", shuffle_partitions=8)

    @settings(max_examples=8, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=400),
        k=st.integers(min_value=1, max_value=17),
        parts=st.integers(min_value=1, max_value=9),
    )
    def check(n: int, k: int, parts: int):
        df = spark.range(n).select(
            F.col("id"), (F.col("id") * 48271 % 97).alias("v")
        )
        order = [F.desc("v"), F.col("id")]
        ranked = global_row_number(df, order, num_partitions=parts)
        buckets = scalable_ntile(df, order, k)
        rns = sorted(r.rn for r in ranked.collect())
        assert rns == list(range(1, n + 1))
        sizes = {}
        for r in buckets.collect():
            sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
        counts = [sizes.get(b, 0) for b in sorted(sizes)]
        assert sum(counts) == n
        assert max(counts) - min(counts) <= 1
        assert counts == sorted(counts, reverse=True)
        assert len(sizes) == min(n, k)

    check()


def test_scalable_topk_per_group_matches_window(spark):
    """The salted two-phase top-k must equal the naive
    partitionBy(group) window for any group-size mix, including groups
    smaller than k and a group far larger than the salt fanout."""
    from pyspark.sql import Window

    from near_real_time_data_warehouse_spark.operators.ranking import (
        scalable_topk_per_group,
    )

    rows = []
    for g, n in [(0, 3), (1, 500), (2, 1), (3, 64)]:
        rows += [(g, i, (i * 48271 + g) % 101) for i in range(n)]
    df = spark.createDataFrame(rows, "g int, id int, v int").repartition(7)
    order = [F.desc("v"), F.asc("id")]
    got = {
        (r.g, r.rank, r.id)
        for r in scalable_topk_per_group(
            df, ["g"], order, 10, salt_on="id"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r.g, r.rank, r.id)
        for r in df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .collect()
    }
    assert got == want
