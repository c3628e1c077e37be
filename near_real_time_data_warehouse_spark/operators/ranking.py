"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy(...)`` without a partition key, which Spark executes on a
SINGLE partition (the classic 100 TB cliff: one task sorts everything).

``global_row_number`` produces exactly the same ranks as
``row_number().over(Window.orderBy(cols))`` but stays distributed:
range-repartition on the sort keys (Spark's sampled range partitioner
gives totally-ordered partitions), sort within partitions, then
``zipWithIndex`` — partition-local indices plus cumulative partition
offsets. ``scalable_ntile`` derives ntile's exact bucket assignment
(first N%k buckets one row larger) arithmetically from the global rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_by: list[Column], rank_col: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Total-order row_number over arbitrary sort expressions, distributed.

    Equivalent to ``F.row_number().over(Window.orderBy(*order_by))`` —
    include tie-break keys in ``order_by`` for determinism — but executes
    as rangepartition → local sort → zipWithIndex instead of a
    single-partition window."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = df.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)
    indexed = arranged.rdd.zipWithIndex().map(lambda t: (*t[0], t[1] + 1))
    schema = arranged.schema.add(rank_col, "long", False)
    return df.sparkSession.createDataFrame(indexed, schema)


def scalable_ntile(
    df: DataFrame,
    order_by: list[Column],
    n_buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact ntile(n) semantics without a single-partition window.

    ntile gives the first ``N % n`` buckets ``⌈N/n⌉`` rows and the rest
    ``⌊N/n⌋``; given the global rank r that assignment is closed-form."""
    ranked = global_row_number(df, order_by, rank_col="__rank")
    total = ranked.count()
    base, rem = divmod(total, n_buckets)
    big = base + 1
    split = rem * big  # ranks 1..split live in the first `rem` buckets
    r = F.col("__rank")
    if base == 0:
        bucket = r  # fewer rows than buckets: ntile assigns bucket = rank
    else:
        # integer `div` keeps the arithmetic exact at any rank magnitude
        bucket = F.when(r <= split, F.expr(f"(__rank - 1) div {big}") + 1).otherwise(
            F.lit(rem) + F.expr(f"(__rank - {split} - 1) div {base}") + 1
        )
    return ranked.withColumn(bucket_col, bucket.cast("long")).drop("__rank")
