"""Z-order layout: Morton-code correctness and the data-skipping
property it exists for (per-bucket spans shrink in EVERY clustered
dimension, not just the leading sort key)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.operators import layout

from .conftest import SF_SMALL


def _morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_morton(spark):
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.zval
        for r in layout.with_zvalue(df, ["a", "b"]).collect()
    }
    # max(a)=max(b)=65535 → scaling is identity; zval is the pure Morton code
    for a, b in rows:
        assert got[(a, b)] == _morton(a, b), (a, b)


def test_zorder_buckets_bound_both_dimensions(spark):
    """The skipping measure: with 256 fixed-width code buckets, each
    bucket's span in BOTH keys is a small fraction of the full range —
    while a single-key sort leaves the other key's span at ~100%."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    ranges = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("part_range"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("supp_range"),
    ).first()

    stats = layout.zorder_stats(spark, SF_SMALL)
    spans = stats.agg(
        F.avg(F.col("part_hi") - F.col("part_lo")).alias("part_span"),
        F.avg(F.col("supp_hi") - F.col("supp_lo")).alias("supp_span"),
    ).first()
    # 256 buckets = 4 bits per dimension → ideal span 1/16 ≈ 6%; allow
    # slack for scaling quantization and sparse buckets.
    assert spans.part_span / ranges.part_range < 0.3
    assert spans.supp_span / ranges.supp_range < 0.3

    # Contrast: bucket by partkey alone (the single-key layout) and the
    # suppkey span stays essentially the whole range.
    single = (
        li.withColumn("bucket", F.ntile(256).over(Window.orderBy("l_partkey")))
        .groupBy("bucket")
        .agg((F.max("l_suppkey") - F.min("l_suppkey")).alias("supp_span"))
        .agg(F.avg("supp_span").alias("avg_span"))
        .first()
    )
    assert single.avg_span / ranges.supp_range > 0.7


def test_zorder_layout_preserves_rows(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    out = layout.zorder_layout(li, ["l_partkey", "l_suppkey"], partitions=8)
    assert out.count() == li.count()
    assert out.filter(F.col("zval").isNull()).count() == 0
    # layout only reorders: the multiset of key pairs is unchanged
    a = li.groupBy("l_partkey", "l_suppkey").count()
    b = out.groupBy("l_partkey", "l_suppkey").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
