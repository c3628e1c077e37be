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


def _rowgroup_prunable_fraction(path: str, col: str, lo: int, hi: int) -> float:
    """Fraction of parquet row groups whose [min,max] footer stats miss
    [lo, hi] — exactly the pruning a scan's predicate pushdown gets."""
    import glob

    import pyarrow.parquet as pq

    total = pruned = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st.max < lo or st.min > hi:
                pruned += 1
    assert total > 0
    return pruned / total


def test_zorder_layout_end_to_end_rowgroup_skipping(spark, tmp_path_factory):
    """The measured payoff: after writing the z-ordered layout, a
    selective predicate on EITHER clustered key prunes most row groups
    from the footer stats alone, where the single-key-sorted layout
    prunes only its own sort key."""
    base = tmp_path_factory.mktemp("zorder_files")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select("l_partkey", "l_suppkey")
    zdir, sdir = str(base / "zorder"), str(base / "sorted")
    layout.zorder_layout(li, ["l_partkey", "l_suppkey"], partitions=16).write.parquet(zdir)
    li.repartitionByRange(16, "l_partkey").sortWithinPartitions("l_partkey").write.parquet(sdir)

    r = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    # a mid-range ~10% slice of each dimension
    def slice10(lo, hi):
        mid, w = (lo + hi) // 2, max(1, (hi - lo) // 20)
        return mid - w, mid + w

    p_lo, p_hi = slice10(r[0], r[1])
    s_lo, s_hi = slice10(r[2], r[3])

    z_part = _rowgroup_prunable_fraction(zdir, "l_partkey", p_lo, p_hi)
    z_supp = _rowgroup_prunable_fraction(zdir, "l_suppkey", s_lo, s_hi)
    s_part = _rowgroup_prunable_fraction(sdir, "l_partkey", p_lo, p_hi)
    s_supp = _rowgroup_prunable_fraction(sdir, "l_suppkey", s_lo, s_hi)

    # single-key layout: excellent on its key, useless on the other
    assert s_part > 0.8
    assert s_supp < 0.2
    # z-order: real pruning on BOTH keys (16 files ≈ 2 top bits per
    # dimension, so each key's prunable fraction is bounded by quarters
    # — and suppkey's tiny domain (10 values) coarsens its quantization)
    assert z_part > 0.25 and z_supp > 0.35
    assert min(z_part, z_supp) > min(s_part, s_supp) + 0.2


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
