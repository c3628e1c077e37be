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


def _surviving_rows(path: str, box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(total_rows, rows_in_row_groups_surviving_the_conjunctive_box):
    a row group survives only if its [min,max] intersects EVERY key's
    interval — exactly parquet footer-stats pruning for an AND predicate."""
    import glob

    import pyarrow.parquet as pq

    total = surviving = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {c: md.schema.names.index(c) for c in box}
        for rg in range(md.num_row_groups):
            meta = md.row_group(rg)
            total += meta.num_rows
            hit = all(
                not (meta.column(idx[c]).statistics.max < lo
                     or meta.column(idx[c]).statistics.min > hi)
                for c, (lo, hi) in box.items()
            )
            if hit:
                surviving += meta.num_rows
    return total, surviving


def test_zorder_2d_box_scan_reduction_factor(spark, tmp_path_factory):
    """The 2-D payoff as one measured number: for a conjunctive box
    predicate on both clustered keys, the z-ordered layout's footer
    stats must cut the scanned rows by at least 4x (it prunes along
    BOTH dimensions), beat the single-key layout's factor, and the
    filtered read over the written files must return exactly the rows
    the predicate selects from the original table."""
    base = tmp_path_factory.mktemp("zorder_box")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select("l_partkey", "l_suppkey")
    zdir, sdir = str(base / "zorder"), str(base / "sorted")
    # 64 files ≈ 3 top Morton bits per dimension; suppkey's tiny domain
    # (10 values at sf0.001) coarsens its quantization, so finer files
    # are what make the 2-D box measurably selective here.
    layout.zorder_layout(li, ["l_partkey", "l_suppkey"], partitions=64).write.parquet(zdir)
    li.repartitionByRange(64, "l_partkey").sortWithinPartitions("l_partkey").write.parquet(sdir)

    r = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()

    def slice10(lo, hi):
        mid, w = (lo + hi) // 2, max(1, (hi - lo) // 20)
        return mid - w, mid + w

    box = {
        "l_partkey": slice10(r[0], r[1]),
        "l_suppkey": slice10(r[2], r[3]),
    }
    z_total, z_rows = _surviving_rows(zdir, box)
    s_total, s_rows = _surviving_rows(sdir, box)
    assert z_total == s_total
    z_factor = z_total / max(z_rows, 1)
    # measured scan-reduction: the claim "this layout skips" as a number
    assert z_factor >= 4.0

    # the z-order advantage in factor form: a predicate on the NON-sort
    # key alone — the single-key layout cannot prune it at all (factor
    # ≈ 1), the z-ordered layout still cuts the scan severalfold
    supp_only = {"l_suppkey": box["l_suppkey"]}
    _, z_supp = _surviving_rows(zdir, supp_only)
    _, s_supp = _surviving_rows(sdir, supp_only)
    z_supp_factor = z_total / max(z_supp, 1)
    s_supp_factor = s_total / max(s_supp, 1)
    assert z_supp_factor >= 2.0
    assert s_supp_factor < 1.3
    assert z_supp_factor > s_supp_factor

    # and the skipped scan is still correct: filtered read over the
    # layout == filtering the original table
    pred = (
        (F.col("l_partkey").between(*box["l_partkey"]))
        & (F.col("l_suppkey").between(*box["l_suppkey"]))
    )
    got = (
        spark.read.parquet(zdir).filter(pred)
        .groupBy("l_partkey", "l_suppkey").count()
    )
    want = li.filter(pred).groupBy("l_partkey", "l_suppkey").count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_hilbert_index_matches_reference(spark):
    """The 16-level unrolled Hilbert expressions equal the classic xy2d
    algorithm for random grid coordinates, and consecutive indices map to
    ADJACENT cells (the locality property Morton lacks)."""
    import random

    from near_real_time_data_warehouse_spark.operators.layout import (
        H_BITS,
        with_hilbert,
    )

    def xy2d(order, x, y):
        d = 0
        s = order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    n = 1 << H_BITS
    # adjacency of the reference walk on a small grid
    order = 1 << 4
    cells = {}
    for x in range(order):
        for y in range(order):
            cells[xy2d(order, x, y)] = (x, y)
    for d in range(order * order - 1):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d

    # Spark == reference on the full-resolution grid. Feed coordinates
    # as keys with max == n-1 so the scaling is the identity.
    rng = random.Random(99)
    pts = [(rng.randrange(n), rng.randrange(n)) for _ in range(500)]
    pts += [(0, 0), (n - 1, n - 1), (0, n - 1), (n - 1, 0)]
    df = spark.createDataFrame(pts, "kx long, ky long")
    got = {
        (r.kx, r.ky): r.hval
        for r in with_hilbert(df, ["kx", "ky"]).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == xy2d(n, x, y), (x, y)
