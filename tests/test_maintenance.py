"""Compaction rewrites a fragmented table to the planned file count
with identical contents, and keeps clustering when asked to."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.sources import maintenance

from .conftest import SF_SMALL


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("compact") / "t")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.repartition(40).write.parquet(base)  # fragment: 40 small files

    total, n_before = maintenance.dir_stats(spark, base)
    assert n_before == 40
    target = total // 4  # plan ≈4-5 output files
    n_planned = maintenance.plan_target_files(total, target)
    written = maintenance.compact_parquet(spark, base, target_file_bytes=target)
    assert written == n_planned

    _, n_after = maintenance.dir_stats(spark, base)
    assert n_after == n_planned < n_before

    after = spark.read.parquet(base)
    assert after.count() == docs.count()
    a = docs.groupBy("doc_id").count()
    b = after.groupBy("doc_id").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_preserves_sort_clustering(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("compact_sorted") / "t")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.repartition(20).write.parquet(base)
    maintenance.compact_parquet(
        spark, base, target_file_bytes=1 << 40, sort_within_by=["doc_id"]
    )
    _, n_after = maintenance.dir_stats(spark, base)
    assert n_after == 1
    ids = [r.doc_id for r in spark.read.parquet(base).select("doc_id").collect()]
    assert ids == sorted(ids)


def test_path_exists_hadoop_probe(spark, tmp_path):
    from near_real_time_data_warehouse_spark.sources.maintenance import path_exists

    assert not path_exists(spark, str(tmp_path / "nope"))
    spark.range(3).write.parquet(str(tmp_path / "yes"))
    assert path_exists(spark, str(tmp_path / "yes"))


def test_compact_leaves_no_backup_and_correct_data(spark, tmp_path):
    """The safer swap (move-aside, move-in, drop backup) must end clean:
    data intact, no backup or staging residue."""
    import os

    from near_real_time_data_warehouse_spark.sources.maintenance import compact_parquet

    p = str(tmp_path / "t")
    spark.range(1000).repartition(20).write.parquet(p)
    compact_parquet(spark, p, target_file_bytes=1 << 30)
    assert spark.read.parquet(p).count() == 1000
    siblings = os.listdir(tmp_path)
    assert siblings == ["t"], siblings
