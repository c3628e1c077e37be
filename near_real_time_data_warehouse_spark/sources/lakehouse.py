"""ACID MERGE upsert surface (Delta / Iceberg), probe-gated.

The reference's dimension loads are ``INSERT … ON DUPLICATE KEY UPDATE
<key>=<key>`` — an insert-if-absent no-op on conflict
(/root/reference/hybrid_join.py:365-378). The lakehouse-native form is

    MERGE INTO dim USING batch ON dim.key = batch.key
    WHEN NOT MATCHED THEN INSERT *

which adds per-batch atomicity (no torn upserts visible to readers) and
serialized conflict handling. This runtime ships neither delta-spark nor
iceberg-spark jars (``connectors.available_formats`` probes), so
``merge_upsert_dim`` runs MERGE when a capable table format backs the
target and otherwise falls back to the exact-same-end-state left-anti
append the batch ETL uses (etl._upsert_dim). The fallback's replay
idempotence is covered by tests/test_etl.py; MERGE-path equivalence is
asserted whenever the jars are present (tests/test_lakehouse.py skips
otherwise and COVERAGE.md records the gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .connectors import available_formats


def merge_capable(spark: SparkSession) -> str | None:
    """The available MERGE-capable format, if any."""
    fmts = available_formats(spark)
    for fmt in ("delta", "iceberg"):
        if fmts.get(fmt):
            return fmt
    return None


def merge_upsert_dim(
    spark: SparkSession,
    new_rows: DataFrame,
    key: str,
    table: str,
) -> str:
    """First-writer-wins dimension upsert into a catalog table; returns
    the mechanism used ('merge' or 'left_anti').

    ``table`` must exist in the session catalog. With a MERGE-capable
    format the upsert is one ACID statement; the fallback reproduces the
    same end state (append rows whose key is absent, batch-deduplicated)
    with parquet-append atomicity only."""
    batch = new_rows.dropDuplicates([key])
    if not spark.catalog.tableExists(table):
        batch.write.saveAsTable(table)
        return "create"
    if merge_capable(spark):
        batch.createOrReplaceTempView("__merge_batch")
        try:
            spark.sql(
                f"""
                MERGE INTO {table} t
                USING __merge_batch b ON t.{key} = b.{key}
                WHEN NOT MATCHED THEN INSERT *
                """
            )
        finally:
            spark.catalog.dropTempView("__merge_batch")
        return "merge"
    existing = spark.table(table).select(key)
    batch.join(existing, key, "left_anti").write.mode("append").insertInto(table)
    return "left_anti"
