"""Metastore catalog + cost-based-optimizer surface.

The reference's warehouse lives in MySQL with a real catalog
(starSchema.sql DDL; /root/reference/hybrid_join.py:356-395 assumes the
tables exist and the engine knows them). The Spark-native equivalent is
the session metastore: ``save_star_as_tables`` persists the star into it
and ``analyze_star`` records table- and column-level statistics
(``ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS …]``).

Why this matters at 100 TB: without statistics, join strategy and join
ORDER rest on raw file sizes and hand-placed broadcast hints — a filtered
dimension still "looks" as big as its files, so Catalyst shuffles when it
could broadcast. With rowCount + ndv/min/max stats and
``spark.sql.cbo.enabled``, filter selectivity shrinks the estimate and
the planner picks broadcast joins and better join orders on its own
(asserted in tests/test_catalog.py by a hint-free plan flip from
SortMergeJoin to BroadcastHashJoin after ANALYZE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Join/filter columns worth column-level stats (ndv/min/max drive
# selectivity and join-cardinality estimation; non-key attributes only
# add ANALYZE cost).
_STAR_STAT_COLUMNS: dict[str, tuple[str, ...]] = {
    "customer_dim": ("customer_id", "age", "city_category", "occupation"),
    "product_dim": ("product_id", "store_id", "supplier_id", "product_category"),
    "time_dim": ("date_id", "year", "quarter", "season"),
    "salefact": ("customer_id", "product_id", "date_id", "sale_year"),
}

CBO_CONFS: dict[str, str] = {
    # Cost-based join strategy + stats-driven join reordering. Runtime
    # SQL confs — safe to flip per session.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    "spark.sql.statistics.histogram.enabled": "true",
}


def enable_cbo(spark: SparkSession) -> None:
    for k, v in CBO_CONFS.items():
        spark.conf.set(k, v)


def save_star_as_tables(
    spark: SparkSession,
    star: dict[str, DataFrame],
    database: str = "nrtdw",
    mode: str = "overwrite",
) -> None:
    """Persist the star into the metastore as managed parquet tables.

    The fact keeps its year partitioning (partition pruning keeps working
    through the catalog); dims are small unpartitioned tables."""
    from pyspark.sql import functions as F

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, df in star.items():
        if name == "salefact" and "sale_year" not in df.columns and "date_id" in df.columns:
            # Same physical unit the warehouse loader uses (etl.py):
            # date_id is yyyymmdd, so yyyy = date_id div 10000.
            df = df.withColumn("sale_year", (F.col("date_id") / 10000).cast("int"))
        writer = df.write.mode(mode).format("parquet")
        if name == "salefact" and "sale_year" in df.columns:
            writer = writer.partitionBy("sale_year")
        writer.saveAsTable(f"{database}.{name}")


def analyze_star(spark: SparkSession, database: str = "nrtdw") -> None:
    """Record table + column statistics for every star table."""
    for name, cols in _STAR_STAT_COLUMNS.items():
        if not spark.catalog.tableExists(f"{database}.{name}"):
            continue
        spark.sql(f"ANALYZE TABLE {database}.{name} COMPUTE STATISTICS")
        spark.sql(
            f"ANALYZE TABLE {database}.{name} COMPUTE STATISTICS "
            f"FOR COLUMNS {', '.join(cols)}"
        )


def table_stats(spark: SparkSession, table: str) -> dict[str, str]:
    """The recorded statistics line (rowCount, sizeInBytes) for a table."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return {
        r.col_name: r.data_type
        for r in rows
        if r.col_name in ("Statistics", "Provider", "Location")
    }


def register_star_catalog(
    spark: SparkSession, star: dict[str, DataFrame], database: str = "nrtdw"
) -> None:
    """One-call catalog bootstrap: save, analyze, enable CBO."""
    save_star_as_tables(spark, star, database)
    analyze_star(spark, database)
    enable_cbo(spark)
