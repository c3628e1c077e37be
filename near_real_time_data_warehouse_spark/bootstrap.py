"""Schema bootstrap (SURVEY.md §3.3; reference: `mysql < starSchema.sql`).

The reference requires hand-running MySQL DDL with interactive credentials
(README.md:16, hybrid_join.py:11-21). Here bootstrap is idempotent and
credential-free: star tables register as (empty) temp views with their
declared StructTypes, and the equivalent Spark-SQL DDL text is generated
from the same schemas (one source of truth — the DDL can be executed
against a real metastore with ``spark.sql`` unchanged).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from . import schemas

STAR_SCHEMAS: dict[str, T.StructType] = {
    "customer_dim": schemas.CUSTOMER_DIM_SCHEMA,
    "product_dim": schemas.PRODUCT_DIM_SCHEMA,
    "time_dim": schemas.TIME_DIM_SCHEMA,
    "salefact": schemas.SALE_FACT_SCHEMA,
}


def ddl(location_root: str | None = None) -> dict[str, str]:
    """CREATE TABLE statements for the star schema (starSchema.sql:5-46
    re-expressed; FK/auto-increment constraints are ETL-enforced instead —
    Spark doesn't enforce them and the enrichment join guarantees them)."""
    out = {}
    for name, schema in STAR_SCHEMAS.items():
        cols = ",\n  ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields)
        loc = f"\nLOCATION '{location_root}/{name}'" if location_root else ""
        out[name] = f"CREATE TABLE IF NOT EXISTS {name} (\n  {cols}\n) USING parquet{loc}"
    return out


def bootstrap(spark: SparkSession) -> None:
    """Register empty star tables as temp views (idempotent; no metastore
    side effects). The ETL's writers later replace them with real data."""
    for name, schema in STAR_SCHEMAS.items():
        spark.createDataFrame([], schema).createOrReplaceTempView(name)
