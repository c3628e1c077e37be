"""Assembles the driver contract: queries() and oracle_sql().

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
with an ANSI-SQL oracle DuckDB runs on the same parquet tables. Oracles for
the analysis library embed the full star-schema ETL as CTEs
(plans/star.STAR_CTE_SQL), so a hash match certifies ETL + query together.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import analysis
from .plans.star import star_tables, with_star

QueryFn = Callable[[SparkSession, str], DataFrame]


def _star_query(q: analysis.AnalysisQuery) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return q.spark(star_tables(spark, sf_dir))

    run.__name__ = q.name
    run.__doc__ = q.description
    return run


def queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for name, q in analysis.QUERIES.items():
        out[name] = _star_query(q)
    from .operators import registry as op_registry

    out.update(op_registry.queries())
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, q in analysis.QUERIES.items():
        if q.oracle is not None:
            out[name] = with_star(q.oracle)
    from .operators import registry as op_registry

    out.update(op_registry.oracle_sql())
    return out
