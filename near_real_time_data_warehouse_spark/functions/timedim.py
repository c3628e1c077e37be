"""Time-dimension derivation expressions (reference P8 surface).

The reference derives all time attributes at load time
(/root/reference/hybrid_join.py:429-444): English day/month names,
quarter, a month-based season bucket, and the year. The auto-increment
``date_id`` surrogate (starSchema.sql:26) is redesigned as the
deterministic injective mapping ``yyyy*10000 + mm*100 + dd`` — safe
because no reference query ever exposes date_id values, only joins on
them (SURVEY.md §1.2).

All expressions are Catalyst built-ins: they stay inside whole-stage
codegen and cost nothing at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_id(d: Column) -> Column:
    """Deterministic surrogate key: 20001231 for 2000-12-31."""
    return (F.year(d).cast("long") * 10000 + F.month(d) * 100 + F.dayofmonth(d)).alias("date_id")


def day_of_week(d: Column) -> Column:
    """Full English day name, e.g. 'Sunday' (ref hybrid_join.py:430 strftime('%A'))."""
    return F.date_format(d, "EEEE")


def month_name(d: Column) -> Column:
    """Full English month name, e.g. 'January' (ref hybrid_join.py:431 strftime('%B'))."""
    return F.date_format(d, "MMMM")


def season(d: Column) -> Column:
    """Month-bucket season (ref hybrid_join.py:434-443): Winter(12,1,2),
    Spring(3,4,5), Summer(6,7,8), Autumn otherwise."""
    m = F.month(d)
    return (
        F.when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Autumn")
    )


def time_attributes(d: Column) -> dict[str, Column]:
    """All derived time-dim columns for a date column (ref starSchema.sql:25-33)."""
    return {
        "date_id": date_id(d),
        "full_date": d.cast("date"),
        "day_of_week": day_of_week(d),
        "month": month_name(d),
        "quarter": F.quarter(d).cast("long"),
        "season": season(d),
        "year": F.year(d).cast("long"),
    }


# DuckDB-oracle equivalents of the same derivations, used to assemble
# differential-test SQL. Kept adjacent so the two dialects never drift.
DUCKDB_TIME_ATTRS_SQL = """
    CAST(year({d}) * 10000 + month({d}) * 100 + day({d}) AS BIGINT) AS date_id,
    CAST({d} AS DATE) AS full_date,
    dayname({d}) AS day_of_week,
    monthname({d}) AS month,
    CAST(quarter({d}) AS BIGINT) AS quarter,
    CASE WHEN month({d}) IN (12, 1, 2) THEN 'Winter'
         WHEN month({d}) IN (3, 4, 5) THEN 'Spring'
         WHEN month({d}) IN (6, 7, 8) THEN 'Summer'
         ELSE 'Autumn' END AS season,
    CAST(year({d}) AS BIGINT) AS year
"""
