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


# Driver-evaluation window policy (VERDICT r7 "what\'s wrong" #2): the
# driver evaluates the FIRST 50 registered entries each round, and union
# coverage across rounds is the instrument.  Ordering is two rules:
#   (1) entries with NO green driver row in any recorded round — brand
#       new this round, never-green, or prior fails — run first, in
#       stable registration order;
#   (2) the re-certification tail follows sorted by LAST_GREEN ascending
#       (least-recently-certified first; ties in stable registration
#       order), so every entry cycles back through the oracle gate every
#       ceil(161/50) ≈ 4 rounds instead of 111 entries riding forever on
#       round-1..3 rows while the code under them evolves.
# LAST_GREEN lives in certification.py, regenerated each round from the
# recorded CORRECTNESS_r*.json files by scripts/update_last_green.py.


def queries() -> dict[str, QueryFn]:
    unordered: dict[str, QueryFn] = {}
    for name, q in analysis.QUERIES.items():
        unordered[name] = _star_query(q)
    from .operators import registry as op_registry

    unordered.update(op_registry.queries())

    from .certification import LAST_GREEN

    reg_pos = {name: i for i, name in enumerate(unordered)}
    never_green = [n for n in unordered if n not in LAST_GREEN]
    tail = sorted(
        (n for n in unordered if n in LAST_GREEN),
        key=lambda n: (LAST_GREEN[n], reg_pos[n]),
    )
    return {n: unordered[n] for n in never_green + tail}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, q in analysis.QUERIES.items():
        if q.oracle is not None:
            out[name] = with_star(q.oracle)
    from .operators import registry as op_registry

    out.update(op_registry.oracle_sql())
    return out
