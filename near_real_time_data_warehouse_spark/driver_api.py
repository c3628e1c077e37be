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


# Driver-evaluation window policy (two rules, per VERDICT r3 item 3 /
# NEXT.md): the driver evaluates the FIRST 50 registered entries each
# round, and union coverage across rounds (COVERAGE.md ledger) is the
# instrument — after round 3, every oracled entry EXCEPT the two listed
# below has a green driver row in some recorded round. So ordering needs
# only: (1) entries with no green driver row yet — entries new this
# round, plus any prior fails — run first; (2) everything else follows
# in stable registration order (analysis q01..q20, then operator
# registry in module registration order), where any 50-entry prefix is
# pure re-certification of already-green rows.
_NEEDS_FIRST_ROW = [
    # Round-7 additions (first driver rows): exact integer-state k-means
    # domain clustering — the semantic-bucketing step of a data-mixing
    # pipeline. Three views over one trained state: per-vector domain
    # assignment, per-domain profile, and the serialized centroid table;
    # the oracle replays all KMEANS_ROUNDS Lloyd updates as chained CTEs.
    "emb_kmeans_assign",
    "emb_kmeans_domains",
    "emb_kmeans_centroids",
    # UniMax waterfill over the LEARNED domains (cluster histogram) —
    # the discovered-domain mixing composition
    "emb_kmeans_mixture",
    # signature-estimate prefilter between band collision and exact
    # verify (NEXT.md r6 candidate #6) — semantics-visible, own oracle
    "dedup_minhash_prefiltered",
    # q16's basket ranking in the join-free one-shuffle shape (NEXT.md
    # r6 candidate #7): 4× less spill / 42% less peak memory at 50×
    "star_basket_pairs_onepass",
    # Q21 shape as per-order aggregation (same candidate): distinct
    # supplier counts replace both lineitem self-joins; ~25% faster at 50×
    "classic_waiting_suppliers_agg",
    # declarative expectations gates (row predicates folded into ONE
    # conditional-agg scan + uniqueness groupBys + FK anti join); mixed
    # firing/passing rules so the hash certifies both polarities
    "lineitem_expectations",
    "docs_expectations",
    # (Round-6 names pruned — their driver rows exist in CORRECTNESS_r06;
    # the remaining window is re-certification in stable registration
    # order.)
]


def queries() -> dict[str, QueryFn]:
    unordered: dict[str, QueryFn] = {}
    for name, q in analysis.QUERIES.items():
        unordered[name] = _star_query(q)
    from .operators import registry as op_registry

    unordered.update(op_registry.queries())

    out: dict[str, QueryFn] = {}
    for name in _NEEDS_FIRST_ROW:
        if name in unordered:
            out[name] = unordered[name]
    for name, fn in unordered.items():
        if name not in out:
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, q in analysis.QUERIES.items():
        if q.oracle is not None:
            out[name] = with_star(q.oracle)
    from .operators import registry as op_registry

    out.update(op_registry.oracle_sql())
    return out
