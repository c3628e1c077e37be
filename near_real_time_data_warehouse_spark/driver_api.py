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
    # Round-6 late additions: UniMax budget-capped language mixing
    # (integer waterfill over the lang histogram) and CCNet-style exact
    # equi-depth perplexity terciles (histogram-windowed, corpus never
    # sorted) — both first driver rows.
    "docs_mixture_unimax",
    "docs_perplexity_buckets",
    # honest IVF recall gate: truth is the UNCAPPED exact top-k, so the
    # boolean measures the index, not CORPUS_CAP, at any probe scale
    "sim_ann_ivf_recall_uncapped",
    # cross-document duplicated-ngram fraction (Lee et al. 2021) — the
    # corpus-wide memorization signal, distinct from within-doc
    # repetition and from held-out-split contamination
    "docs_duplicated_ngram_fraction",
    # Round-6 additions (first driver rows): apply the trained tokenizer
    # to a HELD-OUT split — unseen words replay the stored merge ranks
    # through the training kernel (VERDICT r5 #2) — and packing measured
    # in trained-BPE pieces instead of whitespace tokens (VERDICT r5 #4).
    "text_bpe_encode_holdout",
    "docs_token_packing_bpe",
    "text_bpe_vocab",
    "docs_chunk_bpe_budget",
    # in-query reversed-word injection: the driver hash certifies the
    # unseen-word rank-replay kernel with a non-empty unseen set (the
    # testdata holdout's unseen set is empty by construction)
    "text_bpe_encode_unseen",
    # (Round-5 names pruned — their driver rows exist in CORRECTNESS_r05;
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
