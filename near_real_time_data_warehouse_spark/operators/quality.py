"""Declarative data-quality expectations over warehouse tables.

The constraint/expectations gate every production warehouse runs before
publishing a load (Delta constraints, dbt tests, Great-Expectations
suites): a declarative rule set evaluated against a table, emitting one
row per rule with the violation count and a deterministic sample
offender key (MIN) for debugging. The reference has no such gate; this
belongs to the warehouse-operations brief next to the snapshot layer's
stats and docs_column_profile (which profiles but does not gate).

Scale shape: the four shapes a rule can take, each in its cheapest
plan —
- **row predicates** (not-null / range / enum): ALL of them fold into
  ONE conditional-aggregate pass over the table (a single scan, map-side
  combined, no shuffle beyond the 1-row agg), regardless of rule count;
- **key uniqueness**: one groupBy on the key (the unavoidable shuffle),
  counting groups with >1 row;
- **referential integrity**: a LEFT ANTI join against the parent keys
  (AQE broadcasts the deduplicated parent side when small);
- sample keys ride along as MIN aggregates — no second pass, no sort.

The rule results are tiny (one row per rule) and union driver-side —
at 100 TB the cost is one scan + one groupBy + one anti join, whatever
the rule count.

Mixed firing matters for the driver hash: on this synthetic corpus the
uniqueness rule and the >45-quantity audit genuinely fire (real
nonzero counts + sample keys) while the range/not-null/FK rules pass
(exact zeros + NULL samples), so the hash certifies both polarities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from . import registry


def _rule_row(name: str, cond_violation: F.Column, key: F.Column) -> tuple:
    """(rule, n_violations, sample_key) aggregate expressions for one
    row-predicate rule — composed into a single scan."""
    return (
        F.lit(name),
        F.sum(F.when(cond_violation, 1).otherwise(0)).cast("long"),
        F.min(F.when(cond_violation, key)).cast("long"),
    )


def lineitem_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over lineitem (+ the orders parent): row
    predicates in one scan, PK uniqueness in one groupBy, FK integrity
    in one anti join. One output row per rule: (rule, n_violations,
    sample_key)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    preds = [
        _rule_row(
            "l_quantity_between_1_50",
            ~F.col("l_quantity").between(1.0, 50.0) | F.col("l_quantity").isNull(),
            F.col("l_orderkey"),
        ),
        _rule_row(
            "l_quantity_gt_45_audit",
            F.col("l_quantity") > 45.0,
            F.col("l_orderkey"),
        ),
        _rule_row(
            "l_discount_between_0_0p1",
            ~F.col("l_discount").between(0.0, 0.1) | F.col("l_discount").isNull(),
            F.col("l_orderkey"),
        ),
        _rule_row(
            "l_shipdate_not_null",
            F.col("l_shipdate").isNull(),
            F.col("l_orderkey"),
        ),
    ]
    # every row-predicate rule in ONE conditional-aggregate scan
    agg_exprs = []
    for i, (_, n, s) in enumerate(preds):
        agg_exprs += [n.alias(f"n{i}"), s.alias(f"s{i}")]
    one = li.agg(*agg_exprs)
    rows = F.array(
        *[
            F.struct(
                preds[i][0].alias("rule"),
                F.col(f"n{i}").alias("n_violations"),
                F.col(f"s{i}").alias("sample_key"),
            )
            for i in range(len(preds))
        ]
    )
    scan_rules = one.select(F.explode(rows).alias("r")).select("r.*")

    pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.lit("pk_unique_orderkey_linenumber").alias("rule"),
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.min("l_orderkey").cast("long").alias("sample_key"),
        )
    )
    fk = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(
            F.lit("fk_lineitem_orderkey_in_orders").alias("rule"),
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.min("l_orderkey").cast("long").alias("sample_key"),
        )
    )
    parent = o.agg(
        F.lit("o_totalprice_nonnegative").alias("rule"),
        F.sum(
            F.when(
                (F.col("o_totalprice") < 0) | F.col("o_totalprice").isNull(), 1
            ).otherwise(0)
        ).cast("long").alias("n_violations"),
        F.min(
            F.when(
                (F.col("o_totalprice") < 0) | F.col("o_totalprice").isNull(),
                F.col("o_orderkey"),
            )
        ).cast("long").alias("sample_key"),
    )
    return scan_rules.unionByName(pk).unionByName(fk).unionByName(parent)


EXPECTATIONS_SQL = """
SELECT 'l_quantity_between_1_50' AS rule,
       CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1.0
                      OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(MIN(CASE WHEN l_quantity IS NULL OR l_quantity < 1.0
                      OR l_quantity > 50.0 THEN l_orderkey END) AS BIGINT)
         AS sample_key
FROM lineitem
UNION ALL
SELECT 'l_quantity_gt_45_audit',
       CAST(SUM(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(CASE WHEN l_quantity > 45.0 THEN l_orderkey END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'l_discount_between_0_0p1',
       CAST(SUM(CASE WHEN l_discount IS NULL OR l_discount < 0.0
                      OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(CASE WHEN l_discount IS NULL OR l_discount < 0.0
                      OR l_discount > 0.1 THEN l_orderkey END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'l_shipdate_not_null',
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(CASE WHEN l_shipdate IS NULL THEN l_orderkey END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'pk_unique_orderkey_linenumber',
       CAST(COUNT(*) AS BIGINT),
       CAST(MIN(l_orderkey) AS BIGINT)
FROM (SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
UNION ALL
SELECT 'fk_lineitem_orderkey_in_orders',
       CAST(COUNT(*) AS BIGINT),
       CAST(MIN(l_orderkey) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'o_totalprice_nonnegative',
       CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                     THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                     THEN o_orderkey END) AS BIGINT)
FROM orders
"""

_DOC_LANGS = ("de", "en", "es", "fr", "zh")


def docs_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over the documents corpus — the ingest gate a
    training-data pipeline runs before a crawl snapshot enters curation:
    identity (unique doc_id), content presence, METADATA CONSISTENCY
    (n_chars must equal length(text) — stale derived columns are the
    classic silent-corruption bug), a language enum, an exact-duplicate
    content audit, and a short-document audit (n_chars < 150, which
    genuinely fires on this corpus). Same shapes and output contract as
    lineitem_expectations: row predicates share ONE scan; uniqueness
    rules are one groupBy each."""
    d = load_table(spark, sf_dir, "documents")
    preds = [
        _rule_row(
            "text_not_empty",
            F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0),
            F.col("doc_id"),
        ),
        _rule_row(
            "n_chars_matches_text_length",
            F.col("n_chars") != F.length(F.col("text")),
            F.col("doc_id"),
        ),
        _rule_row(
            "lang_in_enum",
            ~F.col("lang").isin(*_DOC_LANGS) | F.col("lang").isNull(),
            F.col("doc_id"),
        ),
        _rule_row(
            "short_doc_audit_lt150",
            F.col("n_chars") < 150,
            F.col("doc_id"),
        ),
    ]
    agg_exprs = []
    for i, (_, n, s) in enumerate(preds):
        agg_exprs += [n.alias(f"n{i}"), s.alias(f"s{i}")]
    one = d.agg(*agg_exprs)
    rows = F.array(
        *[
            F.struct(
                preds[i][0].alias("rule"),
                F.col(f"n{i}").alias("n_violations"),
                F.col(f"s{i}").alias("sample_key"),
            )
            for i in range(len(preds))
        ]
    )
    scan_rules = one.select(F.explode(rows).alias("r")).select("r.*")
    pk = (
        d.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.lit("pk_unique_doc_id").alias("rule"),
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.min("doc_id").cast("long").alias("sample_key"),
        )
    )
    dup = (
        d.groupBy("text")
        .agg(F.count(F.lit(1)).alias("c"), F.min("doc_id").alias("k"))
        .filter(F.col("c") > 1)
        .agg(
            F.lit("exact_duplicate_text_audit").alias("rule"),
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.min("k").cast("long").alias("sample_key"),
        )
    )
    return scan_rules.unionByName(pk).unionByName(dup)


_DOC_LANG_LIST = ", ".join(f"'{x}'" for x in _DOC_LANGS)

DOCS_EXPECTATIONS_SQL = f"""
SELECT 'text_not_empty' AS rule,
       CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(MIN(CASE WHEN text IS NULL OR length(trim(text)) = 0
                     THEN doc_id END) AS BIGINT) AS sample_key
FROM documents
UNION ALL
SELECT 'n_chars_matches_text_length',
       CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(CASE WHEN n_chars <> length(text) THEN doc_id END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'lang_in_enum',
       CAST(SUM(CASE WHEN lang IS NULL OR lang NOT IN ({_DOC_LANG_LIST})
                     THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(CASE WHEN lang IS NULL OR lang NOT IN ({_DOC_LANG_LIST})
                     THEN doc_id END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'short_doc_audit_lt150',
       CAST(SUM(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(CASE WHEN n_chars < 150 THEN doc_id END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'pk_unique_doc_id',
       CAST(COUNT(*) AS BIGINT),
       CAST(MIN(doc_id) AS BIGINT)
FROM (SELECT doc_id FROM documents GROUP BY doc_id HAVING COUNT(*) > 1)
UNION ALL
SELECT 'exact_duplicate_text_audit',
       CAST(COUNT(*) AS BIGINT),
       CAST(MIN(k) AS BIGINT)
FROM (SELECT MIN(doc_id) AS k FROM documents GROUP BY text HAVING COUNT(*) > 1)
"""

registry.register("lineitem_expectations", lineitem_expectations, EXPECTATIONS_SQL)
registry.register("docs_expectations", docs_expectations, DOCS_EXPECTATIONS_SQL)
