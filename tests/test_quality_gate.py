"""Expectations gate: rule polarity on the synthetic corpus (both
firing and passing rules), sample-key determinism."""

from __future__ import annotations

from near_real_time_data_warehouse_spark.operators.quality import (
    lineitem_expectations,
)

from .conftest import SF_SMALL


def test_expectations_rule_polarity(spark):
    rows = {
        r["rule"]: (r["n_violations"], r["sample_key"])
        for r in lineitem_expectations(spark, SF_SMALL).collect()
    }
    assert len(rows) == 7
    # passing rules: exact zero violations, NULL sample
    for rule in (
        "l_quantity_between_1_50",
        "l_discount_between_0_0p1",
        "l_shipdate_not_null",
        "fk_lineitem_orderkey_in_orders",
        "o_totalprice_nonnegative",
    ):
        assert rows[rule] == (0, None), rule
    # genuinely firing rules: nonzero count + deterministic MIN sample
    for rule in ("l_quantity_gt_45_audit", "pk_unique_orderkey_linenumber"):
        n, sample = rows[rule]
        assert n > 0 and sample is not None, rule


def test_expectations_sample_is_min_offender(spark):
    import pyspark.sql.functions as F

    from near_real_time_data_warehouse_spark.sources.testdata import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    want = li.filter(F.col("l_quantity") > 45.0).agg(
        F.min("l_orderkey")
    ).collect()[0][0]
    rows = {
        r["rule"]: r["sample_key"]
        for r in lineitem_expectations(spark, SF_SMALL).collect()
    }
    assert rows["l_quantity_gt_45_audit"] == want


def test_docs_expectations_polarity(spark):
    from near_real_time_data_warehouse_spark.operators.quality import (
        docs_expectations,
    )

    rows = {
        r["rule"]: (r["n_violations"], r["sample_key"])
        for r in docs_expectations(spark, SF_SMALL).collect()
    }
    assert len(rows) == 6
    for rule in (
        "text_not_empty",
        "n_chars_matches_text_length",
        "lang_in_enum",
        "pk_unique_doc_id",
        "exact_duplicate_text_audit",
    ):
        assert rows[rule] == (0, None), rule
    n, sample = rows["short_doc_audit_lt150"]
    assert n > 0 and sample is not None
