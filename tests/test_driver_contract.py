"""The driver contract must stay consistent.

Window policy (VERDICT r3 item 3): entries needing their first driver
row head the registration order; everything else follows in stable
registration order. A typo in ``_NEEDS_FIRST_ROW`` silently drops an
entry from its window position, invisible until a CORRECTNESS round
misses a row — so the list is test-guarded.

Output-shape guard (VERDICT r3 item 1/2): the driver canonicalizes each
result with pandas ``sort_values`` over every column, which raises
``TypeError: unhashable type`` on list/dict-valued cells. Round 3 lost
its only two red rows to exactly this, so the contract now forbids
top-level Array/Map/Struct columns in every ``queries()`` output schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from near_real_time_data_warehouse_spark import driver_api


def test_needs_first_row_references_real_entries():
    names = set(driver_api.queries())
    missing = [n for n in driver_api._NEEDS_FIRST_ROW if n not in names]
    assert not missing, f"_NEEDS_FIRST_ROW names not in registry: {missing}"
    dupes = {
        n for n in driver_api._NEEDS_FIRST_ROW
        if driver_api._NEEDS_FIRST_ROW.count(n) > 1
    }
    assert not dupes, f"duplicated in _NEEDS_FIRST_ROW: {dupes}"


def test_ordering_is_first_rows_then_stable_registration_order():
    q = list(driver_api.queries())
    head = driver_api._NEEDS_FIRST_ROW
    assert q[: len(head)] == head
    # The tail must be the stable registration order with the head removed:
    # analysis QUERIES first, then the operator registry order.
    from near_real_time_data_warehouse_spark.operators import registry as op_registry
    from near_real_time_data_warehouse_spark.plans import analysis

    stable = list(analysis.QUERIES) + [
        n for n in op_registry.queries() if n not in analysis.QUERIES
    ]
    expected_tail = [n for n in stable if n not in head]
    assert q[len(head):] == expected_tail


def test_every_query_has_oracle_or_documented_companion():
    """Every entry either has an oracle or is one of the two documented
    no-oracle entries, each with an oracled companion row."""
    q = set(driver_api.queries())
    o = set(driver_api.oracle_sql())
    no_oracle = q - o
    assert no_oracle == {"sim_ann_ivf_topk", "events_approx_distinct_users"}, no_oracle
    assert {"sim_ann_ivf_recall", "events_approx_distinct_error"} <= o


_FORBIDDEN = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.usefixtures("spark")
def test_no_array_or_map_output_columns(spark, sf_dir):
    """The driver's pandas canonicalizer cannot factorize list/dict cells
    (round-3 failure class: emb_label_centroids / emb_quantize_int8).
    Every registered entry's output schema must be scalar-only."""
    offenders = []
    for name, fn in driver_api.queries().items():
        schema = fn(spark, sf_dir).schema
        bad = [
            f.name for f in schema.fields if isinstance(f.dataType, _FORBIDDEN)
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, f"non-scalar driver output columns: {offenders}"
