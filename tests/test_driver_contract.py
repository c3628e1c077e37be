"""The driver contract's registration bookkeeping must stay consistent:
a typo in the priority/deprioritized lists silently drops an entry from
its intended window position (queries() filters with `if name in ...`),
which is invisible until a CORRECTNESS round misses a row."""

from __future__ import annotations

from near_real_time_data_warehouse_spark import driver_api


def test_priority_lists_reference_real_entries():
    names = set(driver_api.queries())
    missing_p = [n for n in driver_api._PRIORITY if n not in names]
    missing_d = [n for n in driver_api._DEPRIORITIZED if n not in names]
    assert not missing_p, f"_PRIORITY names not in registry: {missing_p}"
    assert not missing_d, f"_DEPRIORITIZED names not in registry: {missing_d}"
    overlap = set(driver_api._PRIORITY) & set(driver_api._DEPRIORITIZED)
    assert not overlap, f"in both lists: {overlap}"


def test_ordering_is_priority_then_rest_then_deprioritized():
    q = list(driver_api.queries())
    n_p = len(driver_api._PRIORITY)
    assert q[:n_p] == driver_api._PRIORITY
    n_d = len([n for n in driver_api._DEPRIORITIZED if n in q])
    assert set(q[-n_d:]) == set(driver_api._DEPRIORITIZED)


def test_every_query_has_oracle_or_documented_companion():
    """Every entry either has an oracle or is one of the two documented
    no-oracle entries, each with an oracled companion row in-window."""
    q = set(driver_api.queries())
    o = set(driver_api.oracle_sql())
    no_oracle = q - o
    assert no_oracle == {"sim_ann_ivf_topk", "events_approx_distinct_users"}, no_oracle
    assert {"sim_ann_ivf_recall", "events_approx_distinct_error"} <= o
