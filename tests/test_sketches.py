"""Sketch-based operators: HLL estimates must land within tolerance of
the exact answer; the hash-stable split must be deterministic, leakage-
free for duplicate content, and roughly proportioned."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.operators.events import _events, approx_distinct_users
from near_real_time_data_warehouse_spark.operators.text import shard_split

from .conftest import SF_SMALL


def test_hll_within_tolerance(spark):
    """The DAU-sketch entry: exact daily counts match an independent
    countDistinct, and every sketch lands within the 5% bound (the
    boolean the driver oracle pins as constant true)."""
    from near_real_time_data_warehouse_spark.operators.events import _DAY_US

    rows = approx_distinct_users(spark, SF_SMALL).collect()
    assert rows and all(r.within_bound for r in rows), [
        (r.event_type, r.day) for r in rows if not r.within_bound
    ]
    exact = {
        (r.event_type, r.day): r.n
        for r in _events(spark, SF_SMALL)
        .groupBy("event_type", F.expr(f"us div {_DAY_US}").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {(r.event_type, r.day): r.exact_daily_users for r in rows}
    assert got == exact


def test_shard_split_proportions_and_determinism(spark):
    df = shard_split(spark, SF_SMALL)
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert 0.6 <= counts["train"] / total <= 0.95
    assert counts["val"] > 0 and counts["test"] > 0
    # deterministic under re-evaluation
    again = {(r.doc_id, r.split) for r in shard_split(spark, SF_SMALL).collect()}
    assert {(r.doc_id, r.split) for r in df.collect()} == again


def test_hll_partial_merge_tracks_exact(spark):
    """The merged daily partial sketches estimate the all-days distinct
    count within the gate bound, and the raw estimate is pinned here
    (the driver entry only exposes the boolean)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators.events import (
        _DAY_US,
        _events,
        hll_partial_merge,
    )

    sf = "/root/testdata/sf0.001"
    rows = hll_partial_merge(spark, sf).collect()
    assert rows and all(r.merged_within_bound for r in rows)
    e = _events(spark, sf)
    partials = (
        e.select("event_type", F.expr(f"us div {_DAY_US}").alias("day"), "user_id")
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged = {
        r.event_type: r.est
        for r in partials.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(merged[t] - n) <= max(1, 0.05 * n), (t, merged[t], n)
