"""SCD2 versioning invariants: minimal history, tiling validity
intervals, exactly one open version per key."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.operators import scd

from .conftest import SF_SMALL


def test_scd2_versions_small_known_history(spark):
    d = dt.date
    feed = spark.createDataFrame(
        [
            # key 1: A → A (dup, collapsed) → B → B (no-op, compacted) → A
            (1, d(2024, 1, 1), "A", 10),
            (1, d(2024, 1, 1), "Z", 11),  # same-day tie: min tie wins → A kept
            (1, d(2024, 2, 1), "B", 12),
            (1, d(2024, 3, 1), "B", 13),
            (1, d(2024, 4, 1), "A", 14),
            # key 2: single observation → one open version
            (2, d(2024, 1, 15), "C", 20),
        ],
        "k long, ts date, attr string, tie long",
    )
    rows = {
        (r.k, r.version_no): (r.valid_from, r.valid_to, r.attr, r.is_current)
        for r in scd.scd2_versions(feed, "k", "ts", "attr", "tie").collect()
    }
    assert rows == {
        (1, 1): (d(2024, 1, 1), d(2024, 2, 1), "A", False),
        (1, 2): (d(2024, 2, 1), d(2024, 4, 1), "B", False),
        (1, 3): (d(2024, 4, 1), None, "A", True),
        (2, 1): (d(2024, 1, 15), None, "C", True),
    }


def test_scd2_history_invariants_on_orders(spark):
    hist = scd.customer_priority_history(spark, SF_SMALL).cache()
    try:
        # exactly one current (open) version per customer
        per_key = hist.groupBy("custkey").agg(
            F.sum(F.col("is_current").cast("int")).alias("n_open"),
            F.sum(F.col("valid_to").isNull().cast("int")).alias("n_null_to"),
        )
        bad = per_key.filter((F.col("n_open") != 1) | (F.col("n_null_to") != 1)).count()
        assert bad == 0

        # intervals tile: valid_to of version n == valid_from of n+1
        w_next = (
            hist.alias("a")
            .join(
                hist.alias("b"),
                (F.col("a.custkey") == F.col("b.custkey"))
                & (F.col("a.version_no") + 1 == F.col("b.version_no")),
            )
            .filter(F.col("a.valid_to") != F.col("b.valid_from"))
            .count()
        )
        assert w_next == 0

        # minimal history: consecutive versions always change the attribute
        redundant = (
            hist.alias("a")
            .join(
                hist.alias("b"),
                (F.col("a.custkey") == F.col("b.custkey"))
                & (F.col("a.version_no") + 1 == F.col("b.version_no")),
            )
            .filter(F.col("a.priority") == F.col("b.priority"))
            .count()
        )
        assert redundant == 0
    finally:
        hist.unpersist()


def test_incremental_equals_full_recompute_three_batches(spark):
    """Time-partitioned CDC batches applied one at a time end bit-equal
    to the single-shot recompute over the whole feed."""
    from near_real_time_data_warehouse_spark.operators.scd import (
        _orders_feed,
        scd2_apply_increment,
        scd2_versions,
    )

    feed = _orders_feed(spark, SF_SMALL)
    args = ("o_custkey", "change_date", "o_orderpriority", "o_orderkey")
    cuts = ["1994-01-01", "1996-06-01"]
    h = scd2_versions(feed.filter(F.col("change_date") < cuts[0]), *args)
    h = scd2_apply_increment(
        h,
        feed.filter((F.col("change_date") >= cuts[0]) & (F.col("change_date") < cuts[1])),
        *args,
    )
    h = scd2_apply_increment(h, feed.filter(F.col("change_date") >= cuts[1]), *args)
    full = scd2_versions(feed, *args)
    assert h.exceptAll(full).count() == 0 and full.exceptAll(h).count() == 0


def test_incremental_flip_flop_and_noop_batches(spark):
    """An increment whose first observation repeats the open version's
    attribute adds no version; a later flip re-opens correctly."""
    import datetime as dtm

    from near_real_time_data_warehouse_spark.operators.scd import (
        scd2_apply_increment,
        scd2_versions,
    )

    d = dtm.date
    schema = "k long, ts date, attr string, tie long"
    b1 = spark.createDataFrame([(1, d(2024, 1, 1), "A", 1), (1, d(2024, 2, 1), "B", 2)], schema)
    b2 = spark.createDataFrame(
        [(1, d(2024, 3, 1), "B", 3), (1, d(2024, 4, 1), "A", 4), (2, d(2024, 3, 15), "X", 5)],
        schema,
    )
    h = scd2_apply_increment(scd2_versions(b1, "k", "ts", "attr", "tie"), b2, "k", "ts", "attr", "tie")
    got = {(r.k, r.version_no): (r.valid_from, r.valid_to, r.attr, r.is_current) for r in h.collect()}
    assert got == {
        (1, 1): (d(2024, 1, 1), d(2024, 2, 1), "A", False),
        (1, 2): (d(2024, 2, 1), d(2024, 4, 1), "B", False),  # 3/1 B was a no-op
        (1, 3): (d(2024, 4, 1), None, "A", True),
        (2, 1): (d(2024, 3, 15), None, "X", True),
    }


def test_increment_at_boundary_equal_ts_is_exact(spark):
    """The round-2 advisor's case: a batch observation at a ts EQUAL to
    the open version's valid_from. The naive union would carry two rows
    with the same (key, ts) into versioning (nondeterministic order,
    possible zero-width intervals); the tie-carrying re-collapse must
    resolve it exactly as the full recompute does — here the batch's
    tie (5) loses to the stored winner's tie (2), so B stays."""
    import datetime as dtm

    from near_real_time_data_warehouse_spark.operators.scd import (
        scd2_apply_increment,
        scd2_versions,
    )

    d = dtm.date
    schema = "k long, ts date, attr string, tie long"
    b1 = spark.createDataFrame([(1, d(2024, 1, 1), "A", 1), (1, d(2024, 2, 1), "B", 2)], schema)
    b2 = spark.createDataFrame([(1, d(2024, 2, 1), "C", 5), (1, d(2024, 3, 1), "C", 6)], schema)
    h = scd2_apply_increment(scd2_versions(b1, "k", "ts", "attr", "tie"), b2, "k", "ts", "attr", "tie")
    got = {(r.k, r.version_no): (r.valid_from, r.valid_to, r.attr, r.is_current) for r in h.collect()}
    full = scd2_versions(
        spark.createDataFrame(
            [(1, d(2024, 1, 1), "A", 1), (1, d(2024, 2, 1), "B", 2),
             (1, d(2024, 2, 1), "C", 5), (1, d(2024, 3, 1), "C", 6)],
            schema,
        ),
        "k", "ts", "attr", "tie",
    )
    want = {(r.k, r.version_no): (r.valid_from, r.valid_to, r.attr, r.is_current) for r in full.collect()}
    assert got == want == {
        (1, 1): (d(2024, 1, 1), d(2024, 2, 1), "A", False),
        (1, 2): (d(2024, 2, 1), d(2024, 3, 1), "B", False),
        (1, 3): (d(2024, 3, 1), None, "C", True),
    }


def test_observation_store_retro_insert_resurrects_noop(spark):
    """The case the compacted path cannot represent: a retro-insert
    between two stored versions turns a compacted-away no-op back into
    a real change. The observation store keeps the no-op, so the
    derived history equals the full recompute."""
    import datetime as dtm

    from near_real_time_data_warehouse_spark.operators.scd import (
        scd2_obs_apply,
        scd2_observations,
        scd2_versions,
        scd2_versions_from_observations,
    )

    d = dtm.date
    schema = "k long, ts date, attr string, tie long"
    # A on 1/1, A on 2/1 (no-op under compaction), then retro X on 1/15:
    # full recompute gives A | X | A — the 2/1 A matters again.
    base = [(1, d(2024, 1, 1), "A", 1), (1, d(2024, 2, 1), "A", 2)]
    retro = [(1, d(2024, 1, 15), "X", 3)]
    store = scd2_observations(spark.createDataFrame(base, schema), "k", "ts", "attr", "tie")
    store = scd2_obs_apply(store, spark.createDataFrame(retro, schema), "k", "ts", "attr", "tie")
    got = {
        (r.k, r.version_no): (r.valid_from, r.valid_to, r.attr, r.is_current)
        for r in scd2_versions_from_observations(store, "k", "ts", "attr").collect()
    }
    full = scd2_versions(spark.createDataFrame(base + retro, schema), "k", "ts", "attr", "tie")
    want = {
        (r.k, r.version_no): (r.valid_from, r.valid_to, r.attr, r.is_current)
        for r in full.collect()
    }
    assert got == want == {
        (1, 1): (d(2024, 1, 1), d(2024, 1, 15), "A", False),
        (1, 2): (d(2024, 1, 15), d(2024, 2, 1), "X", False),
        (1, 3): (d(2024, 2, 1), None, "A", True),
    }


def test_asof_join_never_fans_out(spark):
    """Tiling, non-overlapping intervals ⇒ at most one version matches
    each fact row: the as-of join output has exactly one row per
    lineitem, and NULL priority only before the customer's first
    version."""
    out = scd.priority_asof_ship(spark, SF_SMALL).cache()
    try:
        n_li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").count()
        assert out.count() == n_li

        hist = scd.customer_priority_history(spark, SF_SMALL)
        first = hist.filter(F.col("version_no") == 1).select(
            "custkey", F.col("valid_from").alias("first_from")
        )
        unmatched_late = (
            out.filter(F.col("priority_at_ship").isNull())
            .join(first, "custkey")
            .filter(F.col("ship_date") >= F.col("first_from"))
            .count()
        )
        assert unmatched_late == 0
    finally:
        out.unpersist()


def test_change_feed_roundtrip_reconstructs_snapshot(spark):
    """Applying the generated change feed to snapshot A reproduces
    snapshot B exactly, and the feed is minimal (unchanged rows absent)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import scd as S
    from near_real_time_data_warehouse_spark.sources.testdata import load_tables

    sf = "/root/testdata/sf0.001"
    o = load_tables(spark, sf, ("orders",))["orders"]
    a = {r.o_orderkey: r.prio for r in
         o.select("o_orderkey", F.col("o_orderpriority").alias("prio")).collect()}
    feed = S.snapshot_change_feed(spark, sf).collect()

    # minimality: no no-op rows
    for r in feed:
        if r.change_type == "update":
            assert r.old_priority != r.new_priority

    # apply
    b = dict(a)
    for r in feed:
        if r.change_type == "delete":
            assert b.pop(r.o_orderkey) == r.old_priority
        elif r.change_type == "insert":
            assert r.o_orderkey not in b
            b[r.o_orderkey] = r.new_priority
        else:
            assert b[r.o_orderkey] == r.old_priority
            b[r.o_orderkey] = r.new_priority

    # reference snapshot B from the same deterministic mutation
    want = {
        k: ("BUMPED" if k % S.CDF_UPDATE_MOD == 0 else v)
        for k, v in a.items()
        if k % S.CDF_DELETE_MOD != 0
    }
    mk = max(a)
    for i in range(1, S.CDF_INSERTS + 1):
        want[mk + i] = "NEW-ROW"
    assert b == want
