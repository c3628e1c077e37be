"""Blocked fuzzy record linkage: invariants the oracle hash alone
doesn't spell out, pinned on real data plus a planted-typos case."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.operators.linkage import (
    MAX_EDIT_DIST,
    part_fuzzy_matches,
)

from .conftest import SF_SMALL


def test_fuzzy_match_invariants(spark):
    df = part_fuzzy_matches(spark, SF_SMALL)
    rows = df.collect()
    assert rows, "corpus has fuzzy-matchable part names"
    for r in rows:
        assert 1 <= r.distance <= MAX_EDIT_DIST          # distinct names, thresholded
        assert r.name_a < r.name_b                        # canonical pair order
        assert r.name_a.split(" ")[-1] == r.block         # blocking key honored
        assert r.name_b.split(" ")[-1] == r.block
        assert r.n_parts_a >= 1 and r.n_parts_b >= 1
    # no pair appears twice
    assert len({(r.name_a, r.name_b) for r in rows}) == len(rows)


def test_fuzzy_match_planted_typos(spark):
    """Known edit distances on a planted catalog: the blocked join must
    find exactly the within-block pairs under the threshold and skip
    cross-block near-matches."""
    import near_real_time_data_warehouse_spark.operators.linkage as lk

    names = [
        (1, "red bolt"),
        (2, "rad bolt"),      # distance 1 from "red bolt", same block
        (3, "blue bolt"),     # distance 4 from "red bolt" — over threshold
        (4, "red bolts"),     # block "bolts" — never compared to "bolt"
        (5, "crimson gear"),
    ]
    df = spark.createDataFrame(names, "p_partkey long, p_name string")
    import unittest.mock as mock

    with mock.patch.object(lk, "load_table_parallel", lambda s, d, t: df):
        got = {
            (r.name_a, r.name_b): r.distance
            for r in lk.part_fuzzy_matches(spark, "ignored").collect()
        }
    assert got == {("rad bolt", "red bolt"): 1}


def test_pagerank_invariants(spark):
    """Fixed-point PageRank: singletons carry exactly the base mass,
    every rank is positive, and a second run is bit-identical
    (determinism is the whole point of the integer arithmetic)."""
    from near_real_time_data_warehouse_spark.operators.dedup import (
        PR_BASE,
        dedup_pagerank,
    )

    df = dedup_pagerank(spark, SF_SMALL)
    rows = df.collect()
    assert rows
    singles = [r for r in rows if r.degree == 0]
    linked = [r for r in rows if r.degree > 0]
    assert singles and linked, "graph has both singletons and linked docs"
    assert all(r.rank == PR_BASE for r in singles)
    assert all(r.rank > 0 for r in rows)
    # connected docs receive propagated mass on top of the base
    assert max(r.rank for r in linked) > PR_BASE
    again = {(r.doc_id, r.rank) for r in dedup_pagerank(spark, SF_SMALL).collect()}
    assert again == {(r.doc_id, r.rank) for r in rows}
