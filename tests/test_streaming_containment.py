"""Streaming containment: the drained pair log is a monotone discovery
log — exact precision (every logged pair is a true containment pair
with the exact batch-kernel numbers), recall ⊇ the one-shot batch
build, replay idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.operators import dedup
from near_real_time_data_warehouse_spark.streaming import containment_stream as cs

from .conftest import SF_SMALL


def _pairs(df):
    return {(r.doc_a, r.doc_b): (r.n_common, r.n_a, r.n_b) for r in df.collect()}


def _batch_truth(spark):
    return _pairs(
        dedup.dedup_containment(spark, SF_SMALL).select(
            "doc_a", "doc_b", "n_common", "n_a", "n_b"
        )
    )


def _exact_truth_allpairs(spark):
    """Ground truth with NO candidate generation: every doc pair's exact
    containment (feasible at sf0.001) — the precision reference."""
    sh = dedup._shingles_materialized(spark, SF_SMALL)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .filter(
            F.greatest(
                F.col("n_common") / F.col("n_a"), F.col("n_common") / F.col("n_b")
            )
            >= dedup.CONTAINMENT_THRESHOLD
        )
    )
    return _pairs(j.select("doc_a", "doc_b", "n_common", "n_a", "n_b"))


def test_streaming_containment_monotone_contract(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("containment_stream")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    state = str(base / "state")
    cuts = [(0, 170), (170, 340), (340, 10**9)]
    for i, (lo, hi) in enumerate(cuts):
        b = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        cs.merge_containment_batch(spark, b, state, epoch_id=i)

    got = _pairs(cs.read_containment_links(spark, state))
    batch_build = _batch_truth(spark)
    exact = _exact_truth_allpairs(spark)

    # precision: every streamed pair is a true containment pair with the
    # exact kernel numbers
    for p, vals in got.items():
        assert p in exact and exact[p] == vals, p
    # recall: the stream discovers at least everything the one-shot
    # batch build finds (df-monotonicity argument in the module doc)
    for p, vals in batch_build.items():
        assert p in got and got[p] == vals, p


def test_streaming_containment_replay_idempotent(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("containment_replay")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    state = str(base / "state")
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)
    cs.merge_containment_batch(spark, b1, state, epoch_id=0)
    cs.merge_containment_batch(spark, b2, state, epoch_id=1)
    before = _pairs(cs.read_containment_links(spark, state))
    n_sh = spark.read.parquet(f"{state}/shingles").count()
    # crash-after-write, restart re-delivers epoch 1
    cs.merge_containment_batch(spark, b2, state, epoch_id=1)
    after = _pairs(cs.read_containment_links(spark, state))
    assert after == before
    assert spark.read.parquet(f"{state}/shingles").count() == n_sh
