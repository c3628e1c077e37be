"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy(...)`` without a partition key, which Spark executes on a
SINGLE partition (the classic 100 TB cliff: one task sorts everything).

``global_row_number`` produces exactly the same ranks as
``row_number().over(Window.orderBy(cols))`` but stays distributed and
JVM-only: range-repartition on the sort keys (Spark's sampled range
partitioner gives totally-ordered partitions), sort within partitions,
take the partition-local record number from the low 33 bits of
``monotonically_increasing_id`` (its documented layout: partition id in
the high bits, per-partition record number in the low 33), and add the
cumulative offset of all earlier partitions — a driver-side collect of
one count per partition, i.e. O(num_partitions), never O(rows).
``scalable_ntile`` derives ntile's exact bucket assignment (first N%k
buckets one row larger) arithmetically from the global rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOCAL_MASK = (1 << 33) - 1


def _ranked(
    df: DataFrame, order_by: list[Column], rank_col: str, num_partitions: int | None
) -> tuple[DataFrame, int]:
    """Rank + total row count in two jobs over one persisted sort pass."""
    from .dedup import _local_checkpoint_stats_clean

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Checkpoint the INPUT first (r13 opt): the range partitioner's
    # sampling pass is a separate job over the child plan, so an
    # unmaterialized input executes its whole upstream pipeline TWICE
    # (sample + shuffle map). Ranked inputs here are narrow (keys + a few
    # measures), so caching one copy is far cheaper than re-running a
    # scoring/aggregation pipeline (opt guide §1.2: don't compute twice).
    df = _local_checkpoint_stats_clean(df, eager=False)
    # Materialize the arranged data: the range partitioner SAMPLES, so the
    # counts pass and the output must see the same partition boundaries —
    # a recompute could re-sample and mis-rank. localCheckpoint (not
    # persist) because its blocks are pinned (no eviction-recompute path)
    # and freed by the ContextCleaner once the caller drops the DataFrame,
    # whereas persist() entries accumulate in the CacheManager until an
    # explicit unpersist (the round-1 leak).
    arranged = (
        df.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__local", F.monotonically_increasing_id().bitwiseAND(_LOCAL_MASK))
        .localCheckpoint(eager=True)
    )
    sizes = {r["__pid"]: r["cnt"] for r in
             arranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(sizes):
        offsets[pid] = running
        running += sizes[pid]
    offset_expr = F.lit(0).cast("long")
    if offsets:
        pairs: list[Column] = []
        for pid, off in offsets.items():
            pairs.extend((F.lit(pid), F.lit(off)))
        offset_expr = F.element_at(F.create_map(*pairs), F.col("__pid")).cast("long")
    out = arranged.withColumn(
        rank_col, (F.col("__local") + offset_expr + 1).cast("long")
    ).drop("__pid", "__local")
    return out, running


def global_row_number(
    df: DataFrame, order_by: list[Column], rank_col: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Total-order row_number over arbitrary sort expressions, distributed.

    Equivalent to ``F.row_number().over(Window.orderBy(*order_by))`` —
    include tie-break keys in ``order_by`` for determinism — but executes
    as rangepartition → local sort → local index + partition offsets, all
    JVM-side (no RDD round trip, no single-partition window)."""
    out, _ = _ranked(df, order_by, rank_col, num_partitions)
    return out


def scalable_percent_rank(
    df: DataFrame,
    order_cols: list[str],
    pct_col: str = "percent_rank",
    cume_col: str = "cume_dist",
) -> DataFrame:
    """Exact global ``percent_rank()``/``cume_dist()`` without the
    single-partition window.

    SQL semantics: percent_rank = (rank−1)/(N−1) with ties sharing the
    MINIMUM row number of their tie group; cume_dist = max row number of
    the group / N. The distributed row number's order WITHIN a tie group
    is arbitrary, but a tie group always occupies a contiguous rank
    range, so min/max per distinct key value are order-independent —
    the result is deterministic and bit-equal to the window form. Cost:
    the range-partitioned sort + one equi-shuffle on the key columns."""
    ranked, total = _ranked(df, [F.col(c) for c in order_cols], "__rn", None)
    groups = ranked.groupBy(*order_cols).agg(
        F.min("__rn").alias("__minrn"), F.max("__rn").alias("__maxrn")
    )
    out = ranked.join(groups, order_cols)
    pct = (
        ((F.col("__minrn") - 1) / F.lit(total - 1)).cast("double")
        if total > 1
        else F.lit(0.0)
    )
    return (
        out.withColumn(pct_col, pct)
        .withColumn(cume_col, (F.col("__maxrn") / F.lit(total)).cast("double"))
        .drop("__rn", "__minrn", "__maxrn")
    )


def scalable_ntile(
    df: DataFrame,
    order_by: list[Column],
    n_buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact ntile(n) semantics without a single-partition window.

    ntile gives the first ``N % n`` buckets ``⌈N/n⌉`` rows and the rest
    ``⌊N/n⌋``; given the global rank r that assignment is closed-form."""
    ranked, total = _ranked(df, order_by, "__rank", None)
    base, rem = divmod(total, n_buckets)
    big = base + 1
    split = rem * big  # ranks 1..split live in the first `rem` buckets
    r = F.col("__rank")
    if base == 0:
        bucket = r  # fewer rows than buckets: ntile assigns bucket = rank
    else:
        # integer `div` keeps the arithmetic exact at any rank magnitude
        bucket = F.when(r <= split, F.expr(f"(__rank - 1) div {big}") + 1).otherwise(
            F.lit(rem) + F.expr(f"(__rank - {split} - 1) div {base}") + 1
        )
    return ranked.withColumn(bucket_col, bucket.cast("long")).drop("__rank")


def scalable_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    salt_on: str,
    rank_col: str = "rank",
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact top-k per group without the hot-group cliff.

    ``row_number().over(Window.partitionBy(group).orderBy(...))`` sends a
    group's ENTIRE candidate set to one task — fine for many small groups
    (tfidf_top_terms), fatal for a few huge ones (a retrieval query whose
    candidate list is corpus-sized). Two phases, both bounded: phase 1
    ranks within (group, salt) — salt = pmod(xxhash64(salt_on), B) — and
    keeps k per salted subgroup, so no task ever sorts more than a 1/B
    sample of a group and at most B·k survivors per group remain; phase 2
    ranks the survivors per group (≤ B·k rows each — a constant).
    Exact for any ordering because a group's true top-k is contained in
    the union of its per-salt top-k. ``order_by`` must be a TOTAL order
    (full tie-break keys) for deterministic output; ``salt_on`` names a
    column that spreads a group's rows across salts (a per-row key)."""
    from pyspark.sql import Window

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_on), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
