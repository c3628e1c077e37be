"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) covers most cases at
runtime; salting is the explicit tool for the pathological ones — a
power-law key where one value holds a double-digit percentage of rows
(the classic 100 TB failure: one straggler task owns the hot key).

- ``salted_aggregate``: two-phase aggregation — aggregate on
  (key, salt) first, then merge partials per key. Correct for any
  algebraic aggregate (sum/count/min/max and combinations).
- ``salted_broadcast_join``: replicate the (small) build side per salt so
  the probe side's hot key spreads over N tasks. For big-big skew joins,
  prefer AQE; salting both sides requires replicating one of them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform deterministic-per-row salt. Uses a hash of the whole row
    plus a monotonic id rather than rand() so replays are stable."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*df.columns, F.monotonically_increasing_id()), F.lit(n_salts)),
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: Callable[[], list[Column]],
    merge: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs()`` builds the partial aggregate columns (applied per
    (keys, salt)); ``merge()`` builds the combiners over the partials.
    Example::

        salted_aggregate(
            df, ["k"],
            aggs=lambda: [F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
            merge=lambda: [F.sum("s").alias("s"), F.sum("c").alias("c")],
        )
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(*aggs())
    return partial.groupBy(*keys).agg(*merge())


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: salt the big side, explode the
    broadcast side across all salts, join on (key, salt). Output equals the
    plain inner join; the hot key's rows land on ``n_salts`` tasks."""
    big_salted = with_salt(big, n_salts)
    small_exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = big_salted.join(F.broadcast(small_exploded), [key, "__salt"], "inner")
    return joined.drop("__salt")
