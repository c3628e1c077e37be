"""Z-order (Morton-curve) clustering — the lakehouse data-layout
operator that makes multi-dimensional data skipping work at 100 TB.

A table range-partitioned by one key skips scans filtered on that key
only; interleaving the bits of several keys into one Morton code and
range-partitioning on IT bounds every clustered dimension per file, so
parquet min/max footer stats prune scans filtered on ANY of them. This
is the same layout op Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``
— here as a plain DataFrame transformation plus a driver-verified
statistics query that *measures* the clustering (per-bucket key spans).

Everything is integer Catalyst expressions (scale → interleave →
bucket): no UDFs, one shuffle for the layout, one for the stats. The
dimension maxima used for scaling come from a 1-row broadcast aggregate,
not a driver collect, so the plan stays fully declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_tables
from . import registry

Z_BITS = 16  # per-dimension resolution (16 bits × 2 dims = 32-bit code)
N_BUCKETS_LOG2 = 8  # 256 fixed-width code buckets for the stats query


def _interleave_terms(n_dims: int, bits: int, shift_fmt: str) -> str:
    """Bit-interleave expression text: bit ``i`` of dimension ``k`` lands
    at position ``i*n_dims + k``. ``shift_fmt`` renders a right-shift in
    the target dialect; disjoint target bits let plain ``+`` assemble the
    code in both engines."""
    terms = [
        f"({shift_fmt.format(col=f's{k}', i=i)} & 1) * {1 << (i * n_dims + k)}"
        for i in range(bits)
        for k in range(n_dims)
    ]
    return " + ".join(terms)


_SPARK_SHIFT = "shiftright({col}, {i})"
_DUCK_SHIFT = "({col} >> {i})"


def with_zvalue(df: DataFrame, cols: list[str], bits: int = Z_BITS) -> DataFrame:
    """``df`` plus ``zval``: the Morton code of ``cols`` scaled to
    ``bits`` bits each. Scaling maxima come from one broadcast 1-row
    aggregate (an O(columns) reduce — at scale, parquet footer stats
    could supply them for free)."""
    maxes = df.agg(*[F.max(c).cast("long").alias(f"_max_{i}") for i, c in enumerate(cols)])
    out = df.crossJoin(F.broadcast(maxes))
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        out = out.withColumn(f"s{i}", F.expr(f"(CAST({c} AS BIGINT) * {top}) div _max_{i}"))
    zval = F.expr(_interleave_terms(len(cols), bits, _SPARK_SHIFT))
    return out.withColumn("zval", zval).drop(
        *[f"s{i}" for i in range(len(cols))], *[f"_max_{i}" for i in range(len(cols))]
    )


def zorder_layout(
    df: DataFrame, cols: list[str], partitions: int, bits: int = Z_BITS
) -> DataFrame:
    """The write-side layout: range-partition + sort by the Morton code.
    Each output file then covers a small hyper-rectangle of the clustered
    key space, which is exactly what footer-stats pruning needs. (The
    range boundaries come from Spark's reservoir sampling, so the
    *assignment* is not bit-deterministic — the stats entry below uses
    fixed-width code buckets instead for its oracle.)"""
    return (
        with_zvalue(df, cols, bits)
        .repartitionByRange(partitions, "zval")
        .sortWithinPartitions("zval")
    )


def zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per fixed-width Morton-code bucket of lineitem clustered on
    (l_partkey, l_suppkey): row count and both keys' min/max. The spans
    are the data-skipping measure — after z-ordering, every bucket covers
    ≈1/2^(b/2) of EACH dimension, where a single-key sort would leave the
    other dimension's span at ~100%. tests/test_layout.py asserts that
    quantitatively; this entry makes the bucket profile driver-verified."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    z = with_zvalue(li.select("l_partkey", "l_suppkey"), ["l_partkey", "l_suppkey"])
    bucket_shift = 2 * Z_BITS - N_BUCKETS_LOG2
    return (
        z.groupBy(F.expr(f"shiftright(zval, {bucket_shift})").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
    )


def _zorder_stats_sql() -> str:
    top = (1 << Z_BITS) - 1
    interleave = _interleave_terms(2, Z_BITS, _DUCK_SHIFT)
    bucket_shift = 2 * Z_BITS - N_BUCKETS_LOG2
    return f"""
WITH m AS (
  SELECT MAX(CAST(l_partkey AS BIGINT)) AS m0, MAX(CAST(l_suppkey AS BIGINT)) AS m1
  FROM lineitem
),
scaled AS (
  SELECT l_partkey, l_suppkey,
         (CAST(l_partkey AS BIGINT) * {top}) // m0 AS s0,
         (CAST(l_suppkey AS BIGINT) * {top}) // m1 AS s1
  FROM lineitem, m
),
z AS (SELECT l_partkey, l_suppkey, {interleave} AS zval FROM scaled)
SELECT zval >> {bucket_shift} AS bucket,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS part_lo,
       MAX(l_partkey) AS part_hi,
       MIN(l_suppkey) AS supp_lo,
       MAX(l_suppkey) AS supp_hi
FROM z
GROUP BY bucket
"""


# ---- Hilbert curve ------------------------------------------------------
H_BITS = 16  # per-dimension resolution, matching Z_BITS


def _hilbert_level_exprs(j: int, x: str, y: str, d: str) -> tuple[str, str, str]:
    """One unrolled level of the classic xy2d walk (s = 2^j), as plain
    SQL CASE/arithmetic valid in BOTH engines: the quadrant index
    (3·rx) XOR ry is rewritten as CASE WHEN rx=1 THEN 3−ry ELSE ry END,
    so no dialect-specific xor is needed."""
    s = 1 << j
    rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
    quad = f"(CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END)"
    d2 = f"{d} + CAST({s * s} AS BIGINT) * {quad}"  # 2^30 literal would overflow INT32
    x2 = f"(CASE WHEN {ry} = 1 THEN {x} WHEN {rx} = 1 THEN {s - 1} - {y} ELSE {y} END)"
    y2 = f"(CASE WHEN {ry} = 1 THEN {y} WHEN {rx} = 1 THEN {s - 1} - {x} ELSE {x} END)"
    return x2, y2, d2


def with_hilbert(df: DataFrame, cols: list[str], bits: int = H_BITS) -> DataFrame:
    """``df`` plus ``hval``: the Hilbert-curve index of the two ``cols``
    scaled to ``bits`` bits each — the better-locality alternative to the
    Morton code above (every curve step moves to an ADJACENT cell, so
    equal-width index buckets cover tighter key rectangles; Delta's
    OPTIMIZE uses Hilbert for exactly this reason).

    Implementation note (measured): a pure-Catalyst unroll of the 16
    rotation levels gets inlined by CollapseProject into ONE projection
    whose expression tree doubles per level (~2^16 terms — seconds of
    optimizer/codegen time and an interpreted fallback). The rotation is
    instead one vectorized Arrow pass (exact int64 numpy, the LSH-
    bucketing precedent); the DuckDB oracle replays the identical
    arithmetic as 16 chained CTEs, which DuckDB evaluates linearly."""
    assert len(cols) == 2, "2-D Hilbert (the common layout case)"
    import numpy as np
    import pandas as pd  # noqa: F401

    # bounded 1-row collect: just the two scaling denominators. Guard the
    # degenerate inputs: an empty frame aggregates to NULLs, and an
    # all-zero key column would divide by zero in the scaling.
    m = df.agg(*[F.max(c).cast("long") for c in cols]).first()
    m0 = max(1, int(m[0] or 0))
    m1 = max(1, int(m[1] or 0))
    top = (1 << bits) - 1
    # fresh StructType — df.schema returns the DataFrame's CACHED schema
    # object and StructType.add mutates in place, which would corrupt
    # df.columns (hit while writing this)
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("hval", T.LongType())]
    )
    c0, c1 = cols

    def batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            x = pdf[c0].to_numpy(np.int64) * top // m0
            y = pdf[c1].to_numpy(np.int64) * top // m1
            d = np.zeros(len(pdf), dtype=np.int64)
            for j in range(bits - 1, -1, -1):
                s = 1 << j
                rx = (x & s) > 0
                ry = (y & s) > 0
                d += np.int64(s) * np.int64(s) * np.where(rx, 3 - ry.astype(np.int64), ry.astype(np.int64))
                flip = rx & ~ry
                x_f = np.where(flip, s - 1 - x, x)
                y_f = np.where(flip, s - 1 - y, y)
                swap = ~ry
                x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
            pdf = pdf.copy()
            pdf["hval"] = d
            yield pdf

    return df.mapInPandas(batches, out_schema)


def hilbert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per fixed-width Hilbert-index bucket of lineitem clustered on
    (l_partkey, l_suppkey): row count and both keys' min/max spans — the
    same data-skipping measure as lineitem_zorder_stats, for the curve
    with strictly better locality (adjacent index ⇒ adjacent cell). The
    oracle replays the identical unrolled level chain, so the driver
    hash certifies 16 levels of bit-exact curve arithmetic."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    h = with_hilbert(li.select("l_partkey", "l_suppkey"), ["l_partkey", "l_suppkey"])
    bucket_shift = 2 * H_BITS - N_BUCKETS_LOG2
    return (
        h.groupBy(F.expr(f"shiftright(hval, {bucket_shift})").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
    )


def _hilbert_stats_sql() -> str:
    top = (1 << H_BITS) - 1
    ctes = [
        f"""m AS (
  -- GREATEST(..., 1) mirrors the Spark side's max(1, ...) clamp so a
  -- degenerate all-zero key column divides by 1 in both engines.
  SELECT GREATEST(MAX(CAST(l_partkey AS BIGINT)), 1) AS m0,
         GREATEST(MAX(CAST(l_suppkey AS BIGINT)), 1) AS m1
  FROM lineitem
),
lvl{H_BITS} AS (
  SELECT l_partkey, l_suppkey,
         (CAST(l_partkey AS BIGINT) * {top}) // m0 AS x,
         (CAST(l_suppkey AS BIGINT) * {top}) // m1 AS y,
         CAST(0 AS BIGINT) AS d
  FROM lineitem, m
)"""
    ]
    for j in range(H_BITS - 1, -1, -1):
        x2, y2, d2 = _hilbert_level_exprs(j, "x", "y", "d")
        ctes.append(
            f"""lvl{j} AS (
  SELECT l_partkey, l_suppkey, {x2} AS x, {y2} AS y, {d2} AS d FROM lvl{j + 1}
)"""
        )
    bucket_shift = 2 * H_BITS - N_BUCKETS_LOG2
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block}
SELECT d >> {bucket_shift} AS bucket,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS part_lo,
       MAX(l_partkey) AS part_hi,
       MIN(l_suppkey) AS supp_lo,
       MAX(l_suppkey) AS supp_hi
FROM lvl0
GROUP BY bucket
"""


registry.register("lineitem_zorder_stats", zorder_stats, _zorder_stats_sql())
registry.register("lineitem_hilbert_stats", hilbert_stats, _hilbert_stats_sql())
