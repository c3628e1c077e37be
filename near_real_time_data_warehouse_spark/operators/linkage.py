"""Record linkage / entity resolution: blocked fuzzy matching.

The data-curation kernel none of the shingle/minhash family covers:
SHORT strings (names, titles, product labels) where near-duplicates are
typo-distance variants, not shingle-overlapping documents. The
production shape is two-stage, like every dedup operator here:

1. **Blocking** — a cheap deterministic key (here: the last name token,
   i.e. the product noun) partitions the candidate space; only
   same-block pairs are considered. Never all-pairs.
2. **Verification** — exact Levenshtein edit distance on the candidate
   pairs, thresholded. A length-difference pre-filter (|len_a − len_b| ≤
   threshold, a lower bound on edit distance) prunes before the O(n·m)
   distance runs.

Pairing happens at DISTINCT-VALUE level, not row level: the entity
table's value cardinality (distinct names) is orders of magnitude below
its row count at warehouse scale, so the quadratic-within-block stage is
bounded by value-cardinality², and row multiplicity rides along as
counts. Levenshtein is the classic Wagner-Fischer distance in both
engines (integer, bit-portable), so the oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table_parallel
from . import registry

MAX_EDIT_DIST = 3


def with_block(names: DataFrame) -> DataFrame:
    """Attach the blocking key (final name token) to a (p_name, ...)
    table — the one definition both batch and streaming use."""
    return names.withColumn("block", F.element_at(F.split("p_name", " "), -1))


def blocked_levenshtein_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
    """The shared fuzzy kernel: blocked, length-filtered, Levenshtein-
    verified pairs between two (p_name, block) tables, emitted in
    canonical (name_a < name_b) orientation. Self-linkage passes the
    same table twice (the ≠ + least/greatest + distinct form yields
    exactly the a<b pair set); the streaming fold passes
    (batch, batch ∪ state) so state×state pairs are never recomputed.
    One definition means a threshold or blocking change can't silently
    diverge the batch entry from its streaming twin."""
    a = left.select(F.col("p_name").alias("name_a"), "block")
    b = right.select(
        F.col("p_name").alias("name_b"), F.col("block").alias("block_b")
    )
    return (
        a.join(
            b,
            (F.col("block") == F.col("block_b"))
            & (F.col("name_a") != F.col("name_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= MAX_EDIT_DIST),
        )
        .select(
            "block",
            F.least("name_a", "name_b").alias("name_a"),
            F.greatest("name_a", "name_b").alias("name_b"),
        )
        .distinct()
        .withColumn("distance", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("distance") <= MAX_EDIT_DIST)
    )


def part_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-linkage of the ``part`` catalog by name: distinct
    names blocked on their final token, verified by edit distance ≤
    MAX_EDIT_DIST, with per-name row multiplicities carried as counts.
    Output is the name-level linkage table an entity-resolution merge
    consumes (one row per matched name pair per block)."""
    p = load_table_parallel(spark, sf_dir, "part")
    names = with_block(
        p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    )
    pairs = blocked_levenshtein_pairs(names, names)
    counts_a = names.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a")
    )
    counts_b = names.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b")
    )
    return (
        pairs.join(counts_a, "name_a")
        .join(counts_b, "name_b")
        .select("block", "name_a", "name_b", "distance", "n_parts_a", "n_parts_b")
    )


PART_FUZZY_SQL = f"""
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
         string_split(p_name, ' ')[-1] AS block
  FROM part
  GROUP BY p_name
),
pairs AS (
  SELECT a.block, a.p_name AS name_a, b.p_name AS name_b,
         CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance,
         a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
  FROM names a JOIN names b
    ON a.block = b.block AND a.p_name < b.p_name
   AND abs(length(a.p_name) - length(b.p_name)) <= {MAX_EDIT_DIST}
)
SELECT block, name_a, name_b, distance, n_parts_a, n_parts_b
FROM pairs
WHERE distance <= {MAX_EDIT_DIST}
"""


registry.register("part_fuzzy_matches", part_fuzzy_matches, PART_FUZZY_SQL)
