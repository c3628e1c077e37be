"""Slowly-changing-dimension (SCD type 2) versioning from a change feed.

The reference warehouse upserts dims with first-writer-wins (SCD type 0
— /root/reference/hybrid_join.py:365-378, mirrored at etl.py:122). Real
warehouses usually need type 2: every attribute change opens a new
version row with ``valid_from``/``valid_to``/``is_current``, so facts
can join the dimension AS OF their event time.

Pipeline (all map-side-combinable or single-key-shuffle — scales):
  1. same-timestamp collapse: ``min_by(attr, tie)`` groupBy — exact
     because the tie column is unique, and partially aggregable; the
     winning tie (``min(tie)``) is kept as ``_tie`` so later merges can
     re-collapse deterministically and exactly (collapse is associative
     on (attr, tie) pairs under min-tie);
  2. change compaction: drop rows whose attribute equals the previous
     version's (lag over the key) — the step that makes the history
     minimal;
  3. versioning: ``valid_to = lead(valid_from)``, open-ended for the
     current row; version numbers by row_number.
Steps 2-3 share one shuffle (same partitionBy key, same ordering).

Two maintenance paths:
  - ``scd2_apply_increment`` merges CDC batches into the *compacted*
    history — cheapest state, exact for time-partitioned batches
    (boundary-equal timestamps included: ``merged`` is re-collapsed on
    (key, ts) with the carried tie before re-versioning);
  - the *observation store* (``scd2_observations`` /
    ``scd2_obs_apply`` / ``scd2_versions_from_observations``) keeps
    every collapsed observation — no compaction loss — so batches may
    arrive in ARBITRARY order, retro-inserts included, and versions
    derived from the store are always bit-equal to a full recompute
    (driver-hash-certified by ``orders_scd2_outoforder``).

The driver entry versions each customer's order-priority from the
orders table as the change feed; the oracle is the same window chain in
DuckDB (arg_min / LAG / LEAD), hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_tables
from . import registry


def _collapse(feed: DataFrame, key: str, ts: str, attr: str, tie: str) -> DataFrame:
    return feed.groupBy(key, ts).agg(
        F.min_by(attr, tie).alias(attr), F.min(tie).alias("_tie")
    )


def _recollapse(merged: DataFrame, key: str, ts: str, attr: str) -> DataFrame:
    """Collapse already-collapsed fragments on (key, ts) using the
    carried winning tie — associative, so merging partial collapses
    this way equals collapsing the original feed in one shot."""
    return merged.groupBy(key, ts).agg(
        F.min_by(attr, "_tie").alias(attr), F.min("_tie").alias("_tie")
    )


def _versions_from_collapsed(
    collapsed: DataFrame, key: str, ts: str, attr: str
) -> DataFrame:
    w = Window.partitionBy(key).orderBy(ts)
    changes = (
        collapsed.withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .drop("_prev")
    )
    return changes.select(
        F.col(key),
        F.row_number().over(w).alias("version_no"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.col(attr),
        F.lead(ts).over(w).isNull().alias("is_current"),
        F.col("_tie"),
    )


def scd2_versions(
    feed: DataFrame, key: str, ts: str, attr: str, tie: str
) -> DataFrame:
    """Minimal SCD2 history from a raw change feed.

    ``feed`` rows are observations (key, ts, attr, tie); ``tie`` must be
    unique per (key, ts) so the same-timestamp collapse is deterministic.
    Output: one row per retained version with version_no, valid_from,
    valid_to (null = open), is_current, plus ``_tie`` (the version's
    collapse-winning tie, carried so increments merge exactly)."""
    return _versions_from_collapsed(_collapse(feed, key, ts, attr, tie), key, ts, attr)


def scd2_apply_increment(
    history: DataFrame, feed: DataFrame, key: str, ts: str, attr: str, tie: str
) -> DataFrame:
    """Incremental SCD2 maintenance: merge a new change-feed batch into
    an existing history, recomputing ONLY the touched keys.

    A history row *is* its key's compacted feed (one (ts, attr)
    observation per retained version), so the merge re-derives versions
    from `touched keys' old rows ∪ the batch's collapsed observations`
    and unions the untouched keys back unchanged. Cost ∝ touched keys'
    history — never the full dimension — which is what makes nightly
    dim maintenance viable when the history holds billions of rows.

    Exactness contract: bit-equal to a full recompute (tested) when
    batches partition the feed into increasing time ranges — every
    observation in a batch at-or-after everything already applied — the
    normal CDC cadence. Out-of-order *within* a batch is fine (the
    window sorts), and a batch observation at a timestamp EQUAL to a
    stored version's valid_from is exact too: ``merged`` is re-collapsed
    on (key, ts) with the carried winning tie before re-versioning, so
    the duplicate-(key, ts) nondeterminism the naive union would hit
    cannot occur, and min-tie associativity makes the outcome identical
    to collapsing the original feed. What remains out of contract is an
    observation time-traveling strictly *between* already-applied
    batches: compaction drops no-op observations, so a retro-insert
    there can diverge from recompute. For arbitrary-order feeds use the
    observation store (``scd2_obs_apply``), which keeps every collapsed
    observation and is exact under any batch order."""
    collapsed_new = _collapse(feed, key, ts, attr, tie)
    touched = collapsed_new.select(key).distinct()
    old_feed = history.join(touched, key).select(
        key, F.col("valid_from").alias(ts), attr, "_tie"
    )
    merged = _recollapse(old_feed.unionByName(collapsed_new), key, ts, attr)
    recomputed = _versions_from_collapsed(merged, key, ts, attr)
    untouched = history.join(touched, key, "left_anti")
    return untouched.unionByName(recomputed)


def scd2_observations(feed: DataFrame, key: str, ts: str, attr: str, tie: str) -> DataFrame:
    """The uncompacted observation store: one row per (key, ts) holding
    the collapse-winning (attr, tie). Keeping no-op observations is what
    buys arbitrary-order maintenance — a retro-insert can turn a stored
    no-op back into a real change, which the compacted history cannot
    represent. State ∝ distinct (key, ts) observed, not versions."""
    return _collapse(feed, key, ts, attr, tie)


def scd2_obs_apply(
    obs: DataFrame, feed: DataFrame, key: str, ts: str, attr: str, tie: str
) -> DataFrame:
    """Merge a change-feed batch into the observation store — batches in
    ANY order (retro-inserts included). Only touched keys' observations
    are re-collapsed; min-tie associativity makes the merged store equal
    to collapsing the full concatenated feed, hence versions derived
    from it are bit-equal to a full recompute under any batch order
    (property-tested; driver-hash-certified by orders_scd2_outoforder)."""
    batch = _collapse(feed, key, ts, attr, tie)
    touched = batch.select(key).distinct()
    merged = _recollapse(obs.join(touched, key).unionByName(batch), key, ts, attr)
    untouched = obs.join(touched, key, "left_anti")
    return untouched.unionByName(merged)


def scd2_versions_from_observations(
    obs: DataFrame, key: str, ts: str, attr: str
) -> DataFrame:
    """Compact + version the observation store at read time (steps 2-3
    of the pipeline; one shuffle)."""
    return _versions_from_collapsed(obs, key, ts, attr)


def customer_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each customer's order priority: orders are the
    change feed (one observation per order day, min-orderkey wins the
    day), compacted to actual changes and versioned."""
    feed = _orders_feed(spark, sf_dir)
    hist = scd2_versions(feed, "o_custkey", "change_date", "o_orderpriority", "o_orderkey")
    return hist.select(
        F.col("o_custkey").alias("custkey"),
        "version_no",
        "valid_from",
        "valid_to",
        F.col("o_orderpriority").alias("priority"),
        "is_current",
    )


# CTE block shared by the history oracle and the AS-OF join oracle.
SCD2_CTES = """collapsed AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE) AS change_date,
         arg_min(o_orderpriority, o_orderkey) AS o_orderpriority
  FROM orders
  GROUP BY o_custkey, CAST(o_orderdate AS DATE)
),
ch AS (
  SELECT *,
         LAG(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY change_date) AS prev
  FROM collapsed
),
compacted AS (
  SELECT o_custkey, change_date, o_orderpriority
  FROM ch
  WHERE prev IS NULL OR prev <> o_orderpriority
),
scd2_hist AS (
  SELECT o_custkey AS custkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY change_date) AS version_no,
         change_date AS valid_from,
         LEAD(change_date) OVER (PARTITION BY o_custkey ORDER BY change_date) AS valid_to,
         o_orderpriority AS priority,
         LEAD(change_date) OVER (PARTITION BY o_custkey ORDER BY change_date) IS NULL
           AS is_current
  FROM compacted
)"""

SCD2_SQL = f"""
WITH {SCD2_CTES}
SELECT custkey, version_no, valid_from, valid_to, priority, is_current FROM scd2_hist
"""


def priority_asof_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (AS OF) fact→dimension join: each lineitem picks up the
    customer's priority version valid at its ship date.

    This is the read side of SCD2 and a distinct kernel from the
    union+window as-of (operators/events.asof_last_error): an equi-join
    on the dimension key with the validity interval as a *residual*
    predicate. Versions per key are few, so the residual filters a
    handful of candidate rows per probe — no range-join explosion, and
    the plan is a plain shuffle/broadcast hash join at any scale.
    Intervals tile and never overlap (tested), so at most one version
    matches; facts before the first version keep NULLs via the left
    join."""
    li = load_tables(spark, sf_dir, ("lineitem", "orders"))
    facts = (
        li["lineitem"]
        .select("l_orderkey", "l_linenumber", F.col("l_shipdate").cast("date").alias("ship_date"))
        .join(li["orders"].select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
    )
    hist = customer_priority_history(spark, sf_dir)
    cond = (
        (facts["o_custkey"] == hist["custkey"])
        & (hist["valid_from"] <= facts["ship_date"])
        & (hist["valid_to"].isNull() | (facts["ship_date"] < hist["valid_to"]))
    )
    return facts.join(hist, cond, "left").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("o_custkey").alias("custkey"),
        "ship_date",
        F.col("priority").alias("priority_at_ship"),
        "version_no",
    )


ASOF_SHIP_SQL = f"""
WITH {SCD2_CTES},
f AS (
  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
         CAST(l.l_shipdate AS DATE) AS ship_date
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT f.l_orderkey AS orderkey,
       f.l_linenumber AS linenumber,
       f.o_custkey AS custkey,
       f.ship_date,
       h.priority AS priority_at_ship,
       h.version_no
FROM f LEFT JOIN scd2_hist h
  ON f.o_custkey = h.custkey
 AND h.valid_from <= f.ship_date
 AND (h.valid_to IS NULL OR f.ship_date < h.valid_to)
"""


def _orders_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("change_date"),
        "o_orderpriority",
        "o_orderkey",
    )


_INCR_CUT = "1996-01-01"


def scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 history computed INCREMENTALLY — base history from orders
    before {cut}, then the later orders merged as a CDC batch — with the
    full-recompute SQL as its oracle, so the driver hash-certifies that
    the incremental maintenance path is bit-equal to recomputation."""
    feed = _orders_feed(spark, sf_dir)
    base = scd2_versions(
        feed.filter(F.col("change_date") < F.lit(_INCR_CUT)),
        "o_custkey", "change_date", "o_orderpriority", "o_orderkey",
    )
    merged = scd2_apply_increment(
        base,
        feed.filter(F.col("change_date") >= F.lit(_INCR_CUT)),
        "o_custkey", "change_date", "o_orderpriority", "o_orderkey",
    )
    return merged.select(
        F.col("o_custkey").alias("custkey"),
        "version_no",
        "valid_from",
        "valid_to",
        F.col("o_orderpriority").alias("priority"),
        "is_current",
    )


def scd2_outoforder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 history maintained through the OBSERVATION STORE with
    batches applied in reverse time order — the newest orders seed the
    store, then everything earlier lands as one big retro-insert batch
    (the case the compacted path's contract excludes). The oracle is the
    same full-recompute SQL as the other SCD2 entries, so the driver
    hash-certifies that out-of-order maintenance is bit-equal to
    recomputation."""
    feed = _orders_feed(spark, sf_dir)
    args = ("o_custkey", "change_date", "o_orderpriority", "o_orderkey")
    obs = scd2_observations(feed.filter(F.col("change_date") >= F.lit(_INCR_CUT)), *args)
    obs = scd2_obs_apply(obs, feed.filter(F.col("change_date") < F.lit(_INCR_CUT)), *args)
    hist = scd2_versions_from_observations(obs, "o_custkey", "change_date", "o_orderpriority")
    return hist.select(
        F.col("o_custkey").alias("custkey"),
        "version_no",
        "valid_from",
        "valid_to",
        F.col("o_orderpriority").alias("priority"),
        "is_current",
    )


def priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-transition matrix over the SCD2 history — the temporal
    analysis the versioned dim exists to serve: for every consecutive
    version pair per customer, count (from_priority → to_priority)
    transitions and the exact day gaps between changes (total as pure
    integer, mean as ONE division). Downstream this is the Markov/churn
    matrix; upstream it reuses the driver-certified history kernel, so
    the entry certifies the composition history → lag-pairing →
    transition aggregate.

    Scale shape: one lag window over (custkey, version_no) — the history
    table is already the compacted change set, orders of magnitude
    smaller than the fact feed — then a map-side-combinable aggregate on
    the tiny (from, to) key space."""
    hist = customer_priority_history(spark, sf_dir)
    w = Window.partitionBy("custkey").orderBy("version_no")
    paired = hist.select(
        "custkey",
        "valid_from",
        "priority",
        F.lag("priority").over(w).alias("from_priority"),
        F.lag("valid_from").over(w).alias("prev_from"),
    ).filter(F.col("from_priority").isNotNull())
    return paired.groupBy(
        "from_priority", F.col("priority").alias("to_priority")
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.datediff("valid_from", "prev_from")).alias("total_gap_days"),
        (
            F.sum(F.datediff("valid_from", "prev_from")) / F.count(F.lit(1))
        ).alias("mean_gap_days"),
    )


PRIORITY_TRANSITIONS_SQL = f"""
WITH {SCD2_CTES},
paired AS (
  SELECT custkey, valid_from, priority,
         LAG(priority) OVER w AS from_priority,
         LAG(valid_from) OVER w AS prev_from
  FROM scd2_hist
  WINDOW w AS (PARTITION BY custkey ORDER BY version_no)
)
SELECT from_priority, priority AS to_priority,
       COUNT(*) AS n_transitions,
       CAST(SUM(date_diff('day', prev_from, valid_from)) AS BIGINT)
         AS total_gap_days,
       CAST(CAST(SUM(date_diff('day', prev_from, valid_from)) AS BIGINT) AS DOUBLE)
         / COUNT(*) AS mean_gap_days
FROM paired
WHERE from_priority IS NOT NULL
GROUP BY from_priority, to_priority
"""


registry.register("orders_scd2_priority_history", customer_priority_history, SCD2_SQL)
registry.register("orders_priority_transitions", priority_transitions, PRIORITY_TRANSITIONS_SQL)
registry.register("orders_scd2_outoforder", scd2_outoforder, SCD2_SQL)
registry.register("orders_priority_asof_ship", priority_asof_ship, ASOF_SHIP_SQL)
registry.register("orders_scd2_incremental", scd2_incremental, SCD2_SQL)


# --- Change-data-feed generation (snapshot diff) ---------------------------
# The PRODUCER side of the CDC story: everything above CONSUMES a change
# feed (scd2_apply_increment, the observation store); this operator
# GENERATES one by diffing two table snapshots — the Delta/Iceberg
# "change data feed" read, expressed as a full-outer join on the primary
# key with row-compare residuals. The driver corpus has one immutable
# orders table, so snapshot B is derived from A by a deterministic
# mutation (bump priority for o_orderkey % CDF_UPDATE_MOD, drop
# o_orderkey % CDF_DELETE_MOD, synthesize inserts above the max key) —
# both engines replay the identical mutation, so the diff itself is
# hash-certified.

CDF_UPDATE_MOD = 97
CDF_DELETE_MOD = 101
CDF_INSERTS = 50


def snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, change_type ∈ insert|update|delete, old_priority,
    new_priority): the minimal change feed that replays snapshot A into
    snapshot B. Unchanged rows produce NO output — the property that
    makes a change feed cheaper to ship than the table.

    Scale shape: one key-partitioned full-outer hash join + residual
    compare; output ∝ changed rows. At 100 TB with date-partitioned
    tables the join prunes to touched partitions first."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.select("o_orderkey", F.col("o_orderpriority").alias("prio"))
    maxk = o.agg(F.max("o_orderkey").alias("mk"))
    inserts = (
        maxk.crossJoin(
            spark.range(1, CDF_INSERTS + 1).select(F.col("id").alias("i"))
        )
        .select(
            (F.col("mk") + F.col("i")).alias("o_orderkey"),
            F.lit("NEW-ROW").alias("prio"),
        )
    )
    b = (
        a.filter(F.col("o_orderkey") % CDF_DELETE_MOD != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % CDF_UPDATE_MOD == 0, F.lit("BUMPED"))
            .otherwise(F.col("prio"))
            .alias("prio"),
        )
        .unionByName(inserts)
    )
    av = a.select("o_orderkey", F.col("prio").alias("old_priority"))
    bv = b.select("o_orderkey", F.col("prio").alias("new_priority"))
    j = av.join(bv, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_priority").isNull(), F.lit("insert"))
        .when(F.col("new_priority").isNull(), F.lit("delete"))
        .when(F.col("old_priority") != F.col("new_priority"), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select("o_orderkey", "change_type", "old_priority", "new_priority")
    )


CHANGE_FEED_SQL = f"""
WITH a AS (SELECT o_orderkey, o_orderpriority AS prio FROM orders),
mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
inserts AS (
  SELECT mk.mk + i AS o_orderkey, 'NEW-ROW' AS prio
  FROM mk, range(1, {CDF_INSERTS + 1}) t(i)
),
b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {CDF_UPDATE_MOD} = 0 THEN 'BUMPED' ELSE prio END AS prio
  FROM a WHERE o_orderkey % {CDF_DELETE_MOD} <> 0
  UNION ALL
  SELECT o_orderkey, prio FROM inserts
),
j AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         a.prio AS old_priority, b.prio AS new_priority
  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN old_priority IS NULL THEN 'insert'
            WHEN new_priority IS NULL THEN 'delete'
            WHEN old_priority <> new_priority THEN 'update'
       END AS change_type,
       old_priority, new_priority
FROM j
WHERE (old_priority IS NULL) OR (new_priority IS NULL)
   OR (old_priority <> new_priority)
"""


registry.register("orders_change_feed", snapshot_change_feed, CHANGE_FEED_SQL)
