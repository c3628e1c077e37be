"""The reference's 20 OLAP analysis queries, Spark-first.

Each query q01–q20 from /root/reference/Analysis_Queries.sql is expressed
twice, side by side so the dialects cannot drift:

- ``spark``: a DataFrame function over the star tables from
  :mod:`..plans.star` (J3 star joins → broadcast-hash; aggregations are
  hash-aggregates with map-side partials; top-k compiles to
  TakeOrderedAndProject).
- ``oracle``: the equivalent DuckDB SQL (query body only — the star CTE
  prefix from ``star.with_star`` is prepended by the harness), which the
  driver runs differentially at sf0.01.

Determinism rules for hash-exact oracle matches:
- money is DECIMAL(18,2) end-to-end and summed as decimal (exact,
  order-independent); only the final aggregate is cast to double;
- every ORDER BY that feeds a LIMIT carries full tie-break keys;
- averages are written as sum/count (a single IEEE division) because
  engine-native AVG types differ;
- ROLLUP null-subtotal keys are COALESCEd to -1 so integer columns stay
  non-nullable across both engines.

Queries the reference declared but left blank (q09, q12, q15, q19 —
Analysis_Queries.sql:78,107,126,166) are implemented here with documented
semantics (SURVEY.md §2.5): q09 month-over-month growth via a lag window,
q12 customer spend deciles via ntile, q15 monthly-revenue volatility via an
exact-decimal variance computation, q19 top-10 customer lifetime value.

MySQL-dialect deviations (SURVEY.md §7): the reference compares lowercase
day/month names under a case-insensitive collation (Analysis_Queries.sql:83,
97,151-159); we implement the author's intent with ``lower()``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .star import CURRENT_DATE, CURRENT_YEAR

Star = dict[str, DataFrame]


@dataclass(frozen=True)
class AnalysisQuery:
    name: str
    description: str
    spark: Callable[[Star], DataFrame]
    oracle: str | None  # query body; None → rows-only check


def _money(alias: str) -> F.Column:
    return F.sum("purchase_amount").cast("double").alias(alias)


_MONEY = "CAST(SUM(purchase_amount) AS DOUBLE)"


def _fact_prod_time(star: Star) -> DataFrame:
    return (
        star["salefact"]
        .join(F.broadcast(star["product_dim"]), "product_id")
        .join(F.broadcast(star["time_dim"]), "date_id")
    )


def _fact_cust(star: Star) -> DataFrame:
    return star["salefact"].join(F.broadcast(star["customer_dim"]), "customer_id")


def _day_type(col: str = "day_of_week", lower: bool = False) -> F.Column:
    c = F.col(col)
    if lower:
        return F.when(F.lower(c).isin("saturday", "sunday"), "weekend").otherwise("weekday")
    return F.when(c.isin("Saturday", "Sunday"), "weekend").otherwise("weekday")


def q01(star: Star) -> DataFrame:
    """Top 5 (product, month, day-type) cells by revenue for the current year
    (Analysis_Queries.sql:3-15)."""
    return (
        _fact_prod_time(star)
        .filter(F.col("year") == CURRENT_YEAR)
        .withColumn("day_type", _day_type())
        .groupBy("product_id", "product_category", "month", "day_type")
        .agg(_money("total_revenue"))
        .orderBy(F.desc("total_revenue"), "product_id", "month", "day_type")
        .limit(5)
    )


Q01_SQL = f"""
SELECT product_id, product_category, month,
       CASE WHEN day_of_week IN ('Saturday','Sunday') THEN 'weekend' ELSE 'weekday' END AS day_type,
       {_MONEY} AS total_revenue
FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
WHERE year = {CURRENT_YEAR}
GROUP BY product_id, product_category, month, day_type
ORDER BY total_revenue DESC, product_id, month, day_type
LIMIT 5
"""


def q02(star: Star) -> DataFrame:
    """Total purchase by gender, age, city category (Analysis_Queries.sql:17-22)."""
    return (
        _fact_cust(star)
        .groupBy("gender", "age", "city_category")
        .agg(_money("total_purchase"))
    )


Q02_SQL = f"""
SELECT gender, age, city_category, {_MONEY} AS total_purchase
FROM salefact JOIN customer_dim USING (customer_id)
GROUP BY gender, age, city_category
"""


def q03(star: Star) -> DataFrame:
    """Sales per product category by customer occupation (Analysis_Queries.sql:24-29)."""
    return (
        _fact_cust(star)
        .join(F.broadcast(star["product_dim"]), "product_id")
        .groupBy("product_category", "occupation")
        .agg(_money("total_sales"))
    )


Q03_SQL = f"""
SELECT product_category, occupation, {_MONEY} AS total_sales
FROM salefact JOIN customer_dim USING (customer_id) JOIN product_dim USING (product_id)
GROUP BY product_category, occupation
"""


def q04(star: Star) -> DataFrame:
    """Quarterly purchase by gender and age, current year (Analysis_Queries.sql:31-41)."""
    return (
        _fact_cust(star)
        .join(F.broadcast(star["time_dim"]), "date_id")
        .filter(F.col("year") == CURRENT_YEAR)
        .groupBy("gender", "age", "quarter")
        .agg(_money("total_purchase"))
    )


Q04_SQL = f"""
SELECT gender, age, quarter, {_MONEY} AS total_purchase
FROM salefact JOIN customer_dim USING (customer_id) JOIN time_dim USING (date_id)
WHERE year = {CURRENT_YEAR}
GROUP BY gender, age, quarter
"""


def q05(star: Star) -> DataFrame:
    """Top 5 rows of (category, occupation) sales ordered by category then
    sales (Analysis_Queries.sql:43-50 — LIMIT applies after the category
    sort, faithfully mirrored)."""
    return (
        _fact_cust(star)
        .join(F.broadcast(star["product_dim"]), "product_id")
        .groupBy("product_category", "occupation")
        .agg(_money("total_sales"))
        .orderBy("product_category", F.desc("total_sales"), "occupation")
        .limit(5)
    )


Q05_SQL = f"""
SELECT product_category, occupation, {_MONEY} AS total_sales
FROM salefact JOIN customer_dim USING (customer_id) JOIN product_dim USING (product_id)
GROUP BY product_category, occupation
ORDER BY product_category, total_sales DESC, occupation
LIMIT 5
"""


def q06(star: Star) -> DataFrame:
    """Purchases by city category and marital status over the past 6 months
    from the anchor date (Analysis_Queries.sql:52-59)."""
    return (
        _fact_cust(star)
        .join(F.broadcast(star["time_dim"]), "date_id")
        .filter(F.col("full_date") >= F.add_months(F.lit(CURRENT_DATE).cast("date"), -6))
        .groupBy("city_category", "marital_status", "month")
        .agg(_money("total_purchase"))
    )


Q06_SQL = f"""
SELECT city_category, marital_status, month, {_MONEY} AS total_purchase
FROM salefact JOIN customer_dim USING (customer_id) JOIN time_dim USING (date_id)
WHERE full_date >= DATE '{CURRENT_DATE}' - INTERVAL 6 MONTH
GROUP BY city_category, marital_status, month
"""


def q07(star: Star) -> DataFrame:
    """Average purchase by city tenure and gender (Analysis_Queries.sql:61-66).
    Written as sum/count so both engines produce the identical double."""
    return (
        _fact_cust(star)
        .groupBy("stay_in_current_city_years", "gender")
        .agg(
            (F.sum("purchase_amount").cast("double") / F.count(F.lit(1))).alias("avg_purchase")
        )
    )


Q07_SQL = """
SELECT stay_in_current_city_years, gender,
       CAST(SUM(purchase_amount) AS DOUBLE) / COUNT(*) AS avg_purchase
FROM salefact JOIN customer_dim USING (customer_id)
GROUP BY stay_in_current_city_years, gender
"""


def q08(star: Star) -> DataFrame:
    """Top 5 (city category, product category) cells by revenue
    (Analysis_Queries.sql:68-76)."""
    return (
        _fact_cust(star)
        .join(F.broadcast(star["product_dim"]), "product_id")
        .groupBy("city_category", "product_category")
        .agg(_money("total_revenue"))
        .orderBy(F.desc("total_revenue"), "city_category", "product_category")
        .limit(5)
    )


Q08_SQL = f"""
SELECT city_category, product_category, {_MONEY} AS total_revenue
FROM salefact JOIN customer_dim USING (customer_id) JOIN product_dim USING (product_id)
GROUP BY city_category, product_category
ORDER BY total_revenue DESC, city_category, product_category
LIMIT 5
"""


def q09(star: Star) -> DataFrame:
    """Month-over-month sales growth %% per product category, current year
    (declared blank at Analysis_Queries.sql:78-79; implemented per SURVEY.md
    §2.5 with a lag window)."""
    monthly = (
        _fact_prod_time(star)
        .filter(F.col("year") == CURRENT_YEAR)
        .withColumn("month_num", F.month("full_date").cast("long"))
        .groupBy("product_category", "month_num")
        .agg(_money("revenue"))
    )
    w = Window.partitionBy("product_category").orderBy("month_num")
    return (
        monthly.withColumn("prev_revenue", F.lag("revenue").over(w))
        .filter(F.col("prev_revenue").isNotNull())
        .select(
            "product_category",
            "month_num",
            "prev_revenue",
            "revenue",
            (((F.col("revenue") - F.col("prev_revenue")) / F.col("prev_revenue")) * 100).alias(
                "growth_pct"
            ),
        )
    )


Q09_SQL = f"""
WITH monthly AS (
  SELECT product_category, CAST(month(full_date) AS BIGINT) AS month_num,
         {_MONEY} AS revenue
  FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
  WHERE year = {CURRENT_YEAR}
  GROUP BY product_category, month_num
), lagged AS (
  SELECT product_category, month_num,
         lag(revenue) OVER (PARTITION BY product_category ORDER BY month_num) AS prev_revenue,
         revenue
  FROM monthly
)
SELECT product_category, month_num, prev_revenue, revenue,
       ((revenue - prev_revenue) / prev_revenue) * 100 AS growth_pct
FROM lagged WHERE prev_revenue IS NOT NULL
"""


def q10(star: Star) -> DataFrame:
    """Weekend-vs-weekday sales by age group, current year
    (Analysis_Queries.sql:81-89; lowercase day names per the reference's
    ci-collation intent)."""
    return (
        _fact_cust(star)
        .join(F.broadcast(star["time_dim"]), "date_id")
        .filter(F.col("year") == CURRENT_YEAR)
        .withColumn("day_type", _day_type(lower=True))
        .groupBy("age", "day_type")
        .agg(_money("total_sales"))
    )


Q10_SQL = f"""
SELECT age,
       CASE WHEN lower(day_of_week) IN ('saturday','sunday') THEN 'weekend' ELSE 'weekday' END AS day_type,
       {_MONEY} AS total_sales
FROM salefact JOIN customer_dim USING (customer_id) JOIN time_dim USING (date_id)
WHERE year = {CURRENT_YEAR}
GROUP BY age, day_type
"""


def q11(star: Star) -> DataFrame:
    """Top 5 (category, month, day-type) revenue cells, current year
    (Analysis_Queries.sql:91-105)."""
    return (
        _fact_prod_time(star)
        .filter(F.col("year") == CURRENT_YEAR)
        .withColumn("day_type", _day_type(lower=True))
        .groupBy("product_category", "month", "day_type")
        .agg(_money("total_revenue"))
        .orderBy(F.desc("total_revenue"), "product_category", "month", "day_type")
        .limit(5)
    )


Q11_SQL = f"""
SELECT product_category, month,
       CASE WHEN lower(day_of_week) IN ('saturday','sunday') THEN 'weekend' ELSE 'weekday' END AS day_type,
       {_MONEY} AS total_revenue
FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
WHERE year = {CURRENT_YEAR}
GROUP BY product_category, month, day_type
ORDER BY total_revenue DESC, product_category, month, day_type
LIMIT 5
"""


def q12(star: Star) -> DataFrame:
    """Customer spend deciles (declared blank at Analysis_Queries.sql:107;
    defined as: decile customers by lifetime spend, report each decile's
    size and revenue share inputs). Uses the distributed ntile from
    operators/ranking — ``Window.orderBy`` without a partition key would
    sort every customer on one task (see operators/ranking.py)."""
    from ..operators.ranking import scalable_ntile

    spend = (
        star["salefact"]
        .groupBy("customer_id")
        .agg(_money("total_spend"))
    )
    deciled = scalable_ntile(
        spend, [F.desc("total_spend"), F.col("customer_id")], 10, bucket_col="decile"
    )
    return deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        # DECIMAL out: a double cast of the per-decile sum diverges 1 ULP
        # between Spark and DuckDB at scaled magnitudes (VERDICT r12 #1).
        F.sum(F.col("total_spend").cast("decimal(18,2)")).alias("decile_revenue"),
    )


Q12_SQL = """
WITH spend AS (
  SELECT customer_id, CAST(SUM(purchase_amount) AS DOUBLE) AS total_spend
  FROM salefact GROUP BY customer_id
), ranked AS (
  SELECT customer_id, total_spend,
         CAST(ntile(10) OVER (ORDER BY total_spend DESC, customer_id) AS BIGINT) AS decile
  FROM spend
)
SELECT decile, COUNT(*) AS n_customers,
       SUM(CAST(total_spend AS DECIMAL(18,2))) AS decile_revenue
FROM ranked GROUP BY decile
"""


def q13(star: Star) -> DataFrame:
    """Supplier sales contribution by store and product
    (Analysis_Queries.sql:109-115). Presentation-only sort omitted — the
    correctness hash is order-insensitive and a full sort is a pure-cost
    shuffle at scale."""
    return (
        star["salefact"]
        .join(F.broadcast(star["product_dim"]), "product_id")
        .groupBy(
            "store_id", "store_name", "supplier_id", "supplier_name",
            "product_id", "product_category",
        )
        .agg(_money("total_sales"))
    )


Q13_SQL = f"""
SELECT store_id, store_name, supplier_id, supplier_name, product_id, product_category,
       {_MONEY} AS total_sales
FROM salefact JOIN product_dim USING (product_id)
GROUP BY store_id, store_name, supplier_id, supplier_name, product_id, product_category
"""


def q14(star: Star) -> DataFrame:
    """Seasonal product sales drill-down (Analysis_Queries.sql:117-124)."""
    return (
        _fact_prod_time(star)
        .groupBy("product_id", "product_category", "season")
        .agg(_money("total_sales"))
    )


Q14_SQL = f"""
SELECT product_id, product_category, season, {_MONEY} AS total_sales
FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
GROUP BY product_id, product_category, season
"""


def q15(star: Star) -> DataFrame:
    """Store/supplier monthly revenue volatility (declared blank at
    Analysis_Queries.sql:126; defined as the sample standard deviation of
    monthly revenue per (store, supplier)). Computed from exact decimal
    sums — sum and sum-of-squares — so the oracle matches bit-for-bit;
    engine-native STDDEV over doubles is partition-order dependent."""
    monthly = (
        _fact_prod_time(star)
        .withColumn("month_num", F.month("full_date").cast("long"))
        .groupBy("store_id", "supplier_id", "year", "month_num")
        .agg((F.sum("purchase_amount") * 100).cast("long").alias("rev_c"))  # exact cents
    )
    rev_d = F.col("rev_c").cast("decimal(19,0)")
    per_group = (
        monthly.groupBy("store_id", "supplier_id")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.sum("rev_c").alias("s1"),
            F.sum(rev_d * rev_d).alias("s2"),  # decimal(38,0), exact
        )
        .filter(F.col("n_months") > 1)
    )
    n = F.col("n_months")
    s1d = F.col("s1").cast("decimal(19,0)")
    # n·Σx² − (Σx)² stays in exact decimal arithmetic; one cast to double at
    # the end, then scalar IEEE ops — bit-identical across engines.
    num = (F.col("s2") * n - s1d * s1d).cast("double")
    return per_group.select(
        "store_id",
        "supplier_id",
        "n_months",
        (F.sqrt(num / (n * (n - 1))) / 100).alias("monthly_revenue_volatility"),
    )


Q15_SQL = """
WITH monthly AS (
  SELECT store_id, supplier_id, year, CAST(month(full_date) AS BIGINT) AS month_num,
         CAST(SUM(purchase_amount) * 100 AS BIGINT) AS rev_c
  FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
  GROUP BY store_id, supplier_id, year, month_num
), per_group AS (
  SELECT store_id, supplier_id,
         COUNT(*) AS n_months,
         CAST(SUM(rev_c) AS HUGEINT) AS s1,
         SUM(CAST(rev_c AS HUGEINT) * CAST(rev_c AS HUGEINT)) AS s2
  FROM monthly GROUP BY store_id, supplier_id
)
SELECT store_id, supplier_id, n_months,
       sqrt(CAST(s2 * n_months - s1 * s1 AS DOUBLE) / (n_months * (n_months - 1))) / 100
         AS monthly_revenue_volatility
FROM per_group WHERE n_months > 1
"""


# Delegation threshold for q16 (VERDICT r9 #3): above this many bytes of
# scanned input the faithful theta self-join honestly sort-spills (9.4 GB
# at the 50×-of-sf0.1 ≈ sf5 probe), so q16 routes through the join-free
# onepass basket kernel, which computes the IDENTICAL result (pair
# multiplicity preserved — same oracle, so the delegation is invisible to
# correctness at any SF). ~500 MB of parquet ≈ sf3.5's star input; the
# driver SFs (≤ sf0.1, ~14 MB) keep the reference-parity self-join plan.
Q16_ONEPASS_BYTES = 500_000_000


def _local_scan_bytes(df: DataFrame) -> int:
    """Total on-disk size of the local files feeding a DataFrame's scans —
    a zero-job SF proxy for plan delegation. Non-file sources (JDBC,
    views over streams) report 0: delegation then stays off and the
    faithful plan runs, which is the conservative default; a cluster
    deployment overrides via Q16_ONEPASS_BYTES-style env configuration.
    Persisted DataFrames hide their scans behind InMemoryRelation, so
    star_tables stamps ``_graft_scan_bytes`` pre-persist and it wins."""
    import os

    stamped = getattr(df, "_graft_scan_bytes", None)
    if stamped is not None:
        return stamped
    total = 0
    for uri in df.inputFiles():
        path = uri[5:] if uri.startswith("file:") else uri
        try:
            total += os.path.getsize(path)
        except OSError:
            pass
    return total


def _pair_partitions(star: Star) -> int:
    """Partition count for the market-basket pair re-aggregation. The
    distinct-pair hash state grows ∝ corpus (~90M pairs at the 100×
    probe) while the session's shuffle partitions stay fixed, so at 32
    partitions each reduce task's aggregation map outgrows its memory
    share and spill-merges. One partition per ~8 MB of scanned fact
    keeps every task's map a few MB at any SF — the same data-adaptive
    knee discipline as the IVF nlist / LSH plane depth. Rates, floor,
    and cap come from the deployment profile (profile.knee_profile);
    the defaults reproduce the tuned single-host plans byte-for-byte."""
    from ..profile import knee_profile

    return knee_profile().partitions(_local_scan_bytes(star["salefact"]))


def q16(star: Star) -> DataFrame:
    """Top 5 product pairs purchased together (Analysis_Queries.sql:128-137):
    self-join on order_id with a ``<`` theta residual — equi on the order
    key plus a range filter, exactly how Catalyst plans it.

    Above Q16_ONEPASS_BYTES of scanned input this delegates to
    :func:`star_basket_onepass` — the counts-grain kernel whose result
    (and oracle) are identical, but which joins the reduced per-(order,
    product) multiplicities instead of raw rows and knee-partitions the
    pair re-aggregation (the faithful raw-row plan sort-spills 9.4 GB at
    the 50× probe; the kernel's sorts are megabytes per task)."""
    import os

    env = os.environ.get("Q16_ONEPASS_BYTES")
    threshold = int(env) if env else Q16_ONEPASS_BYTES
    if _local_scan_bytes(star["salefact"]) > threshold:
        return star_basket_onepass(star)
    f = star["salefact"].select("order_id", "product_id")
    a, b = f.alias("a"), f.alias("b")
    return (
        a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("product_01"),
            F.col("b.product_id").alias("product_02"),
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.desc("pair_count"), "product_01", "product_02")
        .limit(5)
    )


Q16_SQL = """
SELECT a.product_id AS product_01, b.product_id AS product_02, COUNT(*) AS pair_count
FROM salefact a JOIN salefact b
  ON a.order_id = b.order_id AND a.product_id < b.product_id
GROUP BY a.product_id, b.product_id
ORDER BY pair_count DESC, product_01, product_02
LIMIT 5
"""


def q17(star: Star) -> DataFrame:
    """Yearly revenue ROLLUP over (store, supplier, product), current year
    (Analysis_Queries.sql:139-147). Subtotal NULL keys are stringified and
    coalesced to '-1' so the query is key-type-agnostic: the driver star
    uses integer ids, the reference warehouse string ids ('P00000010') —
    an integer sentinel would ANSI-cast-fail on the latter (found via
    demo.py, which replays the reference timeline with reference ids)."""
    rolled = (
        _fact_prod_time(star)
        .filter(F.col("year") == CURRENT_YEAR)
        .rollup("store_id", "supplier_id", "product_id")
        .agg(_money("total_revenue"))
    )
    return rolled.select(
        F.coalesce(F.col("store_id").cast("string"), F.lit("-1")).alias("store_id"),
        F.coalesce(F.col("supplier_id").cast("string"), F.lit("-1")).alias("supplier_id"),
        F.coalesce(F.col("product_id").cast("string"), F.lit("-1")).alias("product_id"),
        "total_revenue",
    )


Q17_SQL = f"""
SELECT COALESCE(CAST(store_id AS STRING), '-1') AS store_id,
       COALESCE(CAST(supplier_id AS STRING), '-1') AS supplier_id,
       COALESCE(CAST(product_id AS STRING), '-1') AS product_id,
       total_revenue
FROM (
  SELECT store_id, supplier_id, product_id, {_MONEY} AS total_revenue
  FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
  WHERE year = {CURRENT_YEAR}
  GROUP BY ROLLUP (store_id, supplier_id, product_id)
)
"""

_H1 = "('january','february','march','april','may','june')"
_H2 = "('july','august','september','october','november','december')"


def q18(star: Star) -> DataFrame:
    """H1/H2 revenue and volume per product (Analysis_Queries.sql:149-164;
    lowercase month-name lists per the ci-collation intent; absent halves
    coalesced to 0 so the sums stay non-null)."""
    h1 = F.lower(F.col("month")).isin(
        "january", "february", "march", "april", "may", "june"
    )
    zero_money = F.lit(0).cast("decimal(18,2)")
    return (
        _fact_prod_time(star)
        .groupBy("product_id")
        .agg(
            F.coalesce(F.sum(F.when(h1, F.col("purchase_amount"))), zero_money)
            .cast("double").alias("half_01_revenue"),
            F.coalesce(F.sum(F.when(~h1, F.col("purchase_amount"))), zero_money)
            .cast("double").alias("half_02_revenue"),
            _money("yearly_revenue"),
            F.coalesce(F.sum(F.when(h1, F.col("quantity"))), F.lit(0)).cast("long").alias("half_01_qty"),
            F.coalesce(F.sum(F.when(~h1, F.col("quantity"))), F.lit(0)).cast("long").alias("half_02_qty"),
            F.sum("quantity").cast("long").alias("yearly_qty"),
        )
    )


Q18_SQL = f"""
SELECT product_id,
       CAST(COALESCE(SUM(CASE WHEN lower(month) IN {_H1} THEN purchase_amount END), 0) AS DOUBLE) AS half_01_revenue,
       CAST(COALESCE(SUM(CASE WHEN lower(month) IN {_H2} THEN purchase_amount END), 0) AS DOUBLE) AS half_02_revenue,
       {_MONEY} AS yearly_revenue,
       CAST(COALESCE(SUM(CASE WHEN lower(month) IN {_H1} THEN quantity END), 0) AS BIGINT) AS half_01_qty,
       CAST(COALESCE(SUM(CASE WHEN lower(month) IN {_H2} THEN quantity END), 0) AS BIGINT) AS half_02_qty,
       CAST(SUM(quantity) AS BIGINT) AS yearly_qty
FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
GROUP BY product_id
"""


def q19(star: Star) -> DataFrame:
    """Top-10 customer lifetime value with segment (declared blank at
    Analysis_Queries.sql:166; defined as total spend + distinct orders per
    customer, top 10 by spend)."""
    return (
        _fact_cust(star)
        .groupBy("customer_id", "city_category")
        .agg(
            _money("total_spend"),
            F.countDistinct("order_id").alias("n_orders"),
        )
        .orderBy(F.desc("total_spend"), "customer_id")
        .limit(10)
    )


Q19_SQL = f"""
SELECT customer_id, city_category, {_MONEY} AS total_spend,
       COUNT(DISTINCT order_id) AS n_orders
FROM salefact JOIN customer_dim USING (customer_id)
GROUP BY customer_id, city_category
ORDER BY total_spend DESC, customer_id
LIMIT 10
"""


def q20(star: Star) -> DataFrame:
    """The store_quarterly_sales view body (Analysis_Queries.sql:168-176,
    the reference's only CREATE VIEW — S9). ``register_views`` exposes it
    as a temp view; here we return its contents."""
    return (
        _fact_prod_time(star)
        .groupBy("store_name", "quarter")
        .agg(_money("total_revenue"))
    )


Q20_SQL = f"""
SELECT store_name, quarter, {_MONEY} AS total_revenue
FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
GROUP BY store_name, quarter
"""


QUERIES: dict[str, AnalysisQuery] = {
    "q01_top5_product_daytype_revenue": AnalysisQuery(
        "q01_top5_product_daytype_revenue", q01.__doc__, q01, Q01_SQL),
    "q02_purchase_by_gender_age_city": AnalysisQuery(
        "q02_purchase_by_gender_age_city", q02.__doc__, q02, Q02_SQL),
    "q03_category_sales_by_occupation": AnalysisQuery(
        "q03_category_sales_by_occupation", q03.__doc__, q03, Q03_SQL),
    "q04_quarterly_purchase_gender_age": AnalysisQuery(
        "q04_quarterly_purchase_gender_age", q04.__doc__, q04, Q04_SQL),
    "q05_top_occupations_per_category": AnalysisQuery(
        "q05_top_occupations_per_category", q05.__doc__, q05, Q05_SQL),
    "q06_city_marital_past6months": AnalysisQuery(
        "q06_city_marital_past6months", q06.__doc__, q06, Q06_SQL),
    "q07_avg_purchase_stay_gender": AnalysisQuery(
        "q07_avg_purchase_stay_gender", q07.__doc__, q07, Q07_SQL),
    "q08_top5_city_category_revenue": AnalysisQuery(
        "q08_top5_city_category_revenue", q08.__doc__, q08, Q08_SQL),
    "q09_mom_growth_by_category": AnalysisQuery(
        "q09_mom_growth_by_category", q09.__doc__, q09, Q09_SQL),
    "q10_age_weekend_weekday_sales": AnalysisQuery(
        "q10_age_weekend_weekday_sales", q10.__doc__, q10, Q10_SQL),
    "q11_top5_category_month_daytype": AnalysisQuery(
        "q11_top5_category_month_daytype", q11.__doc__, q11, Q11_SQL),
    "q12_customer_spend_deciles": AnalysisQuery(
        "q12_customer_spend_deciles", q12.__doc__, q12, Q12_SQL),
    "q13_supplier_store_contribution": AnalysisQuery(
        "q13_supplier_store_contribution", q13.__doc__, q13, Q13_SQL),
    "q14_seasonal_product_sales": AnalysisQuery(
        "q14_seasonal_product_sales", q14.__doc__, q14, Q14_SQL),
    "q15_monthly_revenue_volatility": AnalysisQuery(
        "q15_monthly_revenue_volatility", q15.__doc__, q15, Q15_SQL),
    "q16_market_basket_pairs": AnalysisQuery(
        "q16_market_basket_pairs", q16.__doc__, q16, Q16_SQL),
    "q17_rollup_store_supplier_product": AnalysisQuery(
        "q17_rollup_store_supplier_product", q17.__doc__, q17, Q17_SQL),
    "q18_h1_h2_product_analysis": AnalysisQuery(
        "q18_h1_h2_product_analysis", q18.__doc__, q18, Q18_SQL),
    "q19_customer_lifetime_value": AnalysisQuery(
        "q19_customer_lifetime_value", q19.__doc__, q19, Q19_SQL),
    "q20_store_quarterly_sales_view": AnalysisQuery(
        "q20_store_quarterly_sales_view", q20.__doc__, q20, Q20_SQL),
}


def star_cube(star: Star) -> DataFrame:
    """CUBE over (store_id, quarter): all four grouping combinations in a
    single Expand pass — the reference only exercises ROLLUP (q17); CUBE
    completes the multi-dimensional subtotal surface. Subtotal NULL keys
    are coalesced to -1 (same convention as q17) so the integer columns
    stay non-nullable in both engines."""
    return (
        _fact_prod_time(star)
        .cube("store_id", "quarter")
        .agg(_money("total_sales"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce(F.col("store_id").cast("long"), F.lit(-1)).alias("store_id"),
            F.coalesce(F.col("quarter").cast("long"), F.lit(-1)).alias("quarter"),
            "total_sales",
            "n_rows",
        )
    )


STAR_CUBE_SQL = f"""
SELECT COALESCE(CAST(store_id AS BIGINT), -1) AS store_id,
       COALESCE(CAST(quarter AS BIGINT), -1) AS quarter,
       {_MONEY} AS total_sales,
       COUNT(*) AS n_rows
FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
GROUP BY CUBE (store_id, quarter)
"""


def star_rolling_revenue(star: Star) -> DataFrame:
    """Rolling 7-day revenue per store: daily decimal revenue, then a
    RANGE window over epoch-day (-6..0) — calendar-correct across date
    gaps, unlike a ROWS window. Partitioned by store, so the window sort
    is distributed (never the single-partition global-window cliff); the
    rolling sum stays DECIMAL until the final cast."""
    daily = (
        star["salefact"]
        .join(F.broadcast(star["product_dim"].select("product_id", "store_id")), "product_id")
        .join(F.broadcast(star["time_dim"].select("date_id", "full_date")), "date_id")
        .groupBy("store_id", "date_id", "full_date")
        .agg(F.sum("purchase_amount").alias("day_rev"))
        .withColumn("epoch_day", F.datediff(F.col("full_date"), F.lit("1970-01-01").cast("date")).cast("long"))
    )
    w = Window.partitionBy("store_id").orderBy("epoch_day").rangeBetween(-6, 0)
    return daily.select(
        "store_id",
        "date_id",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.sum("day_rev").over(w).cast("double").alias("rolling_7d_revenue"),
    )


STAR_ROLLING_SQL = """
WITH daily AS (
  SELECT store_id, date_id, full_date, SUM(purchase_amount) AS day_rev
  FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
  GROUP BY store_id, date_id, full_date
)
SELECT store_id, date_id,
       CAST(day_rev AS DOUBLE) AS day_revenue,
       CAST(SUM(day_rev) OVER (
              PARTITION BY store_id
              ORDER BY datediff('day', DATE '1970-01-01', full_date)
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS rolling_7d_revenue
FROM daily
"""


def star_pivot(star: Star) -> DataFrame:
    """Native pivot: quarterly revenue per product category as columns.
    The explicit value list ([1..4]) skips the extra distinct-scan job a
    bare ``pivot`` needs and fixes the output schema — which is what a
    100 TB plan wants anyway (one Expand-free aggregation pass, same
    physical shape as the manual CASE pivot of q18)."""
    pivoted = (
        _fact_prod_time(star)
        .groupBy("product_category")
        .pivot("quarter", [1, 2, 3, 4])
        .agg(F.sum("purchase_amount"))
    )
    return pivoted.select(
        "product_category",
        *[
            F.coalesce(F.col(str(q)), F.lit(0)).cast("double").alias(f"q{q}_revenue")
            for q in (1, 2, 3, 4)
        ],
    )


STAR_PIVOT_SQL = """
SELECT product_category,
       CAST(COALESCE(SUM(CASE WHEN quarter = 1 THEN purchase_amount END), 0) AS DOUBLE) AS q1_revenue,
       CAST(COALESCE(SUM(CASE WHEN quarter = 2 THEN purchase_amount END), 0) AS DOUBLE) AS q2_revenue,
       CAST(COALESCE(SUM(CASE WHEN quarter = 3 THEN purchase_amount END), 0) AS DOUBLE) AS q3_revenue,
       CAST(COALESCE(SUM(CASE WHEN quarter = 4 THEN purchase_amount END), 0) AS DOUBLE) AS q4_revenue
FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
GROUP BY product_category
"""


def star_store_stats(star: Star) -> DataFrame:
    """Distinct aggregation + exact median per store: COUNT(DISTINCT
    customer) forces the two-phase distinct-agg plan; the median is the
    exact interpolated percentile. At 100 TB the distinct-agg's partial
    dedup happens map-side; for the percentile, approx_percentile is the
    sketch-based drop-in when exactness isn't required."""
    df = star["salefact"].join(
        F.broadcast(star["product_dim"].select("product_id", "store_id")), "product_id"
    )
    return df.groupBy("store_id").agg(
        F.countDistinct("customer_id").alias("n_customers"),
        F.expr("percentile(CAST(purchase_amount AS DOUBLE), 0.5)").alias("median_sale"),
        _money("total_sales"),
    )


STAR_STORE_STATS_SQL = """
SELECT store_id,
       COUNT(DISTINCT customer_id) AS n_customers,
       quantile_cont(CAST(purchase_amount AS DOUBLE), 0.5) AS median_sale,
       CAST(SUM(purchase_amount) AS DOUBLE) AS total_sales
FROM salefact JOIN product_dim USING (product_id)
GROUP BY store_id
"""

# Sketch medians within 5% of the per-store p05–p95 spread.
STORE_MEDIAN_TOLERANCE = 0.05


def star_store_stats_approx(star: Star) -> DataFrame:
    """Driver-checkable accuracy gate for the sketch-median path:
    star_store_customer_stats' exact `percentile` buffers every group's
    values — the standard exact-median cliff at 100 TB — and
    `approx_percentile` (one-pass mergeable KLL-style summary, bounded
    state) is the scale drop-in. Per store: exact p50 via
    percentile_disc (actual data values, no interpolation — DuckDB's
    quantile_disc matches bit-for-bit) plus a boolean asserting the
    sketch landed within 5% of the p05–p95 spread. Same oracle trick as
    the HLL/quantile gates: the oracle pins the exact side and a
    constant true; a sketch regression flips the Spark boolean and the
    value hash goes red."""
    df = star["salefact"].join(
        F.broadcast(star["product_dim"].select("product_id", "store_id")), "product_id"
    )
    amt = "CAST(purchase_amount AS DOUBLE)"
    # Two deliberate design choices, both measured at sf0.1:
    # - one sort-buffering aggregate only (the oracled exact median);
    #   the tolerance scale comes from stddev — map-side combinable —
    #   instead of exact p05/p95, which would buffer twice more
    #   (0.15σ ≈ 5% of the p05–p95 spread of a unimodal distribution);
    # - COUNT(DISTINCT) kept in its OWN aggregation and joined back:
    #   mixing it with percentile_approx makes Catalyst's
    #   distinct-rewrite plan merge the KLL sketch once per distinct
    #   key (14 s vs 2 s here).
    agg = df.groupBy("store_id").agg(
        F.expr(f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {amt})").alias("median_disc"),
        F.stddev_samp(F.expr(amt)).alias("_sigma"),
        F.percentile_approx(F.expr(amt), 0.5, 10000).alias("_approx"),
    )
    ncust = df.groupBy("store_id").agg(
        F.countDistinct("customer_id").alias("n_customers")
    )
    tol = F.lit(3.0 * STORE_MEDIAN_TOLERANCE) * F.col("_sigma")
    return agg.join(ncust, "store_id").select(
        "store_id",
        "n_customers",
        "median_disc",
        (F.abs(F.col("_approx") - F.col("median_disc")) <= tol).alias("median_within_bound"),
    )


STAR_STORE_STATS_APPROX_SQL = """
SELECT store_id,
       COUNT(DISTINCT customer_id) AS n_customers,
       quantile_disc(CAST(purchase_amount AS DOUBLE), 0.5) AS median_disc,
       true AS median_within_bound
FROM salefact JOIN product_dim USING (product_id)
GROUP BY store_id
"""


GROUPING_SETS_SQL = """
SELECT COALESCE(CAST(store_id AS BIGINT), -1) AS store_id,
       COALESCE(season, 'ALL') AS season,
       CAST(SUM(purchase_amount) AS DOUBLE) AS total_sales
FROM salefact JOIN product_dim USING (product_id) JOIN time_dim USING (date_id)
GROUP BY GROUPING SETS ((store_id), (season))
"""


def star_grouping_sets(star: Star) -> DataFrame:
    """Arbitrary GROUPING SETS — ((store_id), (season)): two independent
    aggregations in ONE Expand pass over one scan, completing the grouping
    family next to q17's ROLLUP and the CUBE query. The DataFrame API only
    exposes rollup/cube, so this one IS the SQL form (SURVEY §3.2: every
    query exists as SQL; here SQL is the canonical form)."""
    spark = star["salefact"].sparkSession
    for name in ("salefact", "product_dim", "time_dim"):
        star[name].createOrReplaceTempView(name)
    return spark.sql(GROUPING_SETS_SQL)


def star_basket_onepass(star: Star) -> DataFrame:
    """q16's market-basket ranking in the one-shuffle shape that survives
    100 TB: the reference-parity theta self-join (q16) sorts the fact
    twice and its row-pair intermediate honestly sort-spills at the 50×
    probe (3.5 GB, NEXT.md r6 #7). Here each order's items aggregate
    once (map-side-combined), the i<j pairs expand from the per-order
    array with codegen lambdas, and pairs re-aggregate — no join, so
    there is nothing to sort-merge and nothing to spill but the final
    top-k. Pair multiplicity is preserved exactly (a product appearing
    c_a times pairs c_a·c_b ways), so the result — and the oracle — are
    identical to q16's. Pair-expansion compute is bounded by the max
    basket size squared, a data constant, and the heaviest basket lands
    in ONE row's array (AQE-splittable by order_id, never a hub
    partition).

    The naive shape's remaining spill (~3.3 GB disk at the 100× probe —
    partial collect_list buffers hitting ObjectHashAggregate's 128-key
    sort-based fallback, which re-sorts the whole input) is removed
    structurally, in two moves. (1) No object aggregation at all: the
    fact reduces to fixed-width per-(order, product) multiplicities — a
    codegen HashAggregate — and the i<j pairs come from a sort-merge
    SELF-join of that counts grain on order_id with the strict-< product
    residual; both legs are the same subtree over the same explicit
    Exchange, so ReuseExchange shuffles the fact ONCE. Pair multiplicity
    is exact: a product appearing c_a times pairs c_a·c_b ways, so the
    result — and the oracle — stay identical to q16's row-pair counting.
    Per-order expansion is bounded by the max distinct basket size
    squared, a data constant. (2) BOTH shuffles — the order_id exchange
    feeding agg+sort+join, and the pair re-aggregation whose hash state
    is ∝ corpus (~90M distinct pairs at 100×) — are partitioned by a
    scan-size knee instead of the session's fixed count, so every task's
    aggregation map and sort run stay a few MB at ANY SF and never
    spill-merge — the brief's "size shuffle partitions so state fits"
    rule applied per-operator, exactly like the IVF nlist / LSH plane
    knees. (At driver SFs the knee floors to the session count, so the
    exchange it introduces is the one EnsureRequirements would have
    inserted anyway.)"""
    n_parts = _pair_partitions(star)
    f = star["salefact"].select("order_id", "product_id")
    counts = (
        f.repartition(n_parts, "order_id")
        .groupBy("order_id", "product_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a, b = counts.alias("a"), counts.alias("b")
    pairs = a.join(
        b,
        (F.col("a.order_id") == F.col("b.order_id"))
        & (F.col("a.product_id") < F.col("b.product_id")),
    ).select(
        F.col("a.product_id").alias("product_01"),
        F.col("b.product_id").alias("product_02"),
        (F.col("a.c") * F.col("b.c")).alias("w"),
    )
    return (
        pairs.repartition(n_parts, "product_01", "product_02")
        .groupBy("product_01", "product_02")
        .agg(F.sum("w").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "product_01", "product_02")
        .limit(5)
    )


def star_basket_rules(star: Star) -> DataFrame:
    """Association rules over the market baskets — the analytical
    completion of the q16 family: for the top-20 co-purchased product
    pairs (distinct-per-order this time — rule semantics count ORDERS,
    not line multiplicity), emit support, confidence and lift from
    exact integer order counts (pair_orders, per-item orders_a/b,
    n_orders), each ratio ONE IEEE division so the doubles hash-match.

    Scale shape: identical to :func:`star_basket_onepass` — the DISTINCT
    reduces to the per-(order, product) grain (fixed-width codegen
    aggregate; at scale the ETL's own orders⋈lineitem shuffle leaves the
    cached fact already clustered by order_id, so it plans with zero
    exchanges), the i<j pairs come from a sort-merge self-join of that
    grain on order_id (megabytes of sort per task, no object
    aggregation anywhere), and the pair re-aggregation is partitioned by
    the scan-size knee so its ∝-corpus hash state never spill-merges.
    The 20-row top set then joins the item counts and the 1-row total —
    bounded constants. The oracle uses the faithful self-join form, so
    the hash also certifies kernel ≡ join equivalence at distinct
    grain."""
    n_parts = _pair_partitions(star)
    f = (
        star["salefact"]
        .select("order_id", "product_id")
        .repartition(n_parts, "order_id")
        .distinct()
    )
    tot = f.agg(F.count_distinct("order_id").alias("n_orders"))
    ic = f.groupBy("product_id").agg(F.count(F.lit(1)).alias("c"))
    a, b = f.alias("a"), f.alias("b")
    pairs = a.join(
        b,
        (F.col("a.order_id") == F.col("b.order_id"))
        & (F.col("a.product_id") < F.col("b.product_id")),
    ).select(
        F.col("a.product_id").alias("product_01"),
        F.col("b.product_id").alias("product_02"),
    )
    top = (
        pairs.repartition(n_parts, "product_01", "product_02")
        .groupBy("product_01", "product_02")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .orderBy(F.desc("pair_orders"), "product_01", "product_02")
        .limit(20)
    )
    ia = ic.select(F.col("product_id").alias("product_01"), F.col("c").alias("orders_a"))
    ib = ic.select(F.col("product_id").alias("product_02"), F.col("c").alias("orders_b"))
    out = top.join(ia, "product_01").join(ib, "product_02").crossJoin(
        F.broadcast(tot)
    )
    return out.select(
        "product_01",
        "product_02",
        F.col("pair_orders").cast("long").alias("pair_orders"),
        F.col("orders_a").cast("long").alias("orders_a"),
        F.col("orders_b").cast("long").alias("orders_b"),
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.col("pair_orders").cast("double") / F.col("n_orders")).alias("support"),
        (F.col("pair_orders").cast("double") / F.col("orders_a")).alias("confidence"),
        (
            (F.col("pair_orders") * F.col("n_orders")).cast("double")
            / (F.col("orders_a") * F.col("orders_b"))
        ).alias("lift"),
    )


STAR_BASKET_RULES_SQL = """
WITH b AS (SELECT DISTINCT order_id, product_id FROM salefact),
n AS (SELECT COUNT(DISTINCT order_id) AS n_orders FROM b),
ic AS (SELECT product_id, COUNT(*) AS c FROM b GROUP BY product_id),
pc AS (
  SELECT a.product_id AS product_01, b2.product_id AS product_02,
         COUNT(*) AS pair_orders
  FROM b a JOIN b b2
    ON a.order_id = b2.order_id AND a.product_id < b2.product_id
  GROUP BY a.product_id, b2.product_id
),
top AS (
  SELECT * FROM pc ORDER BY pair_orders DESC, product_01, product_02 LIMIT 20
)
SELECT t.product_01, t.product_02,
       CAST(t.pair_orders AS BIGINT) AS pair_orders,
       CAST(ia.c AS BIGINT) AS orders_a,
       CAST(ib.c AS BIGINT) AS orders_b,
       CAST(n.n_orders AS BIGINT) AS n_orders,
       CAST(t.pair_orders AS DOUBLE) / n.n_orders AS support,
       CAST(t.pair_orders AS DOUBLE) / ia.c AS confidence,
       CAST(t.pair_orders * n.n_orders AS DOUBLE) / (ia.c * ib.c) AS lift
FROM top t
JOIN ic ia ON ia.product_id = t.product_01
JOIN ic ib ON ib.product_id = t.product_02
CROSS JOIN n
"""


QUERIES.update(
    {
        "star_basket_rules": AnalysisQuery(
            "star_basket_rules", star_basket_rules.__doc__,
            star_basket_rules, STAR_BASKET_RULES_SQL),
        "star_grouping_sets_store_season": AnalysisQuery(
            "star_grouping_sets_store_season", star_grouping_sets.__doc__,
            star_grouping_sets, GROUPING_SETS_SQL),
        "star_cube_store_quarter": AnalysisQuery(
            "star_cube_store_quarter", star_cube.__doc__, star_cube, STAR_CUBE_SQL),
        "star_basket_pairs_onepass": AnalysisQuery(
            "star_basket_pairs_onepass", star_basket_onepass.__doc__,
            star_basket_onepass, Q16_SQL),
        "star_rolling_7day_revenue": AnalysisQuery(
            "star_rolling_7day_revenue", star_rolling_revenue.__doc__,
            star_rolling_revenue, STAR_ROLLING_SQL),
        "star_pivot_quarter_revenue": AnalysisQuery(
            "star_pivot_quarter_revenue", star_pivot.__doc__, star_pivot, STAR_PIVOT_SQL),
        "star_store_customer_stats": AnalysisQuery(
            "star_store_customer_stats", star_store_stats.__doc__,
            star_store_stats, STAR_STORE_STATS_SQL),
        "star_store_stats_approx": AnalysisQuery(
            "star_store_stats_approx", star_store_stats_approx.__doc__,
            star_store_stats_approx, STAR_STORE_STATS_APPROX_SQL),
    }
)


# Spark SQL bodies (SURVEY.md §3.2: every query exists as both a DataFrame
# function and a spark.sql string). The oracle bodies are ANSI enough to run
# on Spark verbatim against the registered star views — except q15, whose
# HUGEINT arithmetic maps to DECIMAL(38,0) here.
_SPARK_SQL_OVERRIDES = {
    "q15_monthly_revenue_volatility": Q15_SQL.replace("AS HUGEINT", "AS DECIMAL(38,0)"),
    # DuckDB datediff('day', start, end) vs Spark datediff(end, start).
    "star_rolling_7day_revenue": STAR_ROLLING_SQL.replace(
        "datediff('day', DATE '1970-01-01', full_date)",
        "datediff(full_date, DATE '1970-01-01')",
    ),
    # DuckDB quantile_cont ≡ Spark percentile (exact interpolated).
    "star_store_customer_stats": STAR_STORE_STATS_SQL.replace(
        "quantile_cont(", "percentile("
    ),
    # DuckDB quantile_disc(x, q) ≡ Spark percentile_disc(q) WITHIN GROUP.
    "star_store_stats_approx": STAR_STORE_STATS_APPROX_SQL.replace(
        "quantile_disc(CAST(purchase_amount AS DOUBLE), 0.5)",
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST(purchase_amount AS DOUBLE))",
    ),
}


def spark_sql_text(name: str) -> str | None:
    """The spark.sql form of an analysis query (run after register_views)."""
    q = QUERIES[name]
    if q.oracle is None:
        return None
    return _SPARK_SQL_OVERRIDES.get(name, q.oracle)


def register_views(star: Star) -> None:
    """S9: register star tables and the store_quarterly_sales view for
    spark.sql access."""
    for name, df in star.items():
        df.createOrReplaceTempView(name)
    q20(star).createOrReplaceTempView("store_quarterly_sales")
