"""End-to-end demo: the reference's workflow, Spark-native.

The reference's README (reference README.md:16-33) prescribes:
  1. load the star DDL into MySQL,
  2. run `python hybrid_join.py` to stream-enrich-load,
  3. run Analysis_Queries.sql.

This script is the same workflow on this engine:
  1. bootstrap the star schema,
  2. run the Structured Streaming ETL over transaction CSVs
     (stream-static broadcast joins, checkpointed foreachBatch load),
  3. run analysis queries as spark.sql text over the loaded warehouse.

Uses the deterministic reference-faithful fixtures (tests/fixtures.py)
since the reference's transactional CSV is a missing blob. Run:

    python demo.py [workdir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

from near_real_time_data_warehouse_spark import etl
from near_real_time_data_warehouse_spark.plans import analysis
from near_real_time_data_warehouse_spark.session import get_spark
from near_real_time_data_warehouse_spark.streaming.pipeline import run_streaming_etl
from tests.fixtures import write_fixture_csvs

SHOW = (
    "q01_top5_product_daytype_revenue",
    "q02_purchase_by_gender_age_city",
    "q17_rollup_store_supplier_product",
)


def main() -> None:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp(prefix="nrtdw_demo_"))
    spark = get_spark("nrtdw_demo")
    paths = write_fixture_csvs(work / "input")
    wh, ckpt = str(work / "warehouse"), str(work / "checkpoint")

    print(f"[1/3] streaming ETL -> {wh}")
    run_streaming_etl(
        spark, str(paths["transactions"]), str(paths["customer"]),
        str(paths["product"]), wh, ckpt,
    )

    print("[2/3] registering star views")
    star = etl.read_star(spark, wh)
    analysis.register_views(star)
    for name, df in star.items():
        print(f"    {name}: {df.count()} rows")

    print("[3/3] analysis queries (spark.sql text, same as DataFrame forms)")
    for name in SHOW:
        sql = analysis.spark_sql_text(name)
        # The query library's "current year" constant targets the driver
        # testdata timeline (2000); the reference-faithful fixtures replay
        # the reference's own timeline, whose latest year is 2020
        # (Analysis_Queries.sql:33-34). Pin the reference year here.
        sql = sql.replace(f"= {analysis.CURRENT_YEAR}", "= 2020").replace(
            analysis.CURRENT_DATE, "2020-12-31"
        )
        print(f"\n-- {name}")
        spark.sql(sql).show(8, truncate=False)


if __name__ == "__main__":
    main()
