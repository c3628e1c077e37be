"""Benchmark harness — one JSON line of per-query wall times.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is forced
with the noop sink (full execution, no driver-side collect cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from near_real_time_data_warehouse_spark import driver_api
    from near_real_time_data_warehouse_spark.session import get_spark

    spark = get_spark("nrtdw_bench")
    qs = driver_api.queries()

    # Warm the JVM (codegen, parquet footer readers, noop sink) so the
    # alphabetically-first query doesn't absorb one-time session cost.
    from pyspark.sql import functions as F  # noqa: N812

    spark.range(1_000_000).select((F.col("id") % 97).alias("k")).groupBy("k").agg(
        F.count(F.lit(1))
    ).write.format("noop").mode("overwrite").save()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode("overwrite").save()
    # Spin up the Python worker pool (pandas/numpy import per worker) so
    # the first Arrow-batched query isn't billed for it.
    spark.range(10_000).repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    only = sys.argv[1:] or None
    # Best-of-N timing (default 2): the host this runs on is co-tenant and
    # load spikes inflate single runs by up to 10×; min-of-2 reports the
    # query's actual cost. SPARK_GRAFT_BENCH_RUNS=1 restores single-shot.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}

    # The warehouse load (star ETL) happens once, like the reference's load
    # phase (hybrid_join.py:356-477); bill it as its own line item rather
    # than inside whichever star query runs first. Load is once-per-warehouse
    # so it is NOT best-of-N timed.
    if only is None or "star_etl_load" in only:
        from concurrent.futures import ThreadPoolExecutor

        from near_real_time_data_warehouse_spark.plans.star import star_tables

        t0 = time.perf_counter()
        star = star_tables(spark, sf_dir)
        # The four table loads are independent Spark jobs — submit them
        # concurrently and let the scheduler interleave their stages, as
        # a real warehouse load would.
        with ThreadPoolExecutor(len(star)) as pool:
            list(
                pool.map(
                    lambda df: df.write.format("noop").mode("overwrite").save(),
                    star.values(),
                )
            )
        timings["star_etl_load"] = round(time.perf_counter() - t0, 3)
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
