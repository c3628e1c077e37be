"""Per-entry job/stage profiler: run registry entries in one warm session
and report wall (min-of-N), #jobs and #stages per invocation from the UI
REST API — the "jobs per merge" evidence for the streaming-fold work
(guide §1: measure first; the folds' cost at any scale is their per-batch
job/stage count, not bytes).

Usage: python scripts/job_profile.py <entry> [<entry> ...] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])

    from near_real_time_data_warehouse_spark import driver_api
    from near_real_time_data_warehouse_spark.session import get_spark

    spark = get_spark("nrtdw_job_profile")
    qs = driver_api.queries()
    # session warmup (same as bench.py)
    from pyspark.sql import functions as F  # noqa: N812

    spark.range(1_000_000).select((F.col("id") % 97).alias("k")).groupBy("k").agg(
        F.count(F.lit(1))
    ).write.format("noop").mode("overwrite").save()
    spark.range(10_000).repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    def counts() -> tuple[int, int]:
        jobs = _rest(base, "/jobs?status=succeeded") + _rest(
            base, "/jobs?status=failed"
        ) + _rest(base, "/jobs?status=running")
        n_stages = sum(len(j.get("stageIds", [])) for j in jobs)
        return len(jobs), n_stages

    out = {}
    for name in args:
        fn = qs[name]
        best, bj, bs = float("inf"), 0, 0
        for _ in range(runs):
            time.sleep(0.3)
            j0, s0 = counts()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            time.sleep(0.3)
            j1, s1 = counts()
            if dt < best:
                best, bj, bs = dt, j1 - j0, s1 - s0
        out[name] = {"sec": round(best, 3), "jobs": bj, "stages": bs}
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
