"""Capture .explain("formatted") snapshots for named registry entries.

Usage: python scripts/capture_plans.py <suffix> [entry ...]

Writes plans/r13/<entry>_<suffix>.txt for each named entry (or, with no
names, every registry entry). Shared memoized state (star cache, LSH
pair tables, ANN ground truth) is materialized first so the captured
plan is the bench steady-state shape (InMemoryTableScan where the bench
would have it), not the cold-start shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(__file__),
        "..",
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from near_real_time_data_warehouse_spark import driver_api
    from near_real_time_data_warehouse_spark.session import get_spark

    spark = get_spark("nrtdw_capture_plans")
    qs = driver_api.queries()
    if names:
        missing = [n for n in names if n not in qs]
        if missing:
            raise SystemExit(f"unknown entries: {missing}")

    # Steady-state warmup, mirroring bench.py's shared one-time builds.
    from near_real_time_data_warehouse_spark.operators import dedup, similarity
    from near_real_time_data_warehouse_spark.plans import star as star_mod

    for df in star_mod.star_tables(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    similarity.brute_force_topk(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    similarity.ann_ivf_topk(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    dedup.dedup_components_minhash(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    dedup.dedup_components(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    dedup.dedup_graph_incremental(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names or sorted(qs):
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)


if __name__ == "__main__":
    main()
