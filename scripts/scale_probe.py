"""Scale probe (VERDICT r3 item 5): measure the heaviest entries at a
multiple of sf0.1 to turn the "scales linearly" design claims into an
empirical datapoint.

Builds an N× replica of the tables the heavy entries scan (documents,
embeddings, and the star-ETL TPC-H tables) into a scratch dir. Replicas
are key-shifted AND content-perturbed so the scaled corpus is
statistically similar to the base instead of a degenerate pile of exact
duplicates:

- ``documents``: doc_id shifted by r·10M; every word gets a per-replica
  suffix, so replica r of a doc shares no shingles with replica r' —
  the true near-dup pair set scales exactly linearly (pairs(N×) =
  N·pairs(1×)); without the perturbation every doc would gain N−1
  identical twins and the pair graph would grow quadratically in N,
  measuring an artifact instead of the operator.
- ``embeddings``: vec_id shifted; the vector is circularly rotated by r
  dims (norm- and distribution-preserving, replicas mutually distinct).
- star tables: all FK/PK keys shifted by the same r·10M so join
  fan-outs are preserved replica-by-replica.

Usage:  python scripts/scale_probe.py [N] [scratch_dir]
        (default N=5 → "sf0.5"; scratch defaults to /tmp/scale_probe)

Prints one JSON line per scale with the five heavy-entry timings.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SHIFT = 10_000_000


def build_scaled(n_replicas: int, out_dir: str) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def write(table: str, select_for_replica) -> None:
        path = f"{out_dir}/{table}.parquet"
        if os.path.exists(path):
            return
        union = " UNION ALL ".join(
            select_for_replica(r) for r in range(n_replicas)
        )
        con.execute(f"COPY ({union}) TO '{path}' (FORMAT PARQUET)")

    src = lambda t: f"read_parquet('{BASE}/{t}.parquet')"  # noqa: E731

    write(
        "documents",
        lambda r: f"""
        SELECT doc_id + {r * SHIFT} AS doc_id,
               regexp_replace(text, '(\\S+)', '\\1x{r}', 'g') AS text,
               lang, source, n_chars
        FROM {src('documents')}""",
    )
    write(
        "embeddings",
        lambda r: f"""
        SELECT vec_id + {r * SHIFT} AS vec_id,
               CASE WHEN {r} = 0 THEN embedding
                    ELSE list_concat(embedding[{r + 1}:], embedding[:{r}]) END
                 AS embedding,
               label
        FROM {src('embeddings')}""",
    )
    write(
        "customer",
        lambda r: f"""
        SELECT c_custkey + {r * SHIFT} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')}""",
    )
    write(
        "supplier",
        lambda r: f"""
        SELECT s_suppkey + {r * SHIFT} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src('supplier')}""",
    )
    write(
        "part",
        lambda r: f"""
        SELECT p_partkey + {r * SHIFT} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src('part')}""",
    )
    write(
        "orders",
        lambda r: f"""
        SELECT o_orderkey + {r * SHIFT} AS o_orderkey,
               o_custkey + {r * SHIFT} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}""",
    )
    write(
        "lineitem",
        lambda r: f"""
        SELECT l_orderkey + {r * SHIFT} AS l_orderkey,
               l_partkey + {r * SHIFT} AS l_partkey,
               l_suppkey + {r * SHIFT} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}""",
    )
    # untouched small dims + events (not scanned by the heavy five, but
    # present so any table load resolves)
    for t in ("region", "nation", "events"):
        path = f"{out_dir}/{t}.parquet"
        if not os.path.exists(path):
            shutil.copyfile(f"{BASE}/{t}.parquet", path)


def run_heavy(spark, sf_dir: str) -> dict[str, float]:
    from concurrent.futures import ThreadPoolExecutor

    from near_real_time_data_warehouse_spark.operators import dedup, similarity, text
    from near_real_time_data_warehouse_spark.plans.star import star_tables

    timings: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    star = star_tables(spark, sf_dir)
    with ThreadPoolExecutor(len(star)) as pool:
        list(pool.map(noop, star.values()))
    timings["star_etl_load"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    noop(similarity.brute_force_topk(spark, sf_dir))
    noop(similarity.ann_ivf_topk(spark, sf_dir))
    timings["ann_index_build"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    noop(similarity.ann_ivf_incremental(spark, sf_dir))
    timings["sim_ann_ivf_incremental"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    noop(dedup.dedup_components_minhash(spark, sf_dir))
    noop(dedup.dedup_components(spark, sf_dir))
    noop(dedup.dedup_graph_incremental(spark, sf_dir))
    timings["dedup_graph_build"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    noop(text.bigram_surprisal(spark, sf_dir))
    timings["text_bigram_surprisal"] = round(time.perf_counter() - t0, 2)

    return timings


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe"
    scaled_dir = f"{scratch}/x{n}"
    build_scaled(n, scaled_dir)

    from near_real_time_data_warehouse_spark.session import get_spark

    spark = get_spark("scale_probe")
    # Warm the JVM + Python worker pool (the bench.py warmup) so the
    # first scale's timings aren't billed for one-time session cost and
    # the base/scaled ratio is honest.
    from pyspark.sql import functions as F  # noqa: N812

    spark.range(1_000_000).select((F.col("id") % 97).alias("k")).groupBy("k").agg(
        F.count(F.lit(1))
    ).write.format("noop").mode("overwrite").save()
    spark.range(10_000).repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for label, d in [("sf0.1", BASE), (f"sf0.1 x{n}", scaled_dir)]:
        t = run_heavy(spark, d)
        print(json.dumps({"scale": label, "total": round(sum(t.values()), 2), "queries": t}))


if __name__ == "__main__":
    main()
