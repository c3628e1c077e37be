"""Cluster-topology shuffle probe (VERDICT r4 #6): the single-host scale
probe rules out superlinear plan terms but says nothing about partition-
count behavior. A 1000-executor deployment sets spark.sql.shuffle.
partitions in the hundreds-to-thousands; if any heavy operator's cost
exploded with the partition count (per-partition fixed overhead, tiny-
file amplification, a window collapsing to one partition only at low
counts), local[32] at 32 partitions would never see it.

So: run the heaviest entries at 32 / 512 / 2048 shuffle partitions, each
in a FRESH process (partition count and the memory cap are session-
fixed), under a reduced driver heap (6g vs the normal 16g+128g host) so
a memory cliff would also surface. Reuses bench.py as the runner, so the
measurements carry the same shuffle-bytes / spill / plan-hash
instrumentation as the recorded rounds.

Usage:  python scripts/shuffle_probe.py [sf_dir]
Prints one JSON line per configuration, then a compact comparison table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRIES = [
    "star_etl_load",
    "ann_index_build",
    "dedup_graph_build",
    "sim_ann_lsh_multiprobe",
    "docs_curation_semantic",
    "text_bigram_surprisal",
]

PARTITION_COUNTS = [32, 512, 2048]


def run_config(n_partitions: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SHUFFLE_PARTITIONS=str(n_partitions),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_DRIVER_MEMORY="6g",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_HEAVY_RUNS="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *ENTRIES],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results: dict[int, dict] = {}
    for n in PARTITION_COUNTS:
        out = run_config(n, sf_dir)
        results[n] = out
        print(
            json.dumps(
                {
                    "shuffle_partitions": n,
                    "queries": out["queries"],
                    "total_seconds": out["value"],
                    "total_shuffle_write_bytes": out.get("total_shuffle_write_bytes"),
                    "total_spilled_bytes": out.get("total_spilled_bytes"),
                }
            )
        )
    base = results[PARTITION_COUNTS[0]]["queries"]
    print(f"\n| entry | " + " | ".join(f"p={n}" for n in PARTITION_COUNTS) + " | worst/best |")
    print("|---|" + "---|" * (len(PARTITION_COUNTS) + 1))
    for e in ENTRIES:
        times = [results[n]["queries"].get(e) for n in PARTITION_COUNTS]
        ts = [t for t in times if t]
        ratio = max(ts) / min(ts) if ts else float("nan")
        cells = " | ".join(f"{t:.2f}s" if t else "-" for t in times)
        print(f"| {e} | {cells} | {ratio:.2f}x |")
    spills = [results[n].get("total_spilled_bytes", 0) for n in PARTITION_COUNTS]
    print(f"\nspilled bytes per config: {spills} (any nonzero = memory cliff)")


if __name__ == "__main__":
    main()
