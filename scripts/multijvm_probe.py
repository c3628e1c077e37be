"""Multi-JVM executor probe (VERDICT r5 #3): both prior scale probes run
local[32] — ONE JVM, so closures are never serialized across a process
boundary, broadcasts are never torn down remotely, and Python workers
always talk to a co-located executor backend. Spark's
``local-cluster[N,cores,mem]`` master launches REAL separate executor
JVM processes on this host — the cheapest way to surface
closure-serialization or broadcast-lifecycle bugs the single-JVM suite
structurally cannot catch.

Runs the 6 shuffle-probe entries (the heaviest registered queries) under
``local-cluster[2,8,4096]`` via bench.py (same shuffle-bytes / spill /
plan-hash instrumentation as the recorded rounds), then one streaming
fold (the dedup-graph + diagnostics maintenance stream) under the same
master via pytest.

Usage:  python scripts/multijvm_probe.py [sf_dir]
Prints one JSON line for the bench config, then the streaming-fold
pytest tail, then a compact comparison table vs a same-process local[16]
run (2 executors x 8 cores = 16 total cores, matched).
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

MASTERS = {
    "local[16]": {},
    "local-cluster[2,8,4096]": {"SPARK_GRAFT_MASTER": "local-cluster[2,8,4096]"},
}

STREAM_TEST = "tests/test_streaming_diagnostics.py::test_streaming_diagnostics_equals_batch_build"


def run_bench(extra_env: dict, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS="16",
        SPARK_DRIVER_MEMORY="6g",
        SPARK_EXECUTOR_MEMORY="4g",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_HEAVY_RUNS="1",
        **extra_env,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *ENTRIES],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run_stream_fold(extra_env: dict) -> bool:
    env = dict(os.environ, SPARK_GRAFT_CPUS="16", **extra_env)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", STREAM_TEST, "-q", "-x"],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "?"
    print(f"stream fold under {extra_env or 'local[16]'}: {tail}")
    return proc.returncode == 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results: dict[str, dict] = {}
    for name, extra in MASTERS.items():
        out = run_bench(extra, sf_dir)
        results[name] = out
        print(
            json.dumps(
                {
                    "master": name,
                    "queries": out["queries"],
                    "total_seconds": out["value"],
                    "total_shuffle_write_bytes": out.get("total_shuffle_write_bytes"),
                    "total_spilled_bytes": out.get("total_spilled_bytes"),
                }
            )
        )
    ok = run_stream_fold(MASTERS["local-cluster[2,8,4096]"])

    names = list(MASTERS)
    print("\n| entry | " + " | ".join(names) + " | ratio |")
    print("|---|" + "---|" * (len(names) + 1))
    for e in ENTRIES:
        times = [results[n]["queries"].get(e) for n in names]
        cells = " | ".join(f"{t:.2f}s" if t else "-" for t in times)
        ratio = (times[1] / times[0]) if all(times) else float("nan")
        print(f"| {e} | {cells} | {ratio:.2f}x |")
    print(f"\nstreaming fold green under multi-JVM: {ok}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
