"""Core-scaling capture at a larger replica (VERDICT r13 #8): run the
named entries on the key-shifted content-perturbed N× replica at two
core counts (32 and 8 by default) in SEPARATE bench.py processes — the
driver's own scaling methodology — and print the ratio table.

At sf0.1 every line is fixed-cost dominated (8-core ≈ 32-core); this
capture asks whether the data-bound lines parallelize once the data is
10× bigger. Single-shot per point (SPARK_GRAFT_BENCH_RUNS=1): the two
runs are back-to-back on the same host and only the RATIO is quoted.

Usage: python scripts/core_scaling.py <replica_dir> <entry> [...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench(sf_dir: str, cpus: int, names: list[str]) -> dict[str, float]:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_HEAVY_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *names],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["queries"]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    t32 = bench(sf_dir, 32, names)
    t8 = bench(sf_dir, 8, names)
    rows = []
    for n in sorted(t32):
        ratio = t8[n] / t32[n] if t32.get(n) else float("nan")
        rows.append((n, t32[n], t8.get(n, float("nan")), ratio))
        print(f"{n:34s} 32c={t32[n]:8.2f}  8c={t8.get(n, -1):8.2f}  ratio={ratio:5.2f}")
    print(json.dumps({"sf_dir": sf_dir, "t32": t32, "t8": t8}))


if __name__ == "__main__":
    main()
