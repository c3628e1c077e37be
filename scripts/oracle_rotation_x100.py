"""Rotating 100x-ORACLE sweep (VERDICT r12 #4, made a standing item).

Each round, the 10 stalest *value-exact* registry entries (by the
certification ledger, skipping entries already 100x-oracle-verified in
a prior round's sweep) are run at the ORACLE level against the 100x
replica (/tmp/scale_probe/x100, built by scripts/scale_probe.py): the
Spark entry and its DuckDB oracle both execute over the replica and the
full value comparison from oracle_harness runs — not just a spill
probe. This is the sweep that caught the three latent recall-gate scale
flips and the decimal->double 1-ULP ceiling in round 12; the rotation
exists so every oracle eventually proves 100x portability.

Usage: python scripts/oracle_rotation_x100.py name1 name2 ...
Prints one result line per entry and a JSON summary tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100 = "/tmp/scale_probe/x100"


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("pass entry names")
    from near_real_time_data_warehouse_spark import driver_api
    from near_real_time_data_warehouse_spark.oracle_harness import (
        compare,
        duckdb_connection,
    )
    from near_real_time_data_warehouse_spark.session import get_spark

    spark = get_spark("oracle_rotation_x100")
    qs = driver_api.queries()
    oracles = driver_api.oracle_sql()
    con = duckdb_connection(X100)
    summary = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            res = compare(name, qs[name](spark, X100), con, oracles[name])
            ok, detail = res.ok, str(res)
        except Exception as e:  # noqa: BLE001 — report every entry
            ok, detail = False, f"[FAIL] {name}: exception: {e!r:.500}"
        wall = round(time.perf_counter() - t0, 1)
        print(f"{detail}  ({wall}s)", flush=True)
        summary[name] = {"ok": ok, "wall_s": wall}
    print(json.dumps({"x100_oracle_rotation": summary}), flush=True)


if __name__ == "__main__":
    main()
