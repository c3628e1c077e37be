"""Local differential harness — mirrors the driver's DuckDB-oracle gate.

Runs a Spark query and its oracle SQL on the same parquet tables and
compares row count, column names, and an order-insensitive value
comparison (columns sorted by name, rows sorted by stringified tuple).
Strict by default: floats must match bit-for-bit, because the driver
compares value *hashes* — any tolerance here would hide a failure there.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame

from .sources.testdata import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return sorted_cols, out


@dataclass
class DiffResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems[:5]:
            msg += f"\n    {p}"
        return msg


def _driver_canon_ok(cols: list[str], rows: list[tuple]) -> str | None:
    """Replicate the driver's pandas canonicalization (sorted-column
    ``sort_values`` over every column). The round-3 driver crashed with
    ``TypeError: unhashable type: 'list'`` on array-valued cells that
    this harness's tuple-izing ``_norm`` happily accepted — so local
    green no longer implies driver green unless this exact step runs.
    Returns an error string, or None if canonicalization succeeds."""
    import pandas as pd

    try:
        pdf = pd.DataFrame(rows, columns=cols)
        pdf = pdf[sorted(pdf.columns)]
        pdf.sort_values(by=list(pdf.columns))
    except Exception as e:  # noqa: BLE001 — any crash here is a driver red
        return f"driver-style pandas canonicalization fails: {e!r:.300}"
    return None


def compare(name: str, sdf: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> DiffResult:
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)
    cur = con.execute(sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = [tuple(r) for r in cur.fetchall()]

    problems: list[str] = []
    canon_err = _driver_canon_ok(s_cols, s_rows)
    if canon_err:
        problems.append(canon_err)
    sc, s_sorted = _rowset(s_cols, s_rows)
    oc, o_sorted = _rowset(o_cols, o_rows)
    if sc != oc:
        problems.append(f"columns differ: spark={sc} oracle={oc}")
    if len(s_rows) != len(o_rows):
        problems.append("row count mismatch")
    if not problems:
        for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
            if a != b:
                problems.append(f"row {i} differs:\n      spark : {a}\n      oracle: {b}")
                if len(problems) >= 5:
                    break
    return DiffResult(name, not problems, len(s_rows), len(o_rows), problems)


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[DiffResult]:
    from . import driver_api

    qs = driver_api.queries()
    oracles = driver_api.oracle_sql()
    con = duckdb_connection(sf_dir)
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            results.append(compare(name, fn(spark, sf_dir), con, oracles[name]))
        except Exception as e:  # noqa: BLE001 — harness must report, not die
            results.append(DiffResult(name, False, -1, -1, [f"exception: {e!r:.500}"]))
    return results
