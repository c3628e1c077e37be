"""Streaming anomaly monitor — the stateful twin of
operators/events.hourly_anomalies.

``applyInPandasWithState`` keyed by event_type holds each type's hourly
partials (hour index → exact integer micro-value sum + count) across
micro-batches and re-emits every hour's 3σ flag as state evolves
(update mode). The arithmetic mirrors the batch operator digit for
digit: per-row DECIMAL(18,6) quantization (Spark's double→decimal cast
uses the shortest-repr value and HALF_UP — `Decimal(repr(x))` is the
Python equivalent), integer micro sums, variance as n·Σx² − (Σx)² in
exact ints, then the identical float-op chain — so the drained stream's
final emissions equal the batch DataFrame bit for bit (tested).

State is bounded: after each batch's emissions, hours older than the
baseline horizon behind the type's max hour are evicted, so state size
is ≤ HORIZON_HOURS + 1 entries per key regardless of stream length —
the watermark-analog that makes the operator viable unbounded. An
event arriving for an already-evicted hour would re-open it from zero;
a real deployment pairs this with a watermark that drops such
late-beyond-horizon events before the stateful operator."""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_HOUR_US = 3_600_000_000
_SIX = Decimal("0.000001")
HORIZON_HOURS = 25  # baseline lookback (24) + the open hour

_STATE_SCHEMA = "hours ARRAY<LONG>, ns ARRAY<LONG>, vmicros ARRAY<LONG>, seq LONG"
_OUTPUT_SCHEMA = (
    "event_type STRING, hour_epoch_s LONG, n_events LONG, total_value DOUBLE, "
    "baseline_mean DOUBLE, baseline_std DOUBLE, is_anomaly BOOLEAN, emit_seq LONG"
)


def _micro(v: float) -> int:
    return int(Decimal(repr(v)).quantize(_SIX, rounding=ROUND_HALF_UP) * 1_000_000)


def _flags(hourly: dict[int, tuple[int, int]], seq: int) -> pd.DataFrame:
    rows = []
    for h in sorted(hourly):
        n_ev, vm = hourly[h]
        base = [hourly[b] for b in range(h - 24, h) if b in hourly]
        n = len(base)
        if n >= 12:
            import math

            b1 = sum(v for _, v in base)
            b2 = sum(v * v for _, v in base)
            mean = (float(b1) / n) / 1_000_000.0
            # math.sqrt, not **0.5: pow is not guaranteed correctly
            # rounded; sqrt is, and is what the JVM/DuckDB emit.
            std = math.sqrt(float(b2 * n - b1 * b1) / (n * (n - 1))) / 1_000_000.0
            x = vm / 1_000_000.0
            flag = abs(x - mean) > 3 * std
        else:
            mean = std = flag = None
        rows.append((h * 3600, n_ev, vm / 1_000_000.0, mean, std, flag))
    return pd.DataFrame(
        rows, columns=["hour_epoch_s", "n_events", "total_value",
                       "baseline_mean", "baseline_std", "is_anomaly"]
    ).assign(emit_seq=seq)


def _monitor_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        hours, ns, vmicros, seq = state.get
        hourly = {h: (n, v) for h, n, v in zip(hours, ns, vmicros)}
    else:
        hourly, seq = {}, 0
    for pdf in pdfs:
        for us, value in zip(pdf["us"], pdf["value"]):
            h = int(us) // _HOUR_US
            n_ev, vm = hourly.get(h, (0, 0))
            hourly[h] = (n_ev + 1, vm + _micro(float(value)))
    seq += 1
    # Emit on the full pre-eviction map (an evicted hour's final flag was
    # already emitted while it was live), then bound the stored state.
    out = _flags(hourly, seq)
    out.insert(0, "event_type", key[0])
    horizon_floor = max(hourly) - HORIZON_HOURS if hourly else 0
    retained = sorted(h for h in hourly if h >= horizon_floor)
    state.update((
        retained,
        [hourly[h][0] for h in retained],
        [hourly[h][1] for h in retained],
        seq,
    ))
    yield out


def streaming_hourly_anomalies(events: DataFrame) -> DataFrame:
    """events stream (with ``us`` epoch-µs and ``value``) → per-type
    hourly 3σ flags, re-emitted as state evolves (update mode)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _monitor_fn,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
