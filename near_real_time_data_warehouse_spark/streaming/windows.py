"""Streaming analytics over the events stream: watermarked windows and a
custom stateful operator (north-star T4 surface; the reference itself has
no event-time ops — SURVEY.md §2.6).

The batch twins in operators/events.py are the oracle-checked versions;
tests assert stream == batch on a drained source.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """The events parquet's actual schema (a file stream needs one
    up-front). Read from the footer via a batch scan, not pinned in code:
    the testdata has stored ``ts`` as TIMESTAMP(NANOS)→int64 in some
    generations and timestamp[us] in others, and the stream must match
    whichever is on disk."""
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


# One symlink dir per source parquet for the process lifetime (reused on
# repeat calls, removed at exit) — a fresh mkdtemp per call would leak a
# dir+symlink each time (round-1 advisory).
_STREAM_DIR_MEMO: dict[str, str] = {}


def _stream_dir_for(sf_dir: str) -> str:
    import atexit
    import os
    import shutil
    import tempfile

    d = _STREAM_DIR_MEMO.get(sf_dir)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _STREAM_DIR_MEMO[sf_dir] = d
    return d


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet as a file stream with a proper event-time column.

    The file-stream source requires a *directory*; testdata is read-only,
    so the single parquet file is exposed through a symlink in a temp dir."""
    from ..functions.eventtime import event_time_expr
    from ..operators.events import _ensure_nanos_as_long

    _ensure_nanos_as_long(spark)
    stream_dir = _stream_dir_for(sf_dir)
    raw = spark.readStream.schema(events_schema(spark, sf_dir)).parquet(stream_dir)
    return raw.withColumn("event_time", event_time_expr(raw))


def hourly_by_type(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling 1-hour window per event type — the streaming
    twin of operators/events.tumbling_hourly. At scale, state is bounded
    by the watermark horizon; aggregation is map-side partial before the
    keyed state store."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_by_type(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked sliding 4-hour/1-hour window per event type — the
    streaming twin of operators/events.sliding_hourly. The engine
    maintains LENGTH/SLIDE (4×) concurrent windows per key — the same
    write amplification the batch overlap-explode makes explicit — and
    state stays bounded by watermark + window length."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "4 hours", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Native session windows (gap-based, merge-on-overlap) per user —
    the streaming form of operators/events.sessionize. State closes a
    session ``gap`` after its last event once the watermark passes; at
    scale state size ∝ open sessions, not history."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
    )


def clicks_with_recent_errors(
    events: DataFrame, horizon_min: int = 10, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each click paired with every error of
    the same user in the preceding ``horizon_min`` minutes (inclusive).
    Both sides carry watermarks and the join condition bounds event-time
    distance, so state retention is finite (watermark + horizon) — the
    canonical scalable stream-stream join shape. Inner-join matches emit
    as soon as both sides arrive; the watermark only bounds state."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("event_time").alias("click_time"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("err_user_id"),
        F.col("event_time").alias("error_time"),
    )
    return (
        clicks.withWatermark("click_time", watermark)
        .join(
            errors.withWatermark("error_time", watermark),
            (F.col("user_id") == F.col("err_user_id"))
            & (F.col("error_time") <= F.col("click_time"))
            & (F.col("error_time") >= F.col("click_time") - F.expr(f"INTERVAL {horizon_min} MINUTES")),
            "inner",
        )
        .select("click_id", "error_id", "user_id")
    )


def incident_window_matches(
    events: DataFrame, window_min: int = 10, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of the batch bucketed range join
    (operators/events.incident_window_join): each (event, incident) pair
    where the event falls in the 10-minute window after an error event,
    with NO natural equi key. The bucket derivation is exactly what makes
    this expressible as a stream-stream join at all — streaming state
    lookup needs an equality key, and an inequality-only join has none
    until time quantization derives one. The integer bucket/range
    conditions give exact batch-equal semantics; the event-time interval
    condition on the watermarked columns is what lets Spark expire state
    (watermark + window horizon)."""
    from ..functions.eventtime import us_expr

    b = window_min * 60 * 1_000_000
    ev = events.select(
        "event_id",
        us_expr(events).alias("us"),
        "event_time",
    ).withColumn("bucket", F.expr(f"us div {b}"))
    inc = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("incident_id"),
            us_expr(events).alias("w_start"),
            F.col("event_time").alias("incident_time"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"w_start div {b}"), F.expr(f"(w_start + {b} - 1) div {b}")
                )
            ),
        )
    )
    return (
        ev.withWatermark("event_time", watermark)
        .join(
            inc.withWatermark("incident_time", watermark),
            (ev.bucket == inc.bucket)
            & (F.col("us") >= F.col("w_start"))
            & (F.col("us") < F.col("w_start") + F.lit(b))
            & (F.col("event_id") != F.col("incident_id"))
            & (F.col("event_time") >= F.col("incident_time"))
            & (
                F.col("event_time")
                <= F.col("incident_time") + F.expr(f"INTERVAL {window_min} MINUTES")
            ),
            "inner",
        )
        .select("event_id", "incident_id")
    )


_STATE_SCHEMA = "n LONG, total DOUBLE"
_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def _user_totals_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: running per-user totals. State survives
    across micro-batches; each batch emits the updated running totals."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """applyInPandasWithState: per-user running event count/value totals —
    the 'custom stateful operator' escape hatch for semantics the built-in
    windows can't express."""
    return events.groupBy("user_id").applyInPandasWithState(
        _user_totals_fn,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas runs its StatefulProcessor in a
    dedicated long-lived Python worker that talks to the JVM state server
    over protobuf; without a working ``google.protobuf`` the worker dies
    at import (probed: this container ships a broken namespace package).
    Same probe-gate policy as the lakehouse MERGE jar."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals on Spark 4's ``transformWithStateInPandas``
    — the NEW arbitrary-state API (SPARK-49564): typed named state
    (`getValueState`), timers, TTL, and evolvable state schema, replacing
    the single-tuple `applyInPandasWithState` contract. Semantically
    identical to ``running_user_totals`` (the test pins tws≡batch when
    the runtime supports it — see ``tws_available``); requires the
    RocksDB state store provider (``rocksdb_state_confs``)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            got = self._state.get() if self._state.exists() else None
            n, total = (got[0], got[1]) if got is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming duplicate drop with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's state only until the
    watermark passes it, so state size ∝ keys per watermark horizon —
    the 100 TB requirement plain ``dropDuplicates`` (state ∝ all keys
    ever) violates. Emits the first-arriving event per key; re-sends
    within the horizon are suppressed. Batch twin of the *kept id* set:
    ``operators/events.dedup_events`` (min event_id per key)."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(keys)


def rocksdb_state_confs() -> dict[str, str]:
    """State-store config for production streaming: the default
    HDFS-backed in-memory store bounds state by executor heap; RocksDB
    spills to local disk, bounding it by disk instead — required for
    large keyed state (sessionization over many users, stream-stream
    join horizons). Changelog checkpointing keeps commit cost
    incremental. Set these on the session BEFORE the first stateful
    query starts (state-store provider is fixed per query run)."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


def run_to_memory(df: DataFrame, name: str, output_mode: str) -> None:
    """Drain a streaming DataFrame into an in-memory table synchronously."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
