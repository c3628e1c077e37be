"""Custom connector on Spark 4's Python DataSource API (SPARK-44076).

The reference's ingestion surface is file playback (SURVEY §2.1 S2 —
hybrid_join.py's CSV stream); this module shows the engine's source
surface is *extensible in pure Python*: a deterministic synthetic
event generator usable as BOTH a batch relation and a streaming source,
registered like any built-in format:

    spark.dataSource.register(EventGenSource)
    spark.read.format("eventgen").option("n_rows", 1000).load()
    spark.readStream.format("eventgen").option("batch_rows", 100).load()

Scale shape: the batch reader splits the id space into
``n_partitions`` `InputPartition`s — Spark schedules one task per
partition, so generation parallelism ∝ partitions with zero driver
state. The streaming reader is a SimpleDataSourceStreamReader whose
offset is just the next unemitted id — replayable from any committed
offset, which is what makes a restarted query exactly-once.

Every field derives deterministically from the row id (md5, same trick
as the LSH plane weights), so two reads — or a crash-replayed batch —
are bit-identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENTGEN_SCHEMA = (
    "event_id long, user_id long, event_type string, value_cents long"
)
_TYPES = ["view", "click", "purchase", "error", "refund"]


def gen_row(i: int) -> tuple[int, int, str, int]:
    """Deterministic event for id ``i`` (pure function — the replay /
    exactly-once guarantee reduces to this determinism)."""
    h = hashlib.md5(f"eventgen|{i}".encode()).hexdigest()
    user_id = int(h[:8], 16) % 1000
    event_type = _TYPES[int(h[8:10], 16) % len(_TYPES)]
    value_cents = int(h[10:16], 16) % 100_000
    return (i, user_id, event_type, value_cents)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class EventGenBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = max(1, (self.n_rows + self.n_partitions - 1) // self.n_partitions)
        return [
            _Range(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, part: _Range) -> Iterator[tuple]:
        for i in range(part.start, part.end):
            yield gen_row(i)


class EventGenStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"next": first-unemitted id}: monotone, replayable, and
    committed by the engine — re-reading any (start, end) range yields
    identical rows, so restart/replay is exactly-once by construction."""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.max_rows)
        # iterator over a CONCRETE list (the engine's prefetch wrapper
        # calls next() on it, then pickles the materialized rows for
        # replay — a lazy generator would fail that pickling)
        return iter([gen_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([gen_row(i) for i in range(start["next"], end["next"])])


class EventGenSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return EVENTGEN_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return EventGenBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return EventGenStreamReader(self.options)
