"""Registry of extension operators (dedup / similarity / text / events).

Populated incrementally; each module contributes (queries, oracle_sql)
pairs in the same driver contract shape as the analysis library.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import clustering, corpus, curation, dedup, layout, linkage, multimodal, quality, scd, similarity, streaming_folds, text, events  # noqa: F401  (self-registering)
    from ..plans import classics  # noqa: F401

    _LOADED = True
