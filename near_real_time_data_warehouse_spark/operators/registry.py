"""Registry of extension operators (dedup / similarity / text / events).

Populated incrementally; each module contributes (queries, oracle_sql)
pairs in the same driver contract shape as the analysis library.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str | Callable[[], str]] = {}


def register(
    name: str, fn: QueryFn, oracle: str | Callable[[], str] | None
) -> None:
    """``oracle`` may be the SQL string or a zero-arg builder resolved
    lazily at the first ``oracle_sql()`` call. The lazy form exists for
    builders that import ACROSS operator modules (text↔similarity↔dedup):
    calling them at module-exec time creates an import cycle whenever a
    test or user imports one operator module directly instead of going
    through ``_load_all`` (whose import order happens to pre-initialize
    the chain)."""
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    for k, v in _ORACLES.items():
        if callable(v):
            _ORACLES[k] = v()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import clustering, corpus, curation, dedup, layout, linkage, multimodal, quality, scd, similarity, streaming_folds, text, events  # noqa: F401  (self-registering)
    from ..plans import classics  # noqa: F401

    _LOADED = True
