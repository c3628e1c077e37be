"""Driver-registry entries for the streaming folds (VERDICT r11 #6).

The streaming modules' foreachBatch folds are pytest-certified for
drain / replay-idempotence / checkpoint recovery
(tests/test_streaming_bm25.py, tests/test_streaming_pca.py); these
entries put the FOLD ARITHMETIC itself under the DuckDB differential
gate. Each plays the corpus through the fold in two deterministic
epochs (the even/odd split below) and returns the second epoch's
output; the oracle is the BATCH kernel over the same split:

- BM25 router: epoch-1 docs scored against epoch-0's standing
  statistics — the standing-statistics screen SQL with the even/odd
  split (shared builder with text_bm25_incremental).
- PCA fold: epoch-1 vectors projected onto the component solved from
  the MERGED Gram state. Gram partials are additive over disjoint
  document sets, so the merged two-epoch state IS the full-corpus
  statistics and the oracle is the full-lifecycle PCA replay restricted
  to epoch-1 rows — certifying streaming-fold ≡ full-rebuild
  bit-for-bit, through the driver gate rather than only pytest.
- DSIR screen: epoch-1 docs scored against epoch-0's standing bucket /
  language statistics — the standing-statistics screen SQL with the
  even/odd split (shared builder with docs_dsir_incremental).

State dirs are fresh per call (tempfile.mkdtemp) so an entry is
deterministic in any session and leaves no standing state behind.
Playback order is the fold-call sequence, not file mtimes — the
availableNow drain machinery is exercised by the pytest twins.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import registry
from .similarity import _emb, _pca_sql
from .text import _bm25_split_sql, _docs, _dsir_split_sql

_BM25_SCORE_SCHEMA = (
    "query_id long, rank long, doc_id long, score_scaled long, "
    "score double, n_hit_terms long"
)
_PCA_SCORE_SCHEMA = "vec_id long, label long, proj_num long, proj double"


def stream_bm25_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch playback of the streaming BM25 ingestion router
    (streaming/bm25_stream.py): even docs fold in as the cold-start
    index build, odd docs arrive as the next batch and are routed
    against the standing statistics. Returns the batch epoch's routing.

    Scale shape: the fold's per-epoch state is bounded (per-term df
    partials + one totals row); scoring is the broadcast-join screen of
    text_bm25_incremental, cost ∝ batch after the standing stats pass."""
    from ..streaming.bm25_stream import merge_bm25_batch

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    state = tempfile.mkdtemp(prefix="nrtdw_stream_bm25_")
    merge_bm25_batch(
        spark, docs.filter(F.col("doc_id") % 2 == 0), state, epoch_id=0
    )
    out = merge_bm25_batch(
        spark, docs.filter(F.col("doc_id") % 2 == 1), state, epoch_id=1
    )
    if out is None:
        return spark.createDataFrame([], _BM25_SCORE_SCHEMA)
    return out


def stream_pca_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch playback of the streaming PCA maintenance fold
    (streaming/pca_stream.py): even vectors bootstrap the Gram state,
    odd vectors merge with it and project onto the refreshed component.
    Because Gram sums are additive over the disjoint epochs, the merged
    state equals the full-corpus statistics exactly — the oracle is the
    full PCA lifecycle restricted to the odd rows.

    Scale shape: each epoch reduces to the bounded 2080-row integer
    Gram partial (one Arrow matmul per batch); the eigen-solve is the
    32 KB driver reduction; the projection is one scan-side pass over
    the batch."""
    from ..streaming.pca_stream import merge_pca_batch

    e = _emb(spark, sf_dir).select("vec_id", "embedding", "label")
    state = tempfile.mkdtemp(prefix="nrtdw_stream_pca_")
    merge_pca_batch(spark, e.filter(F.col("vec_id") % 2 == 0), state, epoch_id=0)
    out = merge_pca_batch(
        spark, e.filter(F.col("vec_id") % 2 == 1), state, epoch_id=1
    )
    if out is None:
        return spark.createDataFrame([], _PCA_SCORE_SCHEMA)
    return out


def stream_dsir_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch playback of the streaming DSIR maintenance fold
    (streaming/dsir_stream.py): even docs bootstrap the bucket/language
    statistics, odd docs arrive as the next batch and are screened
    against the standing distribution. Returns the batch epoch's scores.

    Scale shape: the fold's state is the bounded DSIR_BUCKETS stat
    table + one row per language per epoch; batch scoring joins the
    batch's hashed features against the broadcast bucket stats,
    cost ∝ batch."""
    from ..streaming.dsir_stream import merge_dsir_batch

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    state = tempfile.mkdtemp(prefix="nrtdw_stream_dsir_")
    merge_dsir_batch(
        spark, docs.filter(F.col("doc_id") % 2 == 0), state, epoch_id=0
    )
    out = merge_dsir_batch(
        spark, docs.filter(F.col("doc_id") % 2 == 1), state, epoch_id=1
    )
    if out is None:
        return spark.createDataFrame(
            [], "doc_id long, n_features long, score_bits long"
        )
    return out


STREAM_BM25_SQL = _bm25_split_sql("doc_id % 2 = 1")
# label cast mirrors the fold's long-typed score schema
STREAM_PCA_SQL = f"""
SELECT vec_id, CAST(label AS BIGINT) AS label, proj_num, proj
FROM ({_pca_sql(batch_where="q.vec_id % 2 = 1")})
"""

STREAM_DSIR_SQL = _dsir_split_sql("doc_id % 2 = 1")

registry.register("stream_bm25_router", stream_bm25_router, STREAM_BM25_SQL)
registry.register("stream_pca_fold", stream_pca_fold, STREAM_PCA_SQL)
registry.register("stream_dsir_screen", stream_dsir_screen, STREAM_DSIR_SQL)
