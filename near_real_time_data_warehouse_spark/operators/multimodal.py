"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` pipelines. The decode
kernels themselves are STUBBED (this container ships no image/audio
libraries — see ``DecodeNotAvailable`` / the deterministic fake): what is
real and tested is everything Spark-side — schema, batch iteration, UDF
signatures, partition-preserving flow, and metadata pushdown.

At 100 TB: binary payloads dominate bytes, so the design rule is
*metadata-first* — filter/route on the typed metadata columns (pushed to
the parquet scan) and only stream the binary column through Python for
rows that survive. ``mapInPandas`` keeps Arrow batches bounded
(spark.sql.execution.arrow.maxRecordsPerBatch), so executor memory is
independent of file sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class DecodeNotAvailable(NotImplementedError):
    """Raised by the real-decoder path: media codecs are not installed in
    this environment. Swap ``_decode_real`` with a Pillow/torchaudio/pyav
    implementation in production."""


def _decode_real(payload: bytes, kind: str) -> list[float]:
    raise DecodeNotAvailable(
        f"no codec for kind={kind!r} in this environment; "
        "install pillow/torchaudio/pyav and replace _decode_real"
    )


def _decode_fake(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic fake decode: md5-derived feature vector. Keeps the
    whole pipeline runnable and testable without codecs."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


def make_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Synthetic media table (deterministic payloads) for tests/demos."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(128 + i)])
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + 10 * i if kind != "image" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Decode + featurize each payload via Arrow-batched mapInPandas.

    The UDF sees bounded pandas batches; per-row Python cost is the decode
    itself (unavoidable), everything else stays vectorized."""
    decoder = _decode_fake if use_fake_decoder else _decode_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": [
                        decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: metadata-first filter (only images flow into
    Python), stubbed pixel kernel, metadata rewritten Spark-side."""
    images = media.filter(F.col("kind") == "image")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # Real impl: decode → resample → re-encode. Stub: passthrough.
            yield pdf

    resized = images.mapInPandas(batches, MEDIA_SCHEMA)
    return resized.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.format").alias("format"),
        ),
    )


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a scale-tracking media table: payload = utf-8 bytes of
    the text (a deterministic opaque binary), kind assigned round-robin.
    This is how a real multimodal lakehouse table looks to the engine —
    an opaque binary column plus typed metadata — so the whole decode
    pipeline is exercised on driver-scaled data with an exact oracle."""
    from ..sources.testdata import load_table_parallel

    d = load_table_parallel(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: decode/featurize the document-derived media table via
    the Arrow-batched pipeline; emit the byte count and a deterministic
    left-fold checksum of the feature vector (float32 values accumulated
    in index order as doubles — reproducible bit-for-bit in SQL)."""
    feats = extract_features(media_from_documents(spark, sf_dir))
    checksum = F.aggregate(
        F.col("feature"), F.lit(0.0).cast("double"), lambda acc, x: acc + x.cast("double")
    )
    return feats.select("media_id", "kind", "n_bytes", checksum.alias("feature_checksum"))


def _feature_terms_sql(dim: int = 8) -> str:
    """The fake decoder's feature vector in SQL: byte i of md5(payload),
    /255.0 as double, narrowed to float32 (REAL) exactly like the Arrow
    array<float>, then widened back for the fold."""
    terms = [
        f"CAST(CAST(CAST(('0x' || substr(md5(text), {2 * i + 1}, 2)) AS BIGINT)"
        f" / 255.0 AS REAL) AS DOUBLE)"
        for i in range(dim)
    ]
    folded = "CAST(0.0 AS DOUBLE)"
    for t in terms:
        folded = f"({folded} + {t})"
    return folded


MULTIMODAL_SQL = f"""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       {_feature_terms_sql()} AS feature_checksum
FROM documents
"""


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode one row per sampled frame
    timestamp (computed from metadata Spark-side); the frame grab itself is
    the stubbed kernel."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
        "payload",
    ).withColumn("frame", F.lit(None).cast("binary"))  # stub: real grab decodes here


def multimodal_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the frame-sampling plumbing: videos of the
    document-derived media table, duration derived deterministically from
    payload length, one row per sampled frame via ``explode(sequence)``
    (the same shape ``sample_frames`` uses on real metadata), then
    per-media frame counts. The oracle states the closed form — the
    explode must reproduce exactly ``dur div step + 1`` frames."""
    m = media_from_documents(spark, sf_dir).filter(F.col("kind") == "video")
    dur = F.length("payload").cast("long")
    frames = m.select(
        "media_id",
        F.explode(F.sequence(F.lit(0).cast("long"), dur, F.lit(250).cast("long"))).alias(
            "frame_ms"
        ),
    )
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ms").alias("last_frame_ms"),
    )


FRAME_INDEX_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) // 250 + 1 AS BIGINT) AS n_frames,
       CAST(octet_length(encode(text)) // 250 * 250 AS BIGINT) AS last_frame_ms
FROM documents
WHERE CAST(doc_id % 3 AS INT) = 2
"""


from . import registry  # noqa: E402

registry.register("multimodal_features", multimodal_features, MULTIMODAL_SQL)
registry.register("multimodal_frame_index", multimodal_frame_index, FRAME_INDEX_SQL)
