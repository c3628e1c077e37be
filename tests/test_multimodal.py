"""Multimodal plumbing tests: schema, Arrow batch flow, stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.make_media_df(spark, n=48).cache()


def test_feature_extraction_shape(media):
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r.feature) == 8 for r in rows)
    assert all(r.n_bytes == 128 + r.media_id for r in rows)
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in mm.extract_features(media).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_real_decoder_raises_cleanly(media):
    feats = mm.extract_features(media, use_fake_decoder=False)
    with pytest.raises(Exception, match="no codec"):
        feats.collect()


def test_resize_rewrites_metadata(media):
    out = mm.resize_images(media, 32, 24)
    rows = out.collect()
    assert rows and all(r.kind == "image" for r in rows)
    assert all(r.meta.width == 32 and r.meta.height == 24 for r in rows)


def test_frame_sampling_explodes_by_duration(media):
    frames = mm.sample_frames(media, every_ms=500)
    per_video = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    durations = {r.media_id: r.meta.duration_ms for r in media.filter("kind='video'").collect()}
    assert per_video
    for r in per_video:
        assert r.n == durations[r.media_id] // 500 + 1
