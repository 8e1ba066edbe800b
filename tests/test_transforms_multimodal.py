"""Image resize/feature extraction (real kernels) and the audio/video
stub plumbing: schema, batch shape, per-row frame fan-out."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dcc_validate_metadata_spark.images import codec
from dcc_validate_metadata_spark.images.transforms import (
    block_resize,
    extract_features,
    resize_images,
)
from dcc_validate_metadata_spark.multimodal import (
    AUDIO_META_SCHEMA,
    VIDEO_META_SCHEMA,
    audio_features,
    sample_video_frames,
)


def test_block_resize_exact_mean():
    pix = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = block_resize(pix, 2, 2)
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == int(np.mean([pix[0, 0, 0], pix[0, 1, 0], pix[1, 0, 0], pix[1, 1, 0]]))


def test_resize_images_roundtrip(spark, fixture_dir):
    from dcc_validate_metadata_spark.sources.image_table import load_image_table

    df = load_image_table(spark, fixture_dir / "image_caption").limit(40)
    out = resize_images(df, 8, 8).collect()
    assert len(out) > 0
    for r in out:
        assert (r["w"], r["h"]) == (8, 8)
        pix, fmt = codec.decode_image(bytes(r["bytes"]))
        assert fmt == "png" and pix.shape == (8, 8, 3)


def test_extract_features_shapes(spark, fixture_dir):
    from dcc_validate_metadata_spark.sources.image_table import load_image_table

    df = load_image_table(spark, fixture_dir / "image_caption").limit(40)
    feats = extract_features(df).collect()
    assert len(feats) > 0
    for r in feats:
        assert 0.0 <= r["mean_r"] <= 255.0
        assert len(r["luma_hist"]) == 8
        assert abs(sum(r["luma_hist"]) - 1.0) < 1e-4


@pytest.fixture(scope="module")
def audio_df(spark):
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("meta", AUDIO_META_SCHEMA),
        ]
    )
    rows = [
        (f"a{i}", bytes([i] * 32), (16000, 1, 0.25, "pcm_stub")) for i in range(6)
    ]
    return spark.createDataFrame(rows, schema)


def test_audio_stub_raises_without_fake(spark, audio_df):
    with pytest.raises(Exception, match="codec library"):
        audio_features(audio_df).collect()


def test_audio_features_deterministic(spark, audio_df):
    r1 = {r["clip_id"]: r for r in audio_features(audio_df, fake_decode=True).collect()}
    r2 = {r["clip_id"]: r for r in audio_features(audio_df, fake_decode=True).collect()}
    assert len(r1) == 6
    for k in r1:
        assert r1[k]["rms"] == r2[k]["rms"]
        assert 0.0 < r1[k]["rms"] < 1.0
        assert r1[k]["zero_crossings"] > 0


@pytest.fixture(scope="module")
def video_df(spark):
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("meta", VIDEO_META_SCHEMA),
        ]
    )
    rows = [("v0", b"\x01" * 64, (10.0, 2.0, 16, 8, "h264_stub")),
            ("v1", b"\x02" * 64, (10.0, 1.0, 16, 8, "h264_stub"))]
    return spark.createDataFrame(rows, schema)


def test_frame_sampling_fanout(spark, video_df):
    frames = sample_video_frames(video_df, every_sec=0.5, fake_decode=True).collect()
    by_clip: dict[str, list] = {}
    for r in frames:
        by_clip.setdefault(r["clip_id"], []).append(r)
    # v0: 2 s @ 10 fps, every 0.5 s -> frames 0,5,10,15; v1: 1 s -> 0,5
    assert sorted(r["frame_idx"] for r in by_clip["v0"]) == [0, 5, 10, 15]
    assert sorted(r["frame_idx"] for r in by_clip["v1"]) == [0, 5]
    for r in frames:
        assert len(r["frame_bytes"]) == 16 * 8 * 3  # raw RGB, declared dims
        assert r["ts_sec"] == r["frame_idx"] / 10.0
