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


def test_real_wav_decode_roundtrip():
    """PCM WAV is a REAL decode path (stdlib), not a stub: encode a sine,
    decode it back, check fidelity."""
    import numpy as np

    from dcc_validate_metadata_spark.multimodal.av import (
        decode_pcm_wav,
        encode_pcm_wav,
    )

    sr = 8000
    t = np.arange(sr) / sr  # 1 second
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    data = encode_pcm_wav(sig, sr)
    assert data[:4] == b"RIFF"
    back, got_sr, nch = decode_pcm_wav(data)
    assert got_sr == sr and nch == 1 and len(back) == sr
    assert np.abs(back - sig).max() < 1e-3  # 16-bit quantization only
    # stereo downmix
    stereo = encode_pcm_wav(sig, sr, n_channels=2)
    back2, _, nch2 = decode_pcm_wav(stereo)
    assert nch2 == 2 and np.abs(back2 - sig).max() < 1e-3


def test_audio_features_real_wav_no_fake(spark):
    """audio_features runs WITHOUT fake_decode on real WAV payloads and
    produces the analytically-expected statistics."""
    import math

    import numpy as np

    from dcc_validate_metadata_spark.multimodal.av import (
        audio_features,
        encode_pcm_wav,
    )

    sr, dur, freq, amp = 8000, 1.0, 440.0, 0.5
    t = np.arange(int(sr * dur)) / sr
    wav = encode_pcm_wav(amp * np.sin(2 * np.pi * freq * t), sr)
    df = spark.createDataFrame(
        [("clip1", bytearray(wav), (sr, 1, dur, "pcm_wav"))],
        "clip_id string, bytes binary, "
        "meta struct<sample_rate int, n_channels int, duration_sec double, codec string>",
    )
    row = audio_features(df).collect()[0]  # fake_decode NOT set
    assert abs(row["rms"] - amp / math.sqrt(2)) < 1e-3
    assert abs(row["peak"] - amp) < 1e-3
    # a 440 Hz sine crosses zero ~2*440 times per second
    assert abs(row["zero_crossings"] - 2 * freq) <= 2


def test_riff_but_not_wav_falls_through_to_stub(spark):
    """RIFF containers that aren't integer-PCM WAV (WebP/float-WAV/
    truncated) must not crash the stage: fake mode falls through to the
    deterministic stub, strict mode raises the stub's clear error."""
    import numpy as np
    import pytest

    from dcc_validate_metadata_spark.multimodal.av import _decode_audio

    meta = {"sample_rate": 8000, "n_channels": 1, "duration_sec": 0.1,
            "codec": "webp"}
    not_wav = b"RIFF\x00\x00\x00\x00WEBPVP8 "
    out = _decode_audio(not_wav, meta, fake=True)
    assert isinstance(out, np.ndarray) and len(out) == 800  # stub signal
    with pytest.raises(NotImplementedError):
        _decode_audio(not_wav, meta, fake=False)
    # truncated payload tagged pcm_wav: same fallthrough
    out2 = _decode_audio(b"RI", {**meta, "codec": "pcm_wav"}, fake=True)
    assert isinstance(out2, np.ndarray)


def test_unsupported_pcm_width_not_mislabeled():
    """24-bit PCM WAV: never mislabeled as compressed audio — strict mode
    raises a width-specific NotImplementedError, fake mode still runs."""
    import io
    import wave as _wave

    import numpy as np
    import pytest

    from dcc_validate_metadata_spark.multimodal.av import _decode_audio

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)  # 24-bit
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02" * 100)
    data = buf.getvalue()
    meta = {"sample_rate": 8000, "n_channels": 1, "duration_sec": 0.0125,
            "codec": "pcm_wav"}
    with pytest.raises(NotImplementedError, match="WAV variant"):
        _decode_audio(data, meta, fake=False)
    out = _decode_audio(data, meta, fake=True)
    assert isinstance(out, np.ndarray)


def test_avi_roundtrip_lossless():
    """encode_avi → decode_avi is lossless for padded and unpadded
    widths, preserves fps, and rejects non-AVI / compressed payloads."""
    from dcc_validate_metadata_spark.multimodal.av import decode_avi, encode_avi

    rng = np.random.default_rng(5)
    for w, h, fps, n in [(17, 12, 10.0, 5), (16, 8, 25.0, 3), (3, 2, 5.0, 1)]:
        frames = [
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        back, got_fps, got_w, got_h = decode_avi(encode_avi(frames, fps=fps))
        assert (got_w, got_h, got_fps) == (w, h, fps)
        assert len(back) == n
        assert all(np.array_equal(a, b) for a, b in zip(frames, back))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi(b"garbage")


def test_video_frames_real_avi_no_fake(spark):
    """Uncompressed AVI decodes for REAL through the Spark stage — no
    fake_decode flag — and sampled frames round-trip the encoder's
    pixels exactly."""
    from pyspark.sql import functions as F

    from dcc_validate_metadata_spark.multimodal.av import (
        encode_avi,
        sample_video_frames,
    )

    rng = np.random.default_rng(9)
    frames = [
        rng.integers(0, 256, size=(6, 7, 3), dtype=np.uint8) for _ in range(8)
    ]
    data = encode_avi(frames, fps=2.0)
    df = spark.createDataFrame(
        [("c1", bytearray(data), 2.0, 4.0, 7, 6, "rawvideo")],
        "clip_id string, bytes binary, fps double, duration_sec double, "
        "w int, h int, codec string",
    ).select(
        "clip_id",
        "bytes",
        F.struct("fps", "duration_sec", "w", "h", "codec").alias("meta"),
    )
    rows = sample_video_frames(df, every_sec=1.0).collect()  # every 2nd frame
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
    got = np.frombuffer(rows[1]["frame_bytes"], dtype=np.uint8).reshape(6, 7, 3)
    assert np.array_equal(got, frames[2])


def test_avi_top_down_dib_not_flipped():
    """Negative biHeight (top-down rows) must decode in correct
    orientation — only bottom-up streams get the row flip."""
    import struct as _struct

    from dcc_validate_metadata_spark.multimodal.av import decode_avi, encode_avi

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)]
    data = bytearray(encode_avi(frames, fps=5.0))
    # locate the strf chunk and negate biHeight; rewrite the frame chunk
    # rows as TOP-DOWN (no flip) so the image content is unchanged
    i = bytes(data).index(b"strf")
    # biHeight sits at strf payload offset 8 (after biSize, biWidth)
    (bh,) = _struct.unpack_from("<i", data, i + 8 + 8)
    _struct.pack_into("<i", data, i + 8 + 8, -bh)
    j = bytes(data).index(b"00db")
    bgr_top_down = np.ascontiguousarray(frames[0][:, :, ::-1])  # no row flip
    data[j + 8 : j + 8 + bgr_top_down.nbytes] = bgr_top_down.tobytes()
    back, _fps, _w, _h = decode_avi(bytes(data))
    assert np.array_equal(back[0], frames[0])


def test_truncated_avi_header_falls_to_stub(spark):
    """A payload with RIFF/AVI magic but a truncated header must fall to
    the stub path (fake mode) or raise cleanly — never a raw
    struct.error escaping the Spark task."""
    from dcc_validate_metadata_spark.multimodal.av import _clip_decoder

    truncated = b"RIFF\x20\x00\x00\x00AVI LIST\x10\x00\x00\x00hdrlstrh\x04\x00"
    meta = {"fps": 2.0, "duration_sec": 2.0, "w": 4, "h": 3, "codec": "rawvideo"}
    get_frame, n, fps = _clip_decoder(truncated, meta, fake=True)
    assert n == 4 and fps == 2.0
    assert get_frame(0).shape == (3, 4, 3)


def test_ima_adpcm_roundtrip():
    """Real IMA ADPCM codec: 4:1 compressed WAV (tag 0x11) round-trips
    within the codec's adaptive-step error bound on band-limited audio,
    and the RIFF writer/parser agree on block layout + fact-chunk length."""
    from dcc_validate_metadata_spark.multimodal.av import (
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
        wav_format_tag,
    )

    sr = 8000
    t = np.arange(int(sr * 0.5)) / sr
    sig = 0.5 * np.sin(2 * np.pi * 220.0 * t) + 0.1 * np.sin(
        2 * np.pi * 700.0 * t
    )
    data = encode_ima_adpcm_wav(sig, sr)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert wav_format_tag(data) == 0x11
    # genuinely compressed: ~4 bits/sample vs 16
    assert len(data) < len(sig) * 16 // 8 // 3
    back, got_sr = decode_ima_adpcm_wav(data)
    assert got_sr == sr and len(back) == len(sig)
    # SNR of the decoded signal vs the float input (codec is lossy but
    # must track band-limited content closely)
    err = back - sig.astype(np.float32)
    snr = 10 * np.log10(np.mean(sig**2) / np.mean(err**2))
    assert snr > 20.0, snr


def test_adpcm_through_audio_features(spark):
    """ADPCM WAV decodes for REAL through the Spark audio-features stage
    (no fake flag): features computed from the decoded samples match a
    direct local decode of the same payload."""
    from pyspark.sql import functions as F

    from dcc_validate_metadata_spark.multimodal.av import (
        audio_features,
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
    )

    sr = 8000
    t = np.arange(sr) / sr
    sig = 0.4 * np.sin(2 * np.pi * 330.0 * t)
    data = encode_ima_adpcm_wav(sig, sr)
    df = spark.createDataFrame(
        [("a1", bytearray(data), sr, 1, 1.0, "ima_adpcm")],
        "clip_id string, bytes binary, sample_rate int, n_channels int, "
        "duration_sec double, codec string",
    ).select(
        "clip_id",
        "bytes",
        F.struct(
            "sample_rate", "n_channels", "duration_sec", "codec"
        ).alias("meta"),
    )
    row = audio_features(df).collect()[0]
    pcm, _ = decode_ima_adpcm_wav(data)
    assert row["rms"] == round(float(np.sqrt(np.mean(pcm**2))), 6)
    assert row["peak"] == round(float(np.abs(pcm).max()), 6)


def test_mjpeg_avi_roundtrip():
    """Motion-JPEG AVI: each frame an independent real JFIF stream; the
    container round-trips dims/fps and decoded frames stay within the
    JPEG quantization error bound on smooth content."""
    from dcc_validate_metadata_spark.images.codec import psnr
    from dcc_validate_metadata_spark.multimodal.av import decode_avi, encode_avi

    rng = np.random.default_rng(21)
    frames = []
    for f in range(4):
        base = rng.uniform(0, 255, size=(3, 3, 3))
        up = np.clip(
            np.rint(
                np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
                + rng.normal(0, 2, size=(24, 24, 3))
            ),
            0,
            255,
        ).astype(np.uint8)
        frames.append(up)
    data = encode_avi(frames, fps=10.0, codec="mjpeg")
    assert b"MJPG" in data and b"00dc" in data
    back, fps, w, h = decode_avi(data)
    assert (fps, w, h, len(back)) == (10.0, 24, 24, 4)
    for a, b in zip(frames, back):
        assert psnr(a, b) >= 40.0


def test_mjpeg_through_video_frames(spark):
    """MJPEG AVI decodes for REAL through the Spark frame-sampling stage
    — sampled frames match a direct local decode of the same payload."""
    from pyspark.sql import functions as F

    from dcc_validate_metadata_spark.multimodal.av import (
        decode_avi,
        encode_avi,
        sample_video_frames,
    )

    rng = np.random.default_rng(22)
    frames = [
        np.clip(
            np.rint(
                np.repeat(
                    np.repeat(rng.uniform(0, 255, size=(2, 2, 3)), 8, axis=0),
                    8,
                    axis=1,
                )
            ),
            0,
            255,
        ).astype(np.uint8)
        for _ in range(6)
    ]
    data = encode_avi(frames, fps=2.0, codec="mjpeg")
    df = spark.createDataFrame(
        [("m1", bytearray(data), 2.0, 3.0, 16, 16, "mjpeg")],
        "clip_id string, bytes binary, fps double, duration_sec double, "
        "w int, h int, codec string",
    ).select(
        "clip_id",
        "bytes",
        F.struct("fps", "duration_sec", "w", "h", "codec").alias("meta"),
    )
    rows = sample_video_frames(df, every_sec=1.0).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    local = decode_avi(data)[0]
    got = np.frombuffer(rows[1]["frame_bytes"], dtype=np.uint8).reshape(16, 16, 3)
    assert np.array_equal(got, local[2])


def test_mjpeg_frame_dims_must_match_header():
    """An MJPEG clip whose frames disagree with the AVI strf header's
    dimensions raises (per-frame error path) instead of silently
    yielding inconsistently-shaped frames."""
    import struct

    from dcc_validate_metadata_spark.multimodal.av import decode_avi, encode_avi

    frames = [np.zeros((24, 24, 3), dtype=np.uint8) for _ in range(2)]
    data = bytearray(encode_avi(frames, fps=5.0, codec="mjpeg"))
    at = data.index(b"strf") + 8  # BITMAPINFOHEADER starts after fourcc+size
    struct.pack_into("<ii", data, at + 4, 16, 16)  # biWidth/biHeight lie
    with pytest.raises(ValueError, match="24x24.*declares 16x16"):
        decode_avi(bytes(data))
