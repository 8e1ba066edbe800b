"""Audio/video columns: opaque binary payloads + typed metadata structs.

Multimodal training-data plumbing (graft-added). Decode support:

* **PCM WAV audio is decoded for real** — RIFF/WAVE is a stdlib format
  (``wave`` + numpy), no codec library needed. 16/32-bit PCM, any
  channel count (downmixed to mono for features).
* Compressed audio (mp3/flac/ogg) and ALL video decoding are STUBBED —
  clearly marked below — behind ``NotImplementedError`` (default) or a
  deterministic fake used by tests. This container has no such codecs;
  swap ``_decode_audio_stub`` / ``_decode_frame_stub`` for soundfile /
  PyAV calls on a real cluster, no signature changes.

Everything Spark-side is REAL and what matters at 100 TB: the schema
contract (binary payload + metadata struct), the pruned projection into
the UDF stage, the Arrow batch shape, and the per-row fan-out of frame
sampling (one input row → k frame rows via the iterator protocol, no
driver involvement).
"""

from __future__ import annotations

import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("codec", T.StringType()),
    ]
)

VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("fps", T.DoubleType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)


# --------------------------------------------------------------------------
# REAL PCM WAV codec (stdlib wave + numpy — no external library)
# --------------------------------------------------------------------------

def encode_pcm_wav(
    samples: np.ndarray, sample_rate: int, n_channels: int = 1
) -> bytes:
    """float samples in [-1, 1] → 16-bit PCM RIFF/WAVE bytes."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if n_channels > 1 and x.ndim == 1:
        x = np.repeat(x[:, None], n_channels, axis=1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((x * 32767.0).astype("<i2").tobytes())
    return buf.getvalue()


def decode_pcm_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE bytes → (float32 mono samples in [-1, 1], sample_rate,
    n_channels). 16- and 32-bit PCM supported; multi-channel audio is
    downmixed to mono by channel mean (the features are level/shape
    statistics, not spatial)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483647.0
    else:
        raise ValueError(f"unsupported PCM sample width {width} bytes")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr, nch


def _decode_audio(data: bytes, meta: dict, fake: bool) -> np.ndarray:
    """Dispatch: real WAV decode for RIFF payloads / pcm_wav codec tags,
    else the stub (compressed codecs need a library this sandbox lacks).
    RIFF containers that are NOT integer-PCM WAV (float WAVs, mp3-in-WAV,
    WebP/AVI share the RIFF magic) and truncated payloads fall through to
    the stub instead of killing the Spark stage with a raw wave.Error."""
    if data[:4] == b"RIFF" or meta.get("codec") == "pcm_wav":
        try:
            pcm, _sr, _nch = decode_pcm_wav(data)
            return pcm
        except (wave.Error, EOFError):
            pass  # not actually WAV (WebP/AVI/truncated): stub decides
        except ValueError as e:
            # genuinely WAV but an unsupported PCM variant (e.g. 24-bit):
            # never mislabel it as compressed audio; fake mode may still
            # use the stub signal for plumbing tests
            if not fake:
                raise NotImplementedError(
                    f"PCM WAV variant not supported: {e}"
                ) from e
    return _decode_audio_stub(data, meta, fake)


# --------------------------------------------------------------------------
# STUBBED DECODERS — no compressed-audio/video codecs in this container.
# --------------------------------------------------------------------------

def _decode_audio_stub(data: bytes, meta: dict, fake: bool) -> np.ndarray:
    """STUB: returns float32 PCM (n_samples,). With ``fake=True`` a
    deterministic pseudo-signal derived from the payload hash — enough to
    exercise the full Spark path; otherwise NotImplementedError."""
    if not fake:
        raise NotImplementedError(
            "compressed-audio decode requires a codec library (e.g. "
            "soundfile); this sandbox stubs it — PCM WAV payloads decode "
            "for real, or pass fake_decode=True for the test signal"
        )
    n = max(1, int(meta["sample_rate"] * meta["duration_sec"]))
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "big") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float32) / meta["sample_rate"]
    freq = 110.0 + float(seed % 800)
    return (0.5 * np.sin(2 * np.pi * freq * t)
            + 0.05 * rng.standard_normal(n).astype(np.float32))


def _decode_frame_stub(
    data: bytes, meta: dict, frame_idx: int, fake: bool
) -> np.ndarray:
    """STUB: returns one (h, w, 3) uint8 frame. Deterministic per
    (payload, frame index) when ``fake=True``."""
    if not fake:
        raise NotImplementedError(
            "video decode requires PyAV/ffmpeg; this sandbox stubs it — "
            "pass fake_decode=True for deterministic test frames"
        )
    seed = (int.from_bytes(data[:8].ljust(8, b"\0"), "big") + frame_idx) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(meta["h"], meta["w"], 3), dtype=np.uint8)


# --------------------------------------------------------------------------
# REAL Spark plumbing
# --------------------------------------------------------------------------

def audio_features(
    df: DataFrame,
    id_col: str = "clip_id",
    fake_decode: bool = False,
) -> DataFrame:
    """(id, rms, peak, zero_crossings) per clip. Input:
    ``(id, bytes, meta AUDIO_META_SCHEMA)``. One pruned projection into
    one Arrow stage; features are numpy over the decoded PCM."""
    src = df.select(id_col, "bytes", "meta")
    schema = f"{id_col} string, rms double, peak double, zero_crossings long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, rms, peak, zc = [], [], [], []
            metas = b["meta"]
            for i, data in enumerate(b["bytes"].tolist()):
                if data is None:
                    continue
                meta = metas.iloc[i]
                pcm = _decode_audio(bytes(data), dict(meta), fake_decode)
                ids.append(b[id_col].iloc[i])
                rms.append(round(float(np.sqrt(np.mean(pcm**2))), 6))
                peak.append(round(float(np.abs(pcm).max()), 6))
                zc.append(int(np.count_nonzero(np.diff(np.signbit(pcm)))))
            yield pd.DataFrame(
                {id_col: ids, "rms": rms, "peak": peak,
                 "zero_crossings": pd.array(zc, dtype="int64")}
            )

    return src.mapInPandas(run, schema=schema)


def sample_video_frames(
    df: DataFrame,
    every_sec: float = 1.0,
    id_col: str = "clip_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Frame sampling: one input row fans out to one row per sampled
    frame ``(id, frame_idx, ts_sec, frame_bytes raw RGB)``. The fan-out
    happens INSIDE the Arrow stage (iterator protocol) — no explode of
    materialized frames through a shuffle, no driver round trip."""
    src = df.select(id_col, "bytes", "meta")
    schema = f"{id_col} string, frame_idx int, ts_sec double, frame_bytes binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, tss, frames = [], [], [], []
            metas = b["meta"]
            for i, data in enumerate(b["bytes"].tolist()):
                if data is None:
                    continue
                meta = dict(metas.iloc[i])
                n_frames = int(meta["duration_sec"] * meta["fps"])
                step = max(1, int(round(every_sec * meta["fps"])))
                for fidx in range(0, n_frames, step):
                    frame = _decode_frame_stub(bytes(data), meta, fidx, fake_decode)
                    ids.append(b[id_col].iloc[i])
                    idxs.append(fidx)
                    tss.append(round(fidx / meta["fps"], 4))
                    frames.append(frame.tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ts_sec": tss,
                    "frame_bytes": frames,
                }
            )

    return src.mapInPandas(run, schema=schema)
