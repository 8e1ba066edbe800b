"""Audio/video columns: opaque binary payloads + typed metadata structs.

Multimodal training-data plumbing (graft-added). This container has no
audio/video codecs, so the DECODE STEP IS STUBBED — clearly marked below
— behind either ``NotImplementedError`` (default) or a deterministic
fake used by the tests. Everything Spark-side is REAL and what matters
at 100 TB: the schema contract (binary payload + metadata struct), the
pruned projection into the UDF stage, the Arrow batch shape, and the
per-row fan-out of frame sampling (one input row → k frame rows via the
iterator protocol, no driver involvement).

Swap ``_decode_audio_stub`` / ``_decode_frame_stub`` for soundfile /
PyAV calls on a real cluster; no signature changes.
"""

from __future__ import annotations

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
# STUBBED DECODERS — no real codecs in this container.
# --------------------------------------------------------------------------

def _decode_audio_stub(data: bytes, meta: dict, fake: bool) -> np.ndarray:
    """STUB: returns float32 PCM (n_samples,). With ``fake=True`` a
    deterministic pseudo-signal derived from the payload hash — enough to
    exercise the full Spark path; otherwise NotImplementedError."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires a codec library (e.g. soundfile); "
            "this sandbox stubs it — pass fake_decode=True for the "
            "deterministic test signal"
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
                pcm = _decode_audio_stub(bytes(data), dict(meta), fake_decode)
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
