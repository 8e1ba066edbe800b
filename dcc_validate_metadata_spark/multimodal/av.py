"""Audio/video columns: opaque binary payloads + typed metadata structs.

Multimodal training-data plumbing (graft-added). Decode support:

* **PCM WAV audio is decoded for real** — RIFF/WAVE is a stdlib format
  (``wave`` + numpy), no codec library needed. 16/32-bit PCM, any
  channel count (downmixed to mono for features).
* **IMA ADPCM audio is decoded for real** — a genuine lossy 4:1
  compressed codec (format tag 0x11, 4-bit differential coding with an
  adaptive step size) implemented from the public IMA spec below.
* **Uncompressed AVI video is decoded for real** — the RIFF/DIB
  container is plain chunk walking (``encode_avi`` / ``decode_avi``
  below, pure stdlib ``struct`` + numpy): 24-bit '00db' frames,
  bottom-up padded BGR rows, lossless round-trip, container parsed once
  per clip.
* **Motion-JPEG AVI video is decoded for real** — '00dc' frames with
  biCompression='MJPG', each an independent baseline-JFIF stream decoded
  by the real T.81 codec in ``images/jpeg.py``.
* Other compressed audio (mp3/flac/ogg) and inter-frame video codecs
  (h264/vp9/…) remain STUBBED — clearly marked below — behind
  ``NotImplementedError`` (default) or a deterministic fake used by
  tests. Those need entropy/motion machinery whose specs are impractical
  to reimplement here; swap ``_decode_audio_stub`` / ``_decode_frame_stub``
  for soundfile / PyAV calls on a real cluster, no signature changes.

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


# --------------------------------------------------------------------------
# REAL compressed audio: IMA/DVI ADPCM WAV (format tag 0x11) — a genuine
# lossy 4:1 codec (4-bit differential coding with an adaptive step size),
# implemented from the public IMA spec. No library needed; the stdlib
# ``wave`` module refuses non-PCM tags, so the RIFF walk is manual.
# --------------------------------------------------------------------------

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Quantize one sample; returns (4-bit code, new pred, new index)."""
    step = _IMA_STEP_TABLE[index]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = pred - diffq if code & 8 else pred + diffq
    pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
    index += _IMA_INDEX_TABLE[code & 7]
    index = 0 if index < 0 else (88 if index > 88 else index)
    return code, pred, index


def encode_ima_adpcm_wav(
    samples: np.ndarray, sample_rate: int, block_align: int = 256
) -> bytes:
    """float samples in [-1, 1] → mono IMA ADPCM RIFF/WAVE (tag 0x11).
    Standard block layout: 4-byte header (predictor int16, step index
    uint8, reserved) then low-nibble-first 4-bit codes."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (x * 32767.0).astype(np.int64)
    spb = (block_align - 4) * 2 + 1  # samples per block
    blocks = bytearray()
    pred, index = 0, 0
    n = len(pcm)
    pcm_list = pcm.tolist()
    for start in range(0, n, spb):
        chunk = pcm_list[start : start + spb]
        pred = chunk[0]
        blocks += struct.pack("<hBB", pred, index, 0)
        nibbles: list[int] = []
        for s in chunk[1:]:
            code, pred, index = _ima_step(s, pred, index)
            nibbles.append(code)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))
        # pad the final partial block to block_align
        short = block_align - 4 - len(nibbles) // 2
        if short > 0:
            blocks += b"\0" * short
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        (sample_rate * block_align + spb - 1) // spb,  # avg bytes/sec
        block_align, 4, 2, spb,
    )
    data_ck = bytes(blocks)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data_ck)) + data_ck
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_chunks(data: bytes) -> dict[bytes, bytes]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    out: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag not in out:  # first occurrence wins
            out[tag] = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    return out


def wav_format_tag(data: bytes) -> int:
    """wFormatTag of a RIFF/WAVE payload (1=PCM, 0x11=IMA ADPCM, ...)."""
    fmt = _wav_chunks(data).get(b"fmt ")
    if fmt is None or len(fmt) < 2:
        raise ValueError("WAV missing fmt chunk")
    return struct.unpack_from("<H", fmt)[0]


def decode_ima_adpcm_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Mono IMA ADPCM RIFF/WAVE → (float32 samples in [-1, 1], rate)."""
    chunks = _wav_chunks(data)
    fmt = chunks.get(b"fmt ")
    payload = chunks.get(b"data")
    if fmt is None or payload is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, sr, _abps, block_align, bits = struct.unpack_from("<HHIIHH", fmt)
    if tag != 0x11:
        raise ValueError(f"not IMA ADPCM (format tag {tag})")
    if nch != 1:
        raise ValueError("only mono IMA ADPCM supported")
    if bits != 4:
        raise ValueError(f"unsupported ADPCM bit depth {bits}")
    if block_align < 5:
        # 4-byte block header + at least one code byte; anything smaller
        # is corrupt and would otherwise escape as a raw struct.error
        # below (ValueError is what _decode_audio's dispatch handles)
        raise ValueError(f"corrupt ADPCM block_align {block_align}")
    total = None
    fact = chunks.get(b"fact")
    if fact is not None and len(fact) >= 4:
        (total,) = struct.unpack_from("<I", fact)
    step_tbl = _IMA_STEP_TABLE
    idx_tbl = _IMA_INDEX_TABLE
    out: list[int] = []
    for start in range(0, len(payload) - 3, block_align):
        block = payload[start : start + block_align]
        pred, index, _ = struct.unpack_from("<hBB", block)
        if index > 88:
            raise ValueError("corrupt ADPCM block (step index > 88)")
        out.append(pred)
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                step = step_tbl[index]
                diffq = step >> 3
                if code & 4:
                    diffq += step
                if code & 2:
                    diffq += step >> 1
                if code & 1:
                    diffq += step >> 2
                pred = pred - diffq if code & 8 else pred + diffq
                pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
                index += idx_tbl[code & 7]
                index = 0 if index < 0 else (88 if index > 88 else index)
                out.append(pred)
    x = np.array(out, dtype=np.float32) / 32767.0
    if total is not None:
        x = x[:total]
    return x, sr


def _decode_audio(data: bytes, meta: dict, fake: bool) -> np.ndarray:
    """Dispatch: real WAV decode for RIFF payloads / pcm_wav codec tags —
    integer PCM via stdlib ``wave``, IMA ADPCM (tag 0x11) via the real
    codec above — else the stub (other compressed codecs need a library
    this sandbox lacks). RIFF containers that are NOT WAV (WebP/AVI share
    the RIFF magic) and truncated payloads fall through to the stub
    instead of killing the Spark stage with a raw wave.Error."""
    if data[:4] == b"RIFF" or meta.get("codec") == "pcm_wav":
        try:
            if data[:4] == b"RIFF" and data[8:12] == b"WAVE" and wav_format_tag(data) == 0x11:
                pcm, _sr = decode_ima_adpcm_wav(data)
                return pcm
            pcm, _sr, _nch = decode_pcm_wav(data)
            return pcm
        except (wave.Error, EOFError):
            pass  # not actually WAV (WebP/AVI/truncated): stub decides
        except ValueError as e:
            # genuinely WAV but an unsupported variant (e.g. 24-bit PCM,
            # stereo ADPCM): never mislabel it as opaque compressed audio;
            # fake mode may still use the stub signal for plumbing tests
            if not fake:
                raise NotImplementedError(
                    f"WAV variant not supported: {e}"
                ) from e
    return _decode_audio_stub(data, meta, fake)


# --------------------------------------------------------------------------
# REAL uncompressed-AVI codec (pure stdlib RIFF/DIB — no codec library).
# Mirrors the PCM-WAV story for video: the CONTAINER format is simple
# chunk walking, so raw 24-bit DIB video decodes for real; compressed
# codecs (h264/vp9/...) remain stubbed below.
# --------------------------------------------------------------------------

import struct


_MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def encode_avi(frames: list, fps: float, codec: str = "rawvideo") -> bytes:
    """(h, w, 3) uint8 RGB frames → minimal RIFF/AVI bytes.

    ``codec='rawvideo'``: one uncompressed 24-bit DIB video stream
    ('00db' chunks, bottom-up BGR rows padded to 4 bytes — the classic
    Video-for-Windows layout). ``codec='mjpeg'``: Motion-JPEG — each
    frame is an independent REAL baseline-JFIF stream (images/jpeg.py)
    in a '00dc' chunk with biCompression='MJPG', the standard intra-only
    compressed AVI layout."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, _ = frames[0].shape
    row_pad = (-(w * 3)) % 4

    if codec == "mjpeg":
        from ..images.jpeg import encode_jpeg

        payloads = [encode_jpeg(np.ascontiguousarray(f)) for f in frames]
        frame_size = max(len(p) for p in payloads)
        compression = _MJPG_FOURCC
        handler = b"MJPG"
        chunk_id = b"00dc"
    elif codec == "rawvideo":
        frame_size = (w * 3 + row_pad) * h
        compression = 0
        handler = b"DIB "
        chunk_id = b"00db"

        def frame_bytes(f):
            bgr = np.ascontiguousarray(f[::-1, :, ::-1])  # bottom-up, BGR
            if row_pad:
                rows = bgr.reshape(h, w * 3)
                rows = np.hstack([rows, np.zeros((h, row_pad), dtype=np.uint8)])
                return rows.tobytes()
            return bgr.tobytes()

        payloads = [frame_bytes(f) for f in frames]
    else:
        raise ValueError(f"unknown codec {codec!r}")

    scale, rate = 1000, int(round(fps * 1000))
    avih = struct.pack(
        "<14I",
        # us/frame, max bytes/sec, padding, flags=0 (no idx1 chunk is
        # written, so AVIF_HASINDEX must NOT be claimed)
        int(1e6 / fps), frame_size * int(fps) + 1, 0, 0,
        len(frames), 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", handler, 0, 0, 0, 0, scale, rate, 0, len(frames),
        frame_size, -1, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_size, 0, 0, 0, 0
    )

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\0" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        body = fourcc + payload
        return b"LIST" + struct.pack("<I", len(body)) + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(chunk_id, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_avi(data: bytes) -> tuple[list, float, int, int, bool, str]:
    """Chunk-walk a RIFF/AVI payload WITHOUT decoding pixels: returns
    (raw frame chunks, fps, w, h, bottom_up, mode) with mode 'dib'
    (uncompressed 24-bit) or 'mjpg' (Motion-JPEG — per-frame baseline
    JFIF, decoded by images/jpeg.py). Raises ValueError for non-AVI /
    truncated payloads and NotImplementedError for other compressed
    codecs — never a bare ``struct.error`` (a truncated header must fall
    to the caller's stub path, not kill a Spark task)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    w = h = None
    bottom_up = True
    scale = rate = None
    in_video_stream = False
    mode = "dib"
    frames_raw: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, scale, rate, bottom_up, in_video_stream, mode
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            payload_at = pos + 8
            if fourcc == b"LIST":
                walk(buf, payload_at + 4, payload_at + size)
            elif fourcc == b"strh":
                fcc_type, _hdl, _fl, _pr, _lg, _init, s, r = struct.unpack_from(
                    "<4s4sIHHIII", buf, payload_at
                )
                # the next strf belongs to THIS stream: only a vids strf
                # may be read as a BITMAPINFOHEADER (an audio stream
                # listed first would otherwise be misparsed)
                in_video_stream = fcc_type == b"vids"
                if in_video_stream:
                    scale, rate = s, r
            elif fourcc == b"strf" and in_video_stream and w is None:
                (_sz, bw, bh, _planes, bits, comp) = struct.unpack_from(
                    "<IiiHHI", buf, payload_at
                )
                if comp == _MJPG_FOURCC:
                    mode = "mjpg"
                elif comp != 0 or bits != 24:
                    raise NotImplementedError(
                        f"compressed/non-24-bit AVI stream (bits={bits}, "
                        f"compression={comp}) needs a codec library"
                    )
                w, h = bw, abs(bh)
                bottom_up = bh > 0  # negative biHeight = top-down rows
            elif fourcc in (b"00db", b"00dd", b"00dc"):
                frames_raw.append(buf[payload_at:payload_at + size])
            pos = payload_at + size + (size % 2)

    try:
        walk(data, 12, len(data))
    except struct.error as e:
        raise ValueError(f"truncated AVI header: {e}") from e
    if w is None or not frames_raw:
        raise ValueError("no decodable video stream found in AVI")
    fps = (rate / scale) if (rate and scale) else 25.0
    return frames_raw, fps, w, h, bottom_up, mode


def _dib_frame(raw: bytes, w: int, h: int, bottom_up: bool) -> np.ndarray:
    """One raw DIB chunk → (h, w, 3) uint8 RGB (strip row padding,
    un-flip bottom-up rows, BGR→RGB)."""
    row_pad = (-(w * 3)) % 4
    rows = np.frombuffer(raw, dtype=np.uint8)
    rows = rows[: (w * 3 + row_pad) * h].reshape(h, w * 3 + row_pad)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


def _mjpg_frame(raw: bytes, idx: int, w: int, h: int) -> np.ndarray:
    """Decode one MJPEG frame and enforce the AVI strf header's
    dimensions: each frame carries its own SOF, so a clip whose frames
    disagree with the header would otherwise yield inconsistently-shaped
    frames silently. Raises ValueError (the per-frame error path)."""
    from ..images.jpeg import decode_jpeg

    frame = decode_jpeg(raw)
    if frame.shape[:2] != (h, w):
        raise ValueError(
            f"MJPEG frame {idx} is {frame.shape[1]}x{frame.shape[0]} but "
            f"the AVI header declares {w}x{h}"
        )
    return frame


def decode_avi(data: bytes) -> tuple[list, float, int, int]:
    """Minimal RIFF/AVI reader: uncompressed 24-bit DIB ('00db') and
    Motion-JPEG ('00dc' + biCompression='MJPG', each frame an independent
    baseline-JFIF stream) layouts. Returns ([(h, w, 3) uint8 RGB frames],
    fps, w, h). Raises ValueError for non-AVI payloads and
    NotImplementedError for other compressed streams (biCompression not in
    {0, MJPG} or non-24-bit) — the caller's stub handles those."""
    frames_raw, fps, w, h, bottom_up, mode = _parse_avi(data)
    if mode == "mjpg":
        return (
            [_mjpg_frame(r, i, w, h) for i, r in enumerate(frames_raw)],
            fps, w, h,
        )
    return [_dib_frame(r, w, h, bottom_up) for r in frames_raw], fps, w, h


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


def _clip_decoder(data: bytes, meta: dict, fake: bool):
    """Per-clip frame access: parse the container ONCE, not per frame.
    Returns (get_frame(idx) -> (h, w, 3) uint8, n_frames, fps). Real
    decode for uncompressed RIFF/AVI payloads — header walk only; pixel
    conversion happens LAZILY inside get_frame, so sampling every Nth
    frame decodes 1/N of the pixels and holds no decoded frames beyond
    the one in flight. Compressed streams raise (or fall to the
    deterministic fake in test mode); non-AVI payloads use meta-driven
    stub geometry."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        try:
            frames_raw, fps, w, h, bottom_up, mode = _parse_avi(data)
            if mode == "mjpg":
                return (
                    lambda i: _mjpg_frame(frames_raw[i], i, w, h),
                    len(frames_raw),
                    fps,
                )
            return (
                lambda i: _dib_frame(frames_raw[i], w, h, bottom_up),
                len(frames_raw),
                fps,
            )
        except NotImplementedError:
            if not fake:
                raise
        except ValueError:
            pass  # RIFF but not decodable AVI (WebP/truncated): stub decides
    n_frames = int(meta["duration_sec"] * meta["fps"])
    return (
        lambda i: _decode_frame_stub(data, meta, i, fake),
        n_frames,
        float(meta["fps"]),
    )


def _iter_sampled_frames(
    b: pd.DataFrame, id_col: str, every_sec: float, fake: bool
):
    """Shared sampling loop for one Arrow batch: yields
    (row_id, frame_idx, ts_sec, frame ndarray) for every sampled frame —
    the single place that owns None-skips, per-clip decoding, and step
    arithmetic (sample_video_frames and video_frame_features differ only
    in their per-frame projection)."""
    metas = b["meta"]
    for i, data in enumerate(b["bytes"].tolist()):
        if data is None:
            continue
        meta = dict(metas.iloc[i])
        rid = b[id_col].iloc[i]
        get_frame, n_frames, fps = _clip_decoder(bytes(data), meta, fake)
        step = max(1, int(round(every_sec * fps)))
        for fidx in range(0, n_frames, step):
            try:
                frame = get_frame(fidx)
            except ValueError as e:
                # lazy per-frame decode (MJPEG) can hit a corrupt frame
                # AFTER the container parsed fine: in fake mode fall to
                # the stub frame; strict mode keeps raising but with the
                # clip/frame identified, never a bare codec error
                if fake:
                    frame = _decode_frame_stub(bytes(data), meta, fidx, True)
                else:
                    raise ValueError(
                        f"clip {rid!r} frame {fidx}: {e}"
                    ) from e
            yield rid, fidx, round(fidx / fps, 4), frame


def sample_video_frames(
    df: DataFrame,
    every_sec: float = 1.0,
    id_col: str = "clip_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Frame sampling: one input row fans out to one row per sampled
    frame ``(id, frame_idx, ts_sec, frame_bytes raw RGB)``. The fan-out
    happens INSIDE the Arrow stage (iterator protocol) — no explode of
    materialized frames through a shuffle, no driver round trip.
    Uncompressed AVI payloads decode for REAL (container parsed once per
    clip); compressed codecs stay stubbed."""
    src = df.select(id_col, "bytes", "meta")
    schema = f"{id_col} string, frame_idx int, ts_sec double, frame_bytes binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, tss, frames = [], [], [], []
            for rid, fidx, ts, frame in _iter_sampled_frames(
                b, id_col, every_sec, fake_decode
            ):
                ids.append(rid)
                idxs.append(fidx)
                tss.append(ts)
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


def video_frame_features(
    df: DataFrame,
    every_sec: float = 1.0,
    id_col: str = "clip_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Per-sampled-frame channel statistics ``(id, frame_idx, ts_sec,
    mean_r, mean_g, mean_b)`` computed INSIDE the decode stage — raw
    frames never leave the Arrow batch, so the shuffle carries 6 scalars
    per frame instead of h*w*3 bytes. The feature-extraction shape for a
    100 TB video corpus."""
    src = df.select(id_col, "bytes", "meta")
    schema = (
        f"{id_col} string, frame_idx int, ts_sec double, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {
                id_col: [], "frame_idx": [], "ts_sec": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for rid, fidx, ts, frame in _iter_sampled_frames(
                b, id_col, every_sec, fake_decode
            ):
                f = frame.astype(np.float64)
                out[id_col].append(rid)
                out["frame_idx"].append(fidx)
                out["ts_sec"].append(ts)
                out["mean_r"].append(round(float(f[:, :, 0].mean()), 4))
                out["mean_g"].append(round(float(f[:, :, 1].mean()), 4))
                out["mean_b"].append(round(float(f[:, :, 2].mean()), 4))
            out["frame_idx"] = pd.array(out["frame_idx"], dtype="int32")
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=schema)
