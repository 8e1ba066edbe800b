"""Tests for the real lossy-WebP codec (images/vp8.py, RFC 6386).

Self-contained checks (no external decoder): boolean-coder duality,
transform inverses, encoder/decoder roundtrips across every feature
toggle, error paths, and the allocation guard. Bit-exact conformance
against libwebp lives in test_vp8_conformance.py (skip-gated on the
system library)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dcc_validate_metadata_spark.images import codec, vp8, vp8l


def _rt(img: np.ndarray, **kw):
    data = vp8.encode_webp_vp8(img, **kw)
    dec = vp8l.decode_webp(data)
    assert dec.shape == img.shape
    return data, dec


def _smooth(shape, seed=0, amp=4.0):
    rng = np.random.default_rng(seed)
    cells = (shape[0] // 8 + 1, shape[1] // 8 + 1, 3)
    base = np.repeat(np.repeat(rng.uniform(20, 235, cells), 8, 0), 8, 1)
    img = base[: shape[0], : shape[1]] + rng.normal(0, amp, shape + (3,))
    return np.clip(np.rint(img), 0, 255).astype(np.uint8)


def test_bool_coder_duality():
    rng = np.random.default_rng(1)
    probs = rng.integers(1, 255, size=400).tolist()
    bits = rng.integers(0, 2, size=400).tolist()
    be = vp8.BoolEncoder()
    for p, b in zip(probs, bits):
        be.bit(p, b)
    be.literal(7, 99)
    be.signed_literal(6, -17)
    stream = be.flush()
    bd = vp8.BoolDecoder(stream)
    for p, b in zip(probs, bits):
        assert bd.bit(p) == b
    assert bd.literal(7) == 99
    assert bd.signed_literal(6) == -17


def test_tree_write_read_duality():
    be = vp8.BoolEncoder()
    seq = list(range(10)) + [9, 0, 4, 5, 6]
    probs = vp8.KF_BMODE_PROBS[2][7]
    for leaf in seq:
        vp8._tree_write(be, vp8.BMODE_TREE, probs, leaf)
    bd = vp8.BoolDecoder(be.flush())
    for leaf in seq:
        assert bd.tree(vp8.BMODE_TREE, probs) == leaf


def test_iwht_inverts_fwht_scale():
    """The forward WHT carries a x16 gain (x4 per pass) that the inverse
    plus dequant-by-2 structure absorbs; check the pure inverse against
    a brute-force Walsh-Hadamard on small integers."""
    rng = np.random.default_rng(2)
    dcs = rng.integers(-500, 500, size=16).tolist()
    fw = vp8._fwht4x4(dcs)
    # undo: iwht(fw) should reproduce dcs up to the +-1 rounding of the
    # two >>3 stages on a x16-scaled transform pair
    back = vp8._iwht4x4(fw)
    assert max(abs(a - b) for a, b in zip(back, dcs)) <= 1


def test_idct_dc_only():
    """A DC-only coefficient block must reconstruct to the flat value
    (dc + 4) >> 3 per the final rounding stage."""
    for dc in (-1000, -8, 0, 8, 123, 2000):
        out = vp8._idct4x4([dc] + [0] * 15)
        assert all(v == ((dc + 4) >> 3) for v in out)


def test_roundtrip_psnr_by_quality():
    """Lower qindex (finer quantizer) must buy PSNR on 4:2:0-friendly
    content. Chroma must be band-limited here: per-pixel chroma noise is
    destroyed by subsampling itself (~26 dB ceiling for ANY encoder —
    libwebp decodes to within 0.01 dB of us on such content), which
    would swamp the quantizer signal this test is about."""
    from dcc_validate_metadata_spark.sources.image_table import (
        _chroma_smooth_pixels,
    )

    img = _chroma_smooth_pixels(np.random.default_rng(3), 48, 48)
    prev = -1.0
    for q in (80, 40, 10, 0):
        _, dec = _rt(img, qindex=q, mode="auto")
        p = codec.psnr(img, dec)
        assert p > prev + 1.0, f"qindex {q} PSNR {p} vs {prev}"
        prev = p
    assert prev >= 43.0, f"qindex 0 PSNR {prev}"


def test_all_16x16_modes_roundtrip():
    img = _smooth((32, 32), seed=4)
    for m in range(4):
        _rt(img, qindex=20, mode=m, uv_mode=m)


def test_bpred_and_random_roundtrip():
    img = _smooth((48, 48), seed=5)
    _rt(img, qindex=20, mode="bpred")
    _rt(img, qindex=20, mode="random", uv_mode="random", seed=11)


def test_feature_matrix_roundtrip():
    img = _smooth((48, 48), seed=6)
    for kw in (
        dict(filter_level=25),
        dict(filter_level=40, filter_type=1, sharpness=2),
        dict(partitions=4),
        dict(partitions=8, mode="random", seed=2),
        dict(use_skip=True, qindex=110),
        dict(use_skip=False),
        dict(q_deltas=(4, -2, 3, -5, 6), qindex=70),
    ):
        _rt(img, **{"qindex": 20, **kw})


def test_odd_dimensions():
    for shape in ((1, 1), (3, 17), (15, 16), (33, 31)):
        img = _smooth(shape, seed=7)
        data, dec = _rt(img, qindex=15)
        assert dec.shape == shape + (3,)


def test_skip_macroblocks_actually_skip():
    """A flat image at high qindex must produce skipped MBs (tokens
    absent) and still roundtrip."""
    img = np.full((64, 64, 3), 130, dtype=np.uint8)
    data = vp8.encode_webp_vp8(img, qindex=120, use_skip=True)
    h, mbs, *_ = vp8._decode_frame(data[20:])
    assert any(mb.skip for mb in mbs), "flat high-q frame produced no skips"
    dec = vp8l.decode_webp(data)
    assert np.abs(dec.astype(int) - 130).max() <= 6


def test_decode_image_sniffs_lossy_webp():
    img = _smooth((32, 32), seed=8)
    data = vp8.encode_webp_vp8(img, qindex=10)
    dec, fmt = codec.decode_image(data)
    assert fmt == "webp" and dec.shape == img.shape


def test_error_paths():
    img = _smooth((16, 16), seed=9)
    data = vp8.encode_webp_vp8(img, qindex=20)
    payload = data[20:]
    with pytest.raises(ValueError, match="start code"):
        vp8.decode_vp8(payload[:3] + b"\x00\x01\x2a" + payload[6:])
    with pytest.raises(ValueError, match="key frame"):
        bad = bytes([payload[0] | 1]) + payload[1:]
        vp8.decode_vp8(bad)
    with pytest.raises(ValueError):
        vp8.decode_vp8(payload[:8])  # truncated
    with pytest.raises(ValueError, match="overruns"):
        # first-partition size larger than the payload
        tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
        tag = (tag & 0x1F) | ((1 << 18) << 5)
        vp8.decode_vp8(bytes((tag & 0xFF, (tag >> 8) & 0xFF,
                              (tag >> 16) & 0xFF)) + payload[3:])


def test_allocation_guard_header_bomb():
    """A crafted VP8 header declaring 16383x16383 must be rejected by
    the shared pixel budget before any plane allocation."""
    hdr = bytes((0x00, 0x10, 0x00)) + b"\x9d\x01\x2a"
    hdr += struct.pack("<HH", 16383, 16383)
    with pytest.raises(ValueError, match="decode budget"):
        vp8.decode_vp8(hdr + b"\x00" * 64)


def test_partitions_validated():
    img = _smooth((16, 16), seed=10)
    with pytest.raises(ValueError, match="partitions"):
        vp8.encode_vp8(img, partitions=3)


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    q=st.integers(0, 127),
    seed=st.integers(0, 2**31),
)
def test_property_roundtrip_any_config(h, w, q, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    kw = dict(
        qindex=q,
        mode="random",
        uv_mode="random",
        seed=seed & 0xFFFF,
        filter_level=int(rng.integers(0, 64)),
        filter_type=int(rng.integers(0, 2)),
        sharpness=int(rng.integers(0, 8)),
        partitions=int(rng.choice([1, 2, 4, 8])),
        use_skip=bool(rng.integers(0, 2)),
    )
    data = vp8.encode_webp_vp8(img, **kw)
    dec = vp8l.decode_webp(data)
    assert dec.shape == img.shape
