"""Tests for the real WebP-lossless codec (images/vp8l.py).

The codec is lossless, so every roundtrip assertion is EXACT equality —
any divergence isolates a bitstream/transform bug, never quantization.
Feature toggles in the encoder drive the decoder through paths a fixed
configuration would never reach (all 14 predictor modes, palette
bundling widths, meta prefix groups, code-length repeats, EOB-less
prefix transmission, the 2-D distance map)."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from dcc_validate_metadata_spark.images import codec, vp8l


def _roundtrip(img: np.ndarray, **kw) -> None:
    data = vp8l.encode_webp_lossless(img, **kw)
    dec = vp8l.decode_webp(data)
    assert np.array_equal(dec, img), (
        f"kw={kw} maxd={np.abs(dec.astype(int) - img.astype(int)).max()}"
    )


def test_canonical_codes_rfc1951_example():
    """RFC 1951 §3.2.2 worked example pins the canonical-code and
    bit-order conventions the whole format rests on."""
    codes = vp8l._canonical_codes([2, 1, 3, 3])
    assert codes == {0: (0b10, 2), 1: (0b0, 1), 2: (0b110, 3), 3: (0b111, 3)}


def test_lz77_value_coding_roundtrip():
    for v in list(range(1, 300)) + [1000, 4096, 100000]:
        code, nbits, extra = vp8l._lz77_code(v)
        assert vp8l._lz77_value(code, lambda n, e=extra: e) == v


def test_prefix_code_transmission_roundtrip():
    """Random complete codes over random alphabets survive the wire
    (simple + normal forms, 16/17/18 repeats), with trailing noise to
    prove the reader stops at the right bit."""
    rng = random.Random(0)
    for trial in range(150):
        n = rng.choice([5, 40, 256, 280, 300])
        k = rng.randint(1, min(n, 40))
        syms = rng.sample(range(n), k)
        lengths = vp8l._balanced_lengths(
            {s: rng.randint(1, 100) for s in syms}, n
        )
        w = vp8l._LsbWriter()
        vp8l._write_prefix_code(w, lengths)
        w.put(rng.getrandbits(13), 13)
        dec = vp8l._read_prefix_code(vp8l._LsbReader(w.flush()), n)
        if dec.single >= 0:
            assert k == 1 and dec.single == syms[0]
        else:
            for s, (code, ln) in vp8l._canonical_codes(lengths).items():
                w2 = vp8l._LsbWriter()
                w2.put_code(code, ln)
                r2 = vp8l._LsbReader(w2.flush() + b"\x00" * 4)
                assert dec.read(r2) == s, (trial, s)


def test_roundtrip_feature_matrix():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    _roundtrip(img, subtract_green=False, cache_bits=0, use_lz77=False)
    _roundtrip(img, subtract_green=True, cache_bits=0, use_lz77=False)
    _roundtrip(img, subtract_green=False, cache_bits=4, use_lz77=False)
    _roundtrip(np.repeat(img, 3, axis=1), use_lz77=True, cache_bits=0)
    _roundtrip(np.repeat(img, 2, axis=0), cache_bits=8, use_lz77=True)
    _roundtrip(img, predictor_bits=2, predictor_mode="random", seed=5)
    _roundtrip(img, predictor_bits=4, predictor_mode="best")
    _roundtrip(img, subtract_green=False, color_bits=3, seed=3)
    _roundtrip(
        img,
        subtract_green=True,
        predictor_bits=2,
        predictor_mode="random",
        color_bits=2,
        cache_bits=5,
        use_lz77=True,
        seed=9,
    )
    _roundtrip(img, split_groups=True)
    _roundtrip(np.full((9, 9, 3), 77, np.uint8))
    for h, w in ((1, 1), (1, 7), (5, 1), (2, 2)):
        _roundtrip(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


def test_all_predictor_modes():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
    for mode in range(14):
        _roundtrip(
            img,
            subtract_green=False,
            predictor_bits=3,
            predictor_mode=mode,
            cache_bits=0,
            use_lz77=False,
        )


def test_palette_bundling_widths():
    """Palette sizes crossing every bundling width: 8, 4, 2, and 1
    pixels per packed byte."""
    rng = np.random.default_rng(2)
    for ncolors in (2, 3, 4, 9, 16, 40, 200):
        pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncolors, size=(13, 29))]
        _roundtrip(img, palette=True, cache_bits=0, use_lz77=False)
        _roundtrip(img, palette=True, cache_bits=3, use_lz77=True)


def test_distance_map_codes():
    """Short 2-D distance codes (map entries (0,1) and (1,0)) decode to
    ``width`` and 1 — the branch plain-coded streams never touch."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 2, axis=0), 3, axis=1)
    for udm in (False, True):
        _roundtrip(img, use_dist_map=udm, cache_bits=0)


def test_container_and_error_paths():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = vp8l.encode_webp_lossless(img)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert riff_size + 8 == len(data)
    # a VP8 chunk routes to the lossy decoder; VP8L bytes are not a
    # valid key frame, so it fails with the VP8 error path
    lossy = data[:12] + b"VP8 " + data[16:]
    with pytest.raises(ValueError, match="VP8"):
        vp8l.decode_webp(lossy)
    with pytest.raises(ValueError):
        vp8l.decode_webp(data[: len(data) // 2])  # truncation
    with pytest.raises(ValueError):
        vp8l.decode_webp(b"RIFF\x00\x00\x00\x00WEBX" + data[12:])
    bad_sig = bytearray(data)
    bad_sig[20] ^= 0xFF  # VP8L signature byte
    with pytest.raises(ValueError):
        vp8l.decode_webp(bytes(bad_sig))


def test_decode_image_sniffs_webp():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    data = vp8l.encode_webp_lossless(img)
    dec, fmt = codec.decode_image(data)
    assert fmt == "webp" and np.array_equal(dec, img)


def test_max_symbol_capped_transmission():
    """Hand-built normal-form code using the max-symbol cap (and a
    single-symbol code-length code, which decodes with zero-bit reads) —
    paths this repo's writer never emits but other encoders do."""
    w = vp8l._LsbWriter()
    w.put(0, 1)  # normal form
    # clc: single symbol '8' with length 1; ORDER index of 8 is 13
    order_idx = vp8l._CODE_LENGTH_ORDER.index(8)
    num_clc = order_idx + 1
    w.put(num_clc - 4, 4)
    for i in range(num_clc):
        w.put(1 if vp8l._CODE_LENGTH_ORDER[i] == 8 else 0, 3)
    # cap: 2 + get(2 + 2*3 = 8 bits) = 256 transmitted symbols
    w.put(1, 1)
    w.put(3, 3)
    w.put(254, 8)
    # the 256 'length 8' symbols cost zero bits (single-symbol clc)
    dec = vp8l._read_prefix_code(vp8l._LsbReader(w.flush() + b"\x00" * 4), 300)
    # result: a complete 8-bit code over symbols 0..255 (44 zeros capped off)
    for sym in (0, 37, 255):
        w2 = vp8l._LsbWriter()
        w2.put_code(sym, 8)  # canonical code for symbol s is s itself here
        assert dec.read(vp8l._LsbReader(w2.flush() + b"\x00" * 4)) == sym


def test_extended_container_chunk_walk():
    """A VP8X-style header chunk before VP8L must be skipped, including
    the odd-size padding rule."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    data = vp8l.encode_webp_lossless(img)
    vp8l_chunk = data[12:]
    # odd payload size: the walk must add the 1-byte alignment pad
    extra = b"VP8X" + struct.pack("<I", 9) + b"\x00" * 9 + b"\x00"
    body = b"WEBP" + extra + vp8l_chunk
    full = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(vp8l.decode_webp(full), img)


# ---------------------------------------------------------------------------
# Property tests
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31),
    sg=st.booleans(),
    pred=st.sampled_from([None, 2, 3]),
    cache=st.sampled_from([0, 3, 7]),
    lz=st.booleans(),
)
def test_property_roundtrip_any_config(h, w, seed, sg, pred, cache, lz):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    _roundtrip(
        img,
        subtract_green=sg,
        predictor_bits=pred,
        predictor_mode="random",
        cache_bits=cache,
        use_lz77=lz,
        seed=seed & 0xFFFF,
    )


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31), ncolors=st.integers(2, 30))
def test_property_palette_roundtrip(seed, ncolors):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncolors, size=(11, 13))]
    _roundtrip(img, palette=True)


def test_predictor13_truncates_toward_zero():
    """RFC 9649 ClampAddSubtractHalf uses C division (truncate toward
    zero) for (a - tl) / 2; a floor shift is off by one for negative odd
    deltas. Fixed vectors computed by hand from the spec: a=avg2(left,
    top)=100, tl=105 -> d=-5 -> trunc -2 -> 98 (floor would give 97)."""
    ch = np.zeros((2, 2, 4), dtype=np.int64)
    ch[0, 0] = 105  # top-left
    ch[0, 1] = 100  # top
    ch[1, 0] = 100  # left
    assert vp8l._predict(13, ch, 1, 1, 2) == (98, 98, 98, 98)
    ch[0, 0] = 95  # positive delta: trunc == floor -> 102 either way
    assert vp8l._predict(13, ch, 1, 1, 2) == (102, 102, 102, 102)
    # clamp still applies
    ch[0, 0] = 255
    ch[0, 1] = 0
    ch[1, 0] = 0
    assert vp8l._predict(13, ch, 1, 1, 2) == (0, 0, 0, 0)


def test_mode13_roundtrip_after_trunc_fix():
    """Encoder and decoder share _predict, so a forced-mode-13 roundtrip
    stays exact with the truncate-toward-zero semantics."""
    rng = np.random.default_rng(1337)
    img = rng.integers(0, 256, size=(17, 13, 3), dtype=np.uint8)
    _roundtrip(img, predictor_bits=2, predictor_mode=13)


def test_allocation_guard_header_bomb():
    """A 14-bit-max VP8L header (16384x16384 = 268 Mpix) in a ~30-byte
    stream must be rejected by the pixel budget BEFORE any npix-sized
    allocation — hostile rows become violation rows, not executor
    OOMs."""
    payload = b"\x2f" + struct.pack("<I", 0x0FFFFFFF)  # dims-1 all-ones
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(ValueError, match="decode budget"):
        vp8l.decode_webp(data)
