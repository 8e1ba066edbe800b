"""Interop: decode REAL third-party-encoded images found on this system.

Every fixture byte in this repo is produced by this repo's own encoders,
so a mirrored encode/decode misunderstanding would be invisible to
roundtrip tests. These files were written by libjpeg (via system
packages), which makes them the only true conformance probes available
in the sandbox:

* ``thin/full-white-stripe.jpg`` (nodejs docs) — PROGRESSIVE (SOF2)
  4:4:4, 7/9 scans with successive approximation.
* ``flower-of-life.jpg`` (requests vendored docs) — baseline 4:4:4
  WITH restart markers (DRI), the only real DRI stream available.
* ``pyparsingClassDiagram_1.5.2.jpg`` — baseline 4:2:0 at 1.9 MP
  (subsampled MCU geometry at real scale).
* ``pyparsingClassDiagram_3.0.9.jpg`` — PROGRESSIVE 4:2:0 with
  per-component DC scans (spectral selection only). Decoding all 7
  scans of 4.5 MP costs ~30 s of pure-Python AC decode, so the test
  truncates after the three DC scans — a legal progressive stream —
  which still exercises the non-interleaved subsampled-component scan
  geometry.

Assertions are structural (dims from SOF, near-white statistics of
documented white images, gray-axis consistency of achromatic regions)
because no reference decoder exists in the sandbox. Tests skip cleanly
when a file is absent (different base image).

The system python.webp is lossy VP8 inside VP8X — decoded for real by
images/vp8.py (bit-exact vs libwebp in test_vp8_conformance).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from dcc_validate_metadata_spark.images import jpeg, vp8l

_NODEJS = "/usr/share/doc/nodejs"
_GSUTIL = "/usr/lib/google-cloud-sdk/platform/gsutil/third_party"
_THIN = f"{_NODEJS}/thin-white-stripe.jpg"
_FULL = f"{_NODEJS}/full-white-stripe.jpg"
_FLOWER = f"{_GSUTIL}/requests/ext/flower-of-life.jpg"
_DIAGRAM_BASE = f"{_GSUTIL}/pyparsing/docs/_static/pyparsingClassDiagram_1.5.2.jpg"
_DIAGRAM_PROG = f"{_GSUTIL}/pyparsing/docs/_static/pyparsingClassDiagram_3.0.9.jpg"
_PY_WEBP = None
for _cand in (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.webp",
    "/root/.pyenv/versions/3.11.7/lib/python3.11/test/test_email/data/python.webp",
):
    if os.path.exists(_cand):
        _PY_WEBP = _cand
        break


def _need(path: str) -> bytes:
    if not os.path.exists(path):
        pytest.skip(f"system file absent: {path}")
    with open(path, "rb") as f:
        return f.read()


def test_real_progressive_444_libjpeg():
    img = jpeg.decode_jpeg(_need(_THIN))
    assert img.shape == (58, 493, 3)
    # documented white-stripe test image: strongly white-dominated rows
    assert float(img.mean()) > 200
    assert float(img.mean(axis=(1, 2)).max()) >= 254
    # achromatic content: near-zero channel spread in white areas
    white = img[img.mean(axis=2) > 250]
    assert len(white) > 1000
    assert float(np.abs(white[:, 0].astype(int) - white[:, 2].astype(int)).mean()) < 1.0

    img2 = jpeg.decode_jpeg(_need(_FULL))
    assert img2.shape == (312, 493, 3)
    assert float(img2.mean()) > 245
    assert float((img2 >= 250).mean()) > 0.9


def test_real_baseline_with_restart_markers():
    data = _need(_FLOWER)
    assert b"\xff\xdd" in data  # DRI present
    img = jpeg.decode_jpeg(data)
    assert img.shape == (161, 161, 3)
    # line-art geometry on white: bright overall, with real dark strokes
    assert 180 < float(img.mean()) < 250
    assert float((img < 100).mean()) > 0.005


def test_real_baseline_420_megapixel():
    img = jpeg.decode_jpeg(_need(_DIAGRAM_BASE))
    assert img.shape == (1659, 1155, 3)
    # class diagram: white page, dark text/boxes
    assert float(img.mean()) > 220
    assert float((img < 100).mean()) > 0.002


def test_real_progressive_420_dc_scans():
    data = _need(_DIAGRAM_PROG)
    # truncate after the three per-component DC scans (legal stream)
    offs = []
    i = 0
    while len(offs) < 4:
        j = data.find(b"\xff\xda", i)
        if j < 0:
            break
        offs.append(j)
        i = j + 2
    assert len(offs) == 4
    img = jpeg.decode_jpeg(data[: offs[3]] + b"\xff\xd9")
    assert img.shape == (2241, 2013, 3)
    assert float(img.mean()) > 230  # white-page diagram at DC resolution


def test_real_lossy_webp_decodes():
    """The system python.webp is third-party lossy VP8 (inside a VP8X
    extended container with an ALPH chunk): the from-scratch RFC 6386
    decoder must produce the real 16x16 logo. Structural asserts here;
    bit-exactness against libwebp is pinned in test_vp8_conformance."""
    if _PY_WEBP is None:
        pytest.skip("no system python.webp")
    data = _need(_PY_WEBP)
    img = vp8l.decode_webp(data)
    assert img.shape == (16, 16, 3)
    # the logo has real structure: dark glyph on varied background
    assert img.std() > 20
    assert 40 < float(img.mean()) < 220
