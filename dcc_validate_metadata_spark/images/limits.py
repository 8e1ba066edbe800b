"""Shared decode-allocation guard for the image codecs.

A hostile or corrupt header can declare enormous dimensions (JPEG SOF
allows 65535x65535 ~ 4.3 Gpix; VP8L's 14-bit fields allow 16384x16384 =
268 Mpix) in a stream only a few bytes long. Both decoders allocate
output/coefficient buffers sized from the declared dimensions BEFORE any
entropy data validates, so without a cap one crafted row OOM-kills the
executor instead of becoming a violation row — breaking the pipeline
contract that decode errors surface as data, not task deaths.

The cap is a module-level knob (not per-call) so every decode path —
validation invariants, MJPEG frames inside AVI, thumbnails — shares one
policy. 64 Mpix comfortably covers real corpora (a 9344x7000 medium-
format frame is ~65 Mpix) while bounding the worst-case allocation to
a few hundred MB per in-flight row.
"""

from __future__ import annotations

MAX_DECODE_PIXELS = 64 * 1024 * 1024


def check_pixel_budget(width: int, height: int, codec: str) -> None:
    """Raise ValueError (the violation-row path) when a header declares
    more pixels than the decode budget allows. Called before any
    dimension-sized allocation."""
    if width * height > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{codec} declares {width}x{height} = {width * height} pixels, "
            f"over the decode budget of {MAX_DECODE_PIXELS} "
            "(allocation guard; raise images.limits.MAX_DECODE_PIXELS "
            "to accept larger frames)"
        )
