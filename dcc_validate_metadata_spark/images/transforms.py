"""Image transform operators: resize + feature extraction.

Training-data-pipeline operators over the image table (graft-added; the
reference never touches pixels — its closest analogue is the external
``hubCheck`` binary, SURVEY.md X4). Both are Arrow-batched ``mapInPandas``
stages over the pruned ``(keys, bytes)`` projection — the same plumbing
discipline as the decode checks: `bytes` enters exactly one UDF stage,
everything else stays JVM-side.

The resize kernel is REAL (area/block-mean via numpy reshape — exact for
integer downscale factors, strided nearest otherwise); features are REAL
(mean RGB + 8-bin luma histogram). No image libraries needed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .codec import decode_image, encode_png


def block_resize(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-mean downscale when factors divide evenly, else nearest via
    index striding. Deterministic, pure numpy."""
    h, w = pix.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        return (
            pix.reshape(out_h, fh, out_w, fw, 3).mean(axis=(1, 3)).astype(np.uint8)
        )
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pix[ys][:, xs]


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "image_id",
) -> DataFrame:
    """(id, bytes) → (id, bytes resized-PNG, w, h). Failed decodes are
    dropped (they are the validation pipeline's findings, not this op's)."""
    src = df.select(id_col, "bytes")
    schema = f"{id_col} string, bytes binary, w int, h int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, outs = [], []
            for i, data in enumerate(b["bytes"].tolist()):
                if data is None:
                    continue
                try:
                    pix, _ = decode_image(bytes(data))
                except Exception:  # noqa: BLE001
                    continue
                ids.append(b[id_col].iloc[i])
                outs.append(encode_png(block_resize(pix, out_w, out_h)))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "bytes": outs,
                    "w": pd.array([out_w] * len(ids), dtype="int32"),
                    "h": pd.array([out_h] * len(ids), dtype="int32"),
                }
            )

    return src.mapInPandas(run, schema=schema)


N_LUMA_BINS = 8


def extract_features(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """(id, mean_r, mean_g, mean_b, luma_hist array<double>) — the
    embedding-ish feature vector a curation pipeline would feed to
    near-dup / quality models downstream."""
    src = df.select(id_col, "bytes")
    schema = (
        f"{id_col} string, mean_r double, mean_g double, mean_b double, "
        f"luma_hist array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, mr, mg, mb, hists = [], [], [], [], []
            for i, data in enumerate(b["bytes"].tolist()):
                if data is None:
                    continue
                try:
                    pix, _ = decode_image(bytes(data))
                except Exception:  # noqa: BLE001
                    continue
                ids.append(b[id_col].iloc[i])
                means = pix.reshape(-1, 3).mean(axis=0)
                mr.append(round(float(means[0]), 4))
                mg.append(round(float(means[1]), 4))
                mb.append(round(float(means[2]), 4))
                luma = pix.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                hist, _ = np.histogram(luma, bins=N_LUMA_BINS, range=(0.0, 256.0))
                hists.append((hist / luma.size).round(6).tolist())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "mean_r": mr,
                    "mean_g": mg,
                    "mean_b": mb,
                    "luma_hist": hists,
                }
            )

    return src.mapInPandas(run, schema=schema)
