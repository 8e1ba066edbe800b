"""Distributed t-digest quantile sketches (Dunning & Ertl) for the
north-star drift mandate ("KS … on t-digest histograms").

No reference analogue — graft-added, like operators/drift.py. The design
is the one that survives 10^12 rows:

* **Stage 1 (mapInPandas, no shuffle):** every physical partition folds
  its rows into one small digest per group — O(δ) centroids each,
  independent of row count.
* **Stage 2 (groupBy on the GROUP KEYS only):** the partial digests —
  a few hundred (mean, weight) pairs per partition — shuffle and merge
  per group via applyInPandas. The shuffle moves sketches, never rows.
* **Driver:** statistical tests (KS between groups) run on the merged
  per-group digests in numpy — ~δ floats per group.

The merge is the standard weighted re-clustering with the scale-function
size bound k1(q) = δ/(2π)·asin(2q−1): sorted centroids accumulate while
the potential-function span stays under 1. Deterministic given input
order (centroids are sorted before every compression), and accuracy is
highest in the tails — exactly where drift tests look.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _k1(q: float, delta: float) -> float:
    return delta / (2 * math.pi) * math.asin(max(-1.0, min(1.0, 2 * q - 1)))


def compress(means: np.ndarray, weights: np.ndarray, delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted centroids until each cluster's k1-span <= 1."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    k0 = _k1(q0, delta)
    acc_m, acc_w = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q_new = q0 + (acc_w + w) / total
        if _k1(q_new, delta) - k0 <= 1.0:
            acc_m = (acc_m * acc_w + float(m) * float(w)) / (acc_w + float(w))
            acc_w += float(w)
        else:
            out_m.append(acc_m)
            out_w.append(acc_w)
            q0 += acc_w / total
            k0 = _k1(q0, delta)
            acc_m, acc_w = float(m), float(w)
    out_m.append(acc_m)
    out_w.append(acc_w)
    return np.array(out_m), np.array(out_w)


def digest_of(values: np.ndarray, delta: float = 100.0) -> tuple[np.ndarray, np.ndarray]:
    values = np.asarray(values, dtype=np.float64)
    values = values[~np.isnan(values)]
    if len(values) == 0:
        return np.array([]), np.array([])
    return compress(values, np.ones(len(values)), delta)


def merge_digests(
    parts: list[tuple[np.ndarray, np.ndarray]], delta: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    ms = np.concatenate([p[0] for p in parts if len(p[0])] or [np.array([])])
    ws = np.concatenate([p[1] for p in parts if len(p[1])] or [np.array([])])
    if len(ms) == 0:
        return ms, ws
    return compress(ms, ws, delta)


def digest_cdf(means: np.ndarray, weights: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Piecewise-linear CDF through the centroid midpoints."""
    total = weights.sum()
    # cumulative weight at each centroid's CENTER
    cum = np.cumsum(weights) - weights / 2.0
    return np.interp(xs, means, cum / total, left=0.0, right=1.0)


def tdigest_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    delta: float = 100.0,
) -> DataFrame:
    """(group…, means, weights, n_rows) — one merged t-digest per group,
    built with the two-stage partial-sketch plan described in the module
    docstring. Output size is O(groups × δ), independent of row count."""
    src = df.select(*group_cols, F.col(value_col).cast("double").alias("_v"))
    group_fields = [src.schema[c] for c in group_cols]
    partial_schema = T.StructType(
        group_fields
        + [
            T.StructField("means", T.ArrayType(T.DoubleType())),
            T.StructField("weights", T.ArrayType(T.DoubleType())),
            T.StructField("n_rows", T.LongType()),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fold each Arrow batch into the running per-group digest —
        # memory stays O(groups × δ) however large the partition is
        # (buffering raw values per partition would break the sketch's
        # row-count-independence claim on big partitions)
        acc: dict[tuple, tuple[np.ndarray, np.ndarray, int]] = {}
        for b in batches:
            for key, sub in b.groupby(group_cols, dropna=False, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                vals = sub["_v"].to_numpy(dtype=np.float64)
                n = int(np.count_nonzero(~np.isnan(vals)))
                m, w = digest_of(vals, delta)
                if key in acc:
                    pm, pw, pn = acc[key]
                    m, w = merge_digests([(pm, pw), (m, w)], delta)
                    n += pn
                acc[key] = (m, w, n)
        rows = [
            (*key, m.tolist(), w.tolist(), n) for key, (m, w, n) in acc.items()
        ]
        yield pd.DataFrame(rows, columns=[*group_cols, "means", "weights", "n_rows"])

    partial = src.mapInPandas(partials, schema=partial_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [
            (np.array(m, dtype=np.float64), np.array(w, dtype=np.float64))
            for m, w in zip(pdf["means"], pdf["weights"])
        ]
        m, w = merge_digests(parts, delta)
        head = pdf.iloc[[0]][group_cols].reset_index(drop=True)
        head["means"] = [m.tolist()]
        head["weights"] = [w.tolist()]
        head["n_rows"] = [int(pdf["n_rows"].sum())]
        return head

    return partial.groupBy(*group_cols).applyInPandas(merge, schema=partial_schema)


def ks_drift_from_tdigest(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    reference: dict,
    delta: float = 100.0,
    n_grid: int = 256,
    threshold: float = 0.1,
) -> list[dict]:
    """Per-group KS statistic vs the reference group's digest, evaluated
    on a shared value grid spanning both digests. Same report contract
    as :func:`~..operators.drift.ks_drift_from_quantiles` — one
    ``{partition, ks, drifted, n_rows}`` entry per NON-reference group —
    so drift.json consumers iterate every ``ks*`` section uniformly."""
    sk = tdigest_sketch(df, value_col, group_cols, delta).collect()
    digests = {
        tuple(r[c] for c in group_cols): (
            np.array(r["means"]),
            np.array(r["weights"]),
            r["n_rows"],
        )
        for r in sk
    }
    ref_key = tuple(reference[c] for c in group_cols)
    if ref_key not in digests:
        raise ValueError(f"reference partition not found: {reference}")
    rm, rw, _ = digests[ref_key]
    out = []
    for key, (m, w, n) in digests.items():
        if key == ref_key:
            continue
        if len(m) == 0 or len(rm) == 0:
            ks = float("nan")
        else:
            lo = min(m.min(), rm.min())
            hi = max(m.max(), rm.max())
            xs = np.linspace(lo, hi, n_grid)
            ks = float(
                np.max(np.abs(digest_cdf(m, w, xs) - digest_cdf(rm, rw, xs)))
            )
        out.append(
            {
                "partition": dict(zip(group_cols, key)),
                "ks": round(ks, 6),
                "drifted": bool(ks > threshold),
                "n_rows": int(n),
            }
        )
    return out
