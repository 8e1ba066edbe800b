"""Distribution-drift checks between partitions.

No reference analogue (mandated by BASELINE.json ``north_star``): compare
each partition's distribution of a column against a reference partition
via (a) chi-square over fixed-width histogram counts and (b) a KS statistic
over approx-quantile sketches. The heavy pass is ONE ``groupBy(partition,
bucket).count()`` (map-side combinable); the statistical test runs on the
collected sketch (~n_partitions × n_bins rows) in numpy on the driver —
sketch sizes are independent of row count, so this scales to 10^12 rows.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram_by_partition(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    n_bins: int = 32,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """(partition…, bin, n) fixed-width histogram. Bounds default to the
    global min/max (one cheap agg)."""
    if lo is None or hi is None:
        row = df.agg(
            F.min(value_col).cast("double"), F.max(value_col).cast("double")
        ).first()
        lo = lo if lo is not None else float(row[0])
        hi = hi if hi is not None else float(row[1])
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / n_bins
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
        ),
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*partition_cols, bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def chi_square_drift(
    hist: DataFrame,
    partition_cols: list[str],
    reference: dict,
    n_bins: int = 32,
) -> list[dict]:
    """Chi-square of each partition's histogram vs the reference
    partition's. ``reference`` maps partition_col → value. Driver-side
    numpy over the collected sketch."""
    rows = hist.collect()
    key = lambda r: tuple(r[c] for c in partition_cols)  # noqa: E731
    ref_key = tuple(reference[c] for c in partition_cols)
    counts: dict[tuple, np.ndarray] = {}
    for r in rows:
        k = key(r)
        counts.setdefault(k, np.zeros(n_bins))
        counts[k][r["bin"]] += r["n"]
    if ref_key not in counts:
        raise ValueError(f"reference partition {ref_key} not found")
    ref = counts[ref_key]
    ref_p = ref / ref.sum()
    out = []
    for k, obs in counts.items():
        if k == ref_key:
            continue
        expected = ref_p * obs.sum()
        mask = expected > 0
        stat = float(((obs[mask] - expected[mask]) ** 2 / expected[mask]).sum())
        dof = int(mask.sum()) - 1
        out.append(
            {
                "partition": dict(zip(partition_cols, k)),
                "chi2": stat,
                "dof": max(dof, 1),
                # Wilson-Hilferty normal approximation of the chi² tail
                "drifted": stat > _chi2_critical(max(dof, 1), 0.001),
            }
        )
    return out


def _chi2_critical(dof: int, alpha: float) -> float:
    """Upper critical value via Wilson–Hilferty (no scipy in sandbox)."""
    z = _norm_ppf(1.0 - alpha)
    return dof * (1.0 - 2.0 / (9.0 * dof) + z * math.sqrt(2.0 / (9.0 * dof))) ** 3


def _norm_ppf(p: float) -> float:
    """Acklam's rational approximation of the normal quantile."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )


def ks_drift_from_quantiles(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    reference: dict,
    n_quantiles: int = 64,
    accuracy: int = 10_000,
) -> list[dict]:
    """KS statistic between each partition's quantile sketch and the
    reference partition's — sketches via ``percentile_approx`` (t-digest
    role), merged JVM-side; numpy comparison on the driver."""
    probs = [i / n_quantiles for i in range(1, n_quantiles)]
    q = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*partition_cols)
        .agg(F.percentile_approx(value_col, probs, accuracy).alias("q"))
    ).collect()
    key = lambda r: tuple(r[c] for c in partition_cols)  # noqa: E731
    ref_key = tuple(reference[c] for c in partition_cols)
    sketches = {key(r): np.array(r["q"], dtype=float) for r in q}
    if ref_key not in sketches:
        raise ValueError(f"reference partition {ref_key} not found")
    ref = sketches[ref_key]
    grid = np.unique(np.concatenate(list(sketches.values())))
    probs_arr = np.array(probs)

    def cdf(sketch: np.ndarray, x: np.ndarray) -> np.ndarray:
        return np.interp(x, sketch, probs_arr, left=0.0, right=1.0)

    out = []
    ref_cdf = cdf(ref, grid)
    for k, s in sketches.items():
        if k == ref_key:
            continue
        ks = float(np.max(np.abs(cdf(s, grid) - ref_cdf)))
        out.append({"partition": dict(zip(partition_cols, k)), "ks": ks, "drifted": ks > 0.1})
    return out
