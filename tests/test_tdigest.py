"""Distributed t-digest: sketch accuracy, mergeability (partial ∪ merge
== whole within tolerance), scale-shape of the plan, and KS drift
verdicts on known distributions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dcc_validate_metadata_spark.operators.tdigest import (
    digest_cdf,
    digest_of,
    ks_drift_from_tdigest,
    merge_digests,
    tdigest_sketch,
)


def test_digest_quantile_accuracy_local():
    rng = np.random.default_rng(7)
    x = rng.normal(0.0, 1.0, 50_000)
    m, w = digest_of(x, delta=100.0)
    assert len(m) <= 120  # O(delta) centroids for 50k points
    xs = np.sort(x)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        emp = xs[int(q * len(xs))]
        est_cdf = digest_cdf(m, w, np.array([emp]))[0]
        assert abs(est_cdf - q) < 0.01  # tight tails are the point


def test_merge_equals_whole():
    rng = np.random.default_rng(11)
    x = rng.exponential(2.0, 40_000)
    whole_m, whole_w = digest_of(x, delta=100.0)
    parts = [digest_of(c, delta=100.0) for c in np.array_split(x, 8)]
    merged_m, merged_w = merge_digests(parts, delta=100.0)
    xs = np.linspace(0, np.quantile(x, 0.999), 200)
    gap = np.max(
        np.abs(digest_cdf(whole_m, whole_w, xs) - digest_cdf(merged_m, merged_w, xs))
    )
    assert gap < 0.02
    assert abs(merged_w.sum() - len(x)) < 1e-6  # no mass lost in the merge


def test_sketch_spark_groups(spark):
    rng = np.random.default_rng(3)
    rows = [("a", float(v)) for v in rng.normal(0, 1, 6000)] + [
        ("b", float(v)) for v in rng.normal(1.5, 1, 6000)
    ]
    df = spark.createDataFrame(rows, "grp string, v double").repartition(8)
    sk = {r["grp"]: r for r in tdigest_sketch(df, "v", ["grp"]).collect()}
    assert sk["a"]["n_rows"] == 6000 and sk["b"]["n_rows"] == 6000
    for g in ("a", "b"):
        assert len(sk[g]["means"]) <= 120  # sketch-sized, row-count-free
    # medians land where the distributions say
    m, w = np.array(sk["a"]["means"]), np.array(sk["a"]["weights"])
    assert abs(digest_cdf(m, w, np.array([0.0]))[0] - 0.5) < 0.03
    m, w = np.array(sk["b"]["means"]), np.array(sk["b"]["weights"])
    assert abs(digest_cdf(m, w, np.array([1.5]))[0] - 0.5) < 0.03


def test_ks_drift_verdicts(spark):
    rng = np.random.default_rng(5)
    rows = (
        [("ref", float(v)) for v in rng.normal(0, 1, 8000)]
        + [("same", float(v)) for v in rng.normal(0, 1, 8000)]
        + [("shifted", float(v)) for v in rng.normal(0.8, 1, 8000)]
    )
    df = spark.createDataFrame(rows, "grp string, v double").repartition(8)
    report = ks_drift_from_tdigest(df, "v", ["grp"], {"grp": "ref"})
    # same contract as drift.ks_drift_from_quantiles: one entry per
    # NON-reference group, each carrying its partition dict
    by_grp = {e["partition"]["grp"]: e for e in report}
    assert set(by_grp) == {"same", "shifted"}
    assert not by_grp["same"]["drifted"]
    assert by_grp["shifted"]["drifted"]
    # KS of N(0,1) vs N(0.8,1) is ~0.31 analytically
    assert abs(by_grp["shifted"]["ks"] - 0.31) < 0.06
    assert all(e["n_rows"] == 8000 for e in report)
    with pytest.raises(ValueError, match="reference partition not found"):
        ks_drift_from_tdigest(df, "v", ["grp"], {"grp": "nope"})


def test_sketch_shuffle_moves_sketches_not_rows(spark):
    """Plan shape: the exchange between the two stages carries the
    partial-digest columns (arrays), not the raw value column."""
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1000)], "grp string, v double"
    ).repartition(4)
    sk = tdigest_sketch(df, "v", ["grp"])
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    # the exchange hashes on the group key over the PARTIAL output
    assert plan.index("Exchange") < plan.index("Scan") or "means" in plan
