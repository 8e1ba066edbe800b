"""IVF ANN: centroid training is deterministic, search recall rises with
nprobe, and full-probe IVF equals exact brute force."""

from __future__ import annotations

import numpy as np
import pytest

from dcc_validate_metadata_spark.operators.similarity import (
    ann_ivf,
    cosine_topk,
    train_ivf_centroids,
)

SF = "/root/testdata/sf0.001"
N_LISTS = 8
QUERIES = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def cents(emb):
    return train_ivf_centroids(emb, n_lists=N_LISTS, iters=5)


def test_centroids_deterministic_and_normalized(emb, cents):
    again = train_ivf_centroids(emb, n_lists=N_LISTS, iters=5)
    assert np.allclose(cents, again)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)


def test_training_runs_single_job(spark, emb):
    """The auto-sampling path must not pre-count the embedding table: one
    Spark job total (the bounded toPandas collect), not scan + collect."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    sc.setJobGroup("ivf-train-probe", "count jobs during training")
    try:
        train_ivf_centroids(emb, n_lists=N_LISTS, iters=2)
        jobs = tracker.getJobIdsForGroup("ivf-train-probe")
    finally:
        sc.setJobGroup(None, None)
    assert len(jobs) == 1, f"training ran {len(jobs)} jobs, expected 1: {jobs}"


def test_default_sampling_independent_of_partition_layout(spark, emb):
    """The capped default sample is keyed on xxhash64(vector) — a pure
    function of the data — so rewriting the same table with any
    partitioning/ordering must train identical centroids (the old bare
    limit() preferred early partitions)."""
    cap = 40  # < row count, so the cap path actually selects
    a = train_ivf_centroids(
        emb.repartition(1), n_lists=4, iters=3, max_train_rows=cap
    )
    b = train_ivf_centroids(
        emb.orderBy("vec_id", ascending=False).repartition(13),
        n_lists=4,
        iters=3,
        max_train_rows=cap,
    )
    assert np.allclose(a, b)


def test_full_probe_equals_brute_force(emb, cents):
    exact = {
        (r["q_id"], r["rank"]): r["id"]
        for r in cosine_topk(emb, QUERIES, k=5).collect()
    }
    ivf_all = {
        (r["q_id"], r["rank"]): r["id"]
        for r in ann_ivf(emb, QUERIES, cents, k=5, nprobe=N_LISTS).collect()
    }
    assert ivf_all == exact


def test_recall_rises_with_nprobe(emb, cents):
    exact = {
        r["q_id"]: set()
        for r in cosine_topk(emb, QUERIES, k=10).collect()
    }
    for r in cosine_topk(emb, QUERIES, k=10).collect():
        exact[r["q_id"]].add(r["id"])

    def recall(nprobe: int) -> float:
        got: dict = {q: set() for q in exact}
        for r in ann_ivf(emb, QUERIES, cents, k=10, nprobe=nprobe).collect():
            got[r["q_id"]].add(r["id"])
        return sum(
            len(got[q] & exact[q]) / len(exact[q]) for q in exact
        ) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    assert r4 > 0.5  # multi-probe finds most true neighbors


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe LSH recall (vs brute force) must be >= single-probe
    recall on the same planes, and full-probe coverage approaches 1."""
    from dcc_validate_metadata_spark.operators.similarity import (
        ann_lsh_bucketed,
        ann_lsh_multiprobe,
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]  # pinned like the sibling tests (no limit() order)

    def hits(df):
        return {(r["q_id"], r["id"]) for r in df.collect()}

    truth = hits(cosine_topk(emb, qids, k=10))
    # n_bits=4: 16 buckets over the fixture corpus — seeded, deterministic
    single = hits(ann_lsh_bucketed(emb, qids, k=10, n_bits=4))
    multi = hits(ann_lsh_multiprobe(emb, qids, k=10, n_bits=4))
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    # multi-probe strictly dominates on these planes (measured: 0.36 vs
    # 0.14 — absolute recall is low because the synthetic embeddings are
    # near-uniform, the worst case for sign-LSH)
    assert r_multi > r_single
    assert r_multi >= 2 * r_single
    # probe cap of 1 == single-probe behavior, bit for bit
    one = hits(ann_lsh_multiprobe(emb, qids, k=10, n_bits=4, n_probes=1))
    assert one == single
