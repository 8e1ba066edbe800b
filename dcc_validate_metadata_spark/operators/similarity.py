"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the correctness baseline (and the DuckDB
oracle); the scale path buckets vectors with deterministic random-
hyperplane LSH so each query only scans its bucket neighborhood. No
reference analogue (the reference's search is Elasticsearch full-text —
SURVEY.md P7); this is a graft-added training-data-pipeline operator.

Scale notes: brute force is O(Q x N) dot products — fine for Q small even
at 10^9 N when the dot product stays in whole-stage codegen; the LSH
variant turns it into O(Q x N / 2^bits) with a recall/probe tradeoff.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import _dot, _norm, round4


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query id: (q_id, rank, id, cosine).
    The query side is broadcast (tiny); ranking is a per-query window.
    Ties break on neighbor id for determinism."""
    base = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("nrm")
    )
    q = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = (
        base.join(F.broadcast(q), F.col("q_id") != F.col("id"))
        .select("q_id", "id", cos.alias("_cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "id", round4(F.col("_cos")).alias("cosine"))
    )


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(<v, plane_i>). Pure Column math —
    evaluated JVM-side, no UDF."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def train_ivf_centroids(
    emb: DataFrame,
    n_lists: int = 16,
    iters: int = 8,
    sample_fraction: float | None = None,
    seed: int = 42,
    vec_col: str = "embedding",
    max_train_rows: int = 1_000_000,
) -> np.ndarray:
    """IVF coarse quantizer: k-means centroids trained driver-side on a
    (sampled) collect of the embedding column. Numpy Lloyd iterations,
    seeded, on L2-normalized vectors (so nearest centroid by dot product
    == by cosine).

    Sampling is automatic by default (``sample_fraction=None``): the
    global ``max_train_rows`` smallest rows by ``xxhash64(vector)`` —
    a deterministic pseudo-random sample that is a pure function of the
    DATA, independent of file/partition layout (a bare ``limit`` would
    prefer early partitions, making the centroids depend on how the
    table happened to be written). Spark plans the orderBy+limit as
    TakeOrderedAndProject: ONE scan, no pre-count, a per-task top-K heap
    merged at the driver — the driver-side cost is the same ≤1M-row
    collect the training already paid. At extreme scale the per-task
    heap (max_train_rows rows of vectors) is the bound to watch; pass an
    explicit ``sample_fraction`` there for Bernoulli thinning instead
    (1.0 forces a full collect)."""
    sample = emb.select(vec_col)
    if sample_fraction is None:
        sample = sample.orderBy(F.xxhash64(F.col(vec_col))).limit(max_train_rows)
    elif sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    x = np.array(sample.toPandas()[vec_col].tolist(), dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def _nearest_lists(vec: Column, cents: np.ndarray, nprobe: int) -> Column:
    """Array of the ``nprobe`` centroid ids nearest to ``vec`` (by dot
    product on the normalized vector) — pure Column math, JVM-side."""
    norm = _norm(vec)
    scores = F.array(
        *[
            F.struct(
                (_dot(vec, F.array(*[F.lit(float(v)) for v in c])) / norm).alias("s"),
                F.lit(i).alias("list_id"),
            )
            for i, c in enumerate(cents)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scores)), 1, nprobe)
    return F.transform(top, lambda t: t["list_id"])


def ann_ivf(
    emb: DataFrame,
    query_ids: list[int],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: every vector is assigned to its nearest centroid's
    inverted list (1 id each); each query probes its ``nprobe`` nearest
    lists and ranks exact cosine within them — O(Q x N x nprobe/n_lists)
    instead of O(Q x N). Same output schema as cosine_topk; recall rises
    with ``nprobe`` (== n_lists gives exact brute force)."""
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
        _nearest_lists(F.col(vec_col), centroids, 1)[0].alias("list_id"),
    )
    q = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("qv"),
            _norm(F.col(vec_col)).alias("qn"),
            F.explode(
                _nearest_lists(F.col(vec_col), centroids, nprobe)
            ).alias("list_id"),
        )
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = base.join(
        F.broadcast(q),
        (base["list_id"] == q["list_id"]) & (F.col("q_id") != F.col("id")),
    ).select("q_id", "id", cos.alias("_cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "id", round4(F.col("_cos")).alias("cosine"))
    )


def ann_lsh_bucketed(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k restricted to each query's LSH bucket (single-probe).
    Same output schema as cosine_topk; recall < 1 by design — the bucket
    join replaces the full scan, which is the point at 10^9+ vectors.
    Multi-probe = union over neighboring buckets (not needed here)."""
    planes = hyperplanes(dim, n_bits, seed)
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = (
        base.join(F.broadcast(q), (F.col("q_bucket") == F.col("bucket")) & (F.col("q_id") != F.col("id")))
        .select("q_id", "id", cos.alias("_cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "id", round4(F.col("_cos")).alias("cosine"))
    )


def ann_lsh_multiprobe(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 8,
    n_probes: int | None = None,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe sign-LSH ANN: each query probes its own bucket PLUS
    the buckets at Hamming distance 1 in plane-sign space (one flipped
    bit each) — the standard recall lever that avoids building more
    tables. ``n_probes`` caps the probe list (default: all n_bits+1).

    Scale shape is unchanged from the single-probe path: the query side
    is tiny and broadcast; fanning it out n_bits+1-fold multiplies only
    the BROADCAST side, the data table is still joined once on its
    single bucket id. Recall rises toward brute force as probes grow
    (the perfect-recall check lives in the IVF full-probe oracle;
    this op stays rows-only)."""
    n_probes = n_bits + 1 if n_probes is None else min(n_probes, n_bits + 1)
    planes = hyperplanes(dim, n_bits, seed)
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    probes = F.slice(
        F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b).cast("long"))
                for b in range(n_bits)
            ],
        ),
        1,
        n_probes,
    )
    q = (
        base.filter(F.col("id").isin(query_ids))
        .select(
            F.col("id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.explode(probes).alias("q_bucket"),
        )
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    # no dedup needed: the probe buckets per query are pairwise distinct
    # and each data row has exactly ONE bucket, so a (q, id) pair matches
    # through at most one probe
    scored = base.join(
        F.broadcast(q),
        (F.col("q_bucket") == F.col("bucket")) & (F.col("q_id") != F.col("id")),
    ).select("q_id", "id", cos.alias("_cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "id", round4(F.col("_cos")).alias("cosine"))
    )
