"""Connected components over candidate-duplicate pairs → dedup keep
lists.

Graft-added (no reference analogue): the dedup operators emit NEAR-DUP
PAIRS (MinHash/SimHash/embedding — operators/dedup.py); a training-data
pipeline then needs each transitive duplicate CLUSTER collapsed to one
kept document. That is connected components on the pair graph.

Spark-first realization: iterative minimum-label propagation —

    labels ← node id
    repeat: label(u) ← min(label(u), min over neighbors v of label(v))

Each round is one join + one groupBy (both on the node id), so the
shuffle key never changes and AQE reuses the partitioning; rounds needed
= graph diameter, and duplicate clusters are shallow (near-dup graphs
are cliques-ish through shared LSH buckets), so 3-5 rounds typically
converge. Convergence is detected with a count of changed labels
(sketch-sized: only nodes that appear in ANY pair participate — the
overwhelmingly-common singleton documents never enter the computation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; the
    component id is the minimum node id reachable through the pair graph.
    Deterministic. Raises if ``max_iter`` rounds don't converge (a
    pathological chain longer than max_iter — raise the cap)."""
    edges = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
    )
    from .uniqueness import _PERSISTED_DUPS

    edges = edges.persist()
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    prev = None
    try:
        for _ in range(max_iter):
            # min neighbor label per node, folded with the node's own label
            nbr = (
                edges.join(labels, on=edges["b"] == labels["id"])
                .groupBy(F.col("a").alias("id"))
                .agg(F.min("component").alias("_nbr_min"))
            )
            updated = (
                labels.join(nbr, on="id", how="left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce("_nbr_min", F.col("component")),
                    ).alias("component"),
                    (
                        F.coalesce("_nbr_min", F.col("component"))
                        < F.col("component")
                    ).alias("_changed"),
                )
                .persist()
            )
            n_changed = updated.filter(F.col("_changed")).count()  # materializes
            if prev is not None:
                prev.unpersist()  # previous round's labels, now consumed
            prev = updated
            labels = updated.drop("_changed")
            if n_changed == 0:
                # the converged label table stays cached for the caller;
                # register it with the shared release registry so the
                # long-lived-session release points (run_validation,
                # streaming batches, release_dup_tables callers) free it
                _PERSISTED_DUPS.append(updated)
                prev = None  # ownership transferred to the registry
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        if prev is not None:  # non-convergence path: release the last round
            prev.unpersist()
        edges.unpersist()


def dedup_keep_list(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """(doc_id, cluster_id, keep) for every document involved in at least
    one near-dup pair: one representative (the minimum id) is kept per
    transitive cluster, the rest are drops. Documents in no pair are
    implicitly all-keep and never shuffle through this computation."""
    comp = connected_components(pairs, src_col, dst_col)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("keep"),
    )
