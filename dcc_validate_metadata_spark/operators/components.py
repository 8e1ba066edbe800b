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


LOCAL_EDGE_THRESHOLD = 500_000


def _local_components(edge_rows) -> list[tuple]:
    """Union-find over a gate-bounded edge list; component id = minimum
    member id (same fixpoint the distributed path converges to)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for node in parent:
        r = find(node)
        m = comp_min.get(r)
        if m is None or node < m:
            comp_min[r] = node
    return [(node, comp_min[find(node)]) for node in parent]


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    probe_every: int = 2,
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; the
    component id is the minimum node id reachable through the pair graph.
    Deterministic. Raises if ``max_iter`` rounds don't converge (a
    pathological chain longer than max_iter — raise the cap).

    Size-gated two-path design (the same counted-probe pattern as
    uniqueness.gated_dup_table): after LSH banding + verification the
    pair graph is typically MINUSCULE relative to the corpus — only
    near-duplicate participants appear at all — so the common case is a
    graph that fits trivially on the driver. A counted probe (one cheap
    job over the already-persisted edge table, which the iterative path
    would have to materialize anyway) routes:

    * ``edges ≤ local_threshold`` (default 500k symmetric edges ≈
      100-200 MB of driver-side Row/dict objects — sized for a
      16 GB driver with ample headroom, same order as the uniqueness
      gate's dup-table bound): collect the edge list and run union-find
      with path compression; exact, one pass, no per-round
      join/shuffle/action overhead. The collect is GATE-BOUNDED, never
      O(corpus).
    * larger graphs: distributed iterative min-label propagation, with
      the label table ``localCheckpoint``-ed every ``probe_every`` rounds
      — materializing it AND truncating lineage so the physical plan
      stays ≤ ``probe_every`` join-rounds deep (an unbounded unrolled
      loop was the single most expensive plan in the sf0.1 bench).
      The convergence probe piggybacks on the same materialization:
      min-label propagation is monotone, so ONE all-quiet round proves
      convergence — probing every k-th round costs at most k-1 extra
      rounds and halves the action count.
    """
    edges = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
    )
    # ONE action probes the gate AND fetches the edges: collect through a
    # threshold+1 limit — if nothing was truncated the graph is local-
    # sized and already in hand (no separate count pass over the pair
    # lineage); a truncated result is discarded and the distributed path
    # recomputes (rare by construction: the default 500k symmetric-edge
    # gate ≈ 250k undirected near-dup pairs; raise local_threshold if the
    # driver has headroom for more)
    head = edges.limit(local_threshold + 1).collect()
    if len(head) <= local_threshold:
        from pyspark.sql import types as T

        id_type = edges.schema["a"].dataType
        rows = _local_components(head)
        schema = T.StructType(
            [
                T.StructField("id", id_type, False),
                T.StructField("component", id_type, False),
            ]
        )
        return pairs.sparkSession.createDataFrame(rows, schema)
    edges = edges.persist()
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    try:
        for it in range(max_iter):
            # min neighbor label per node, folded with the node's own label
            nbr = (
                edges.join(labels, on=edges["b"] == labels["id"])
                .groupBy(F.col("a").alias("id"))
                .agg(F.min("component").alias("_nbr_min"))
            )
            updated = labels.join(nbr, on="id", how="left").select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("_nbr_min", F.col("component")),
                ).alias("component"),
                (
                    F.coalesce("_nbr_min", F.col("component")) < F.col("component")
                ).alias("_changed"),
            )
            if it % probe_every == probe_every - 1 or it == max_iter - 1:
                # materialize + truncate lineage (value-stable snapshot;
                # blocks are freed by the ContextCleaner when the frame
                # goes out of scope — no registry entry needed)
                updated = updated.localCheckpoint(eager=True)
                n_changed = updated.filter(F.col("_changed")).count()
                labels = updated.drop("_changed")
                if n_changed == 0:
                    return labels
            else:
                labels = updated.drop("_changed")
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
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
