"""Connected components over an edge list — the step that turns
near-duplicate PAIRS into duplicate CLUSTERS (one canonical keep-id per
group), completing the dedup story: shingle → candidate pair → verify →
cluster → keep one.

Algorithm: iterative min-label propagation to a fixpoint. Each round
every node adopts the minimum label among itself and its neighbours;
convergence takes O(component diameter) rounds. Near-dup graphs have
tiny diameters (dup clusters are cliques or near-cliques), so this
terminates in 2-4 rounds in practice. Each round is ONE shuffle join on
the edge key plus a groupBy min — no driver-side graph materialization,
so it scales to edge lists that don't fit on any single node. For
adversarially long path graphs at planetary scale, the same loop slots
in the large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond") — the fixpoint check is identical.

The loop persists each round's labels and unpersists the previous
round (lineage would otherwise grow linearly and re-run every prior
round per action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, cluster_id) for every node in ``edges``, where
    cluster_id is the minimum node id in the node's connected
    component. Nodes with no edges are absent (callers union
    singletons back if they want total coverage)."""
    # Cache the directed edge list FIRST: the symmetric union below reads
    # it twice, and without the cache each read re-runs the (possibly
    # expensive) upstream pair-generation lineage — e.g. a shingle
    # self-join — from scratch.
    directed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    directed.persist()
    raw_sym = directed.union(
        directed.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    raw_sym.persist()
    n_sym = raw_sym.count()
    directed.unpersist()
    # Right-size the loop's shuffle width to the edge count: the label
    # rounds run over the (usually tiny, always <= input) edge list, and
    # default shuffle partitions would pay scheduling overhead per round
    # out of all proportion to the data.
    n_part = max(1, min(raw_sym.sparkSession.sparkContext.defaultParallelism,
                        n_sym // 100_000 + 1))
    sym = raw_sym.repartition(n_part, "b")
    sym.persist()
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).repartition(n_part, "node")
    labels.persist()
    labels.count()
    raw_sym.unpersist()
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))
                ).alias("label"),
            )
        )
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    # The final labels stay persisted (one narrow row per clustered node,
    # already materialized by the convergence count) so consuming the
    # result doesn't re-run the whole fixpoint lineage.
    sym.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
