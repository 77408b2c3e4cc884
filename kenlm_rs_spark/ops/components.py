"""Connected components over a pair table — the step that turns near-dup
PAIRS (MinHash/LSH, SimHash, embedding-LSH — ops/dedup.py, ops/similarity.py)
into dedup CLUSTERS with one canonical survivor per cluster, i.e. the
standard production shape of fuzzy dedup (MinHashLSH -> components ->
keep min id per component).

Algorithm: iterative min-label propagation to a fixpoint —
``label(v) <- min(label(v), min over neighbors u of label(u))`` per round.
Rounds needed = graph diameter; near-dup graphs are unions of near-cliques
(tiny diameter), so convergence is typically 2-4 rounds. Each round is one
shuffle join (edges x labels on dst) + one groupBy(src) + one left join —
all on uniform id keys. Lineage is truncated every round with an eager
localCheckpoint, so 10^2 rounds would still not blow the plan up; the
convergence check is a count() on the changed set (one scalar per round,
nothing corpus-sized collects). For adversarial long-chain graphs the
large-star/small-star algorithm (Kiveris et al. 2014, "Connected
Components in MapReduce and Beyond") halves the round count; near-dup
workloads do not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the minimum node id of the node's connected component (deterministic
    canonical representative)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
    )
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    e = e.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"({changed} labels still changing) — the graph has a longer path "
        "than expected for a near-dup workload; raise max_iter or switch "
        "to large-star/small-star (Kiveris et al. 2014)"
    )


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(doc_id, cluster_id, is_survivor) from a near-dup pair table:
    cluster_id = min doc id of the connected component, survivor = the
    member that IS that minimum (keep-one-per-cluster dedup policy)."""
    comp = connected_components(pairs, src_col=id_a, dst_col=id_b)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )
