"""Connected-component duplicate clusters — the step after pair
detection in a real dedup pipeline: near-dup PAIRS form a graph;
the unit of deduplication is the connected COMPONENT (keep one
survivor per component, drop the rest).

Algorithm: iterative min-label propagation over the undirected pair
graph. Each round every vertex takes the min label among itself and
its neighbors; convergence when no label changes (checked with a
scalar aggregate per round — the only driver-side value is one
number). Rounds ≤ graph diameter; dup components are near-cliques
in practice (diameter ~2), so this converges in 2-3 rounds. For
adversarial long-chain graphs at 100 TB, swap the propagation step
for the large-star/small-star contraction (same join primitives,
O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """pairs(src, dst) → (doc_id, cluster_id = min reachable id).
    Only vertices that appear in at least one pair are returned
    (singletons are trivially their own cluster)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # materialize ONCE: the pair graph may be the output of an
        # expensive upstream pipeline (LSH / brute-force Jaccard);
        # without this every iteration's action replays that lineage.
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("doc_id")).distinct().withColumn(
        "label", F.col("doc_id")
    )
    # carry the label-mass scalar across rounds (r12 optimization):
    # round k's "old" sum IS round k-1's "new" sum — the checkpointed
    # labels cannot change between rounds, so re-aggregating them was
    # one redundant job per round across every CC consumer (clusters,
    # survivors, cost report, the three pipelines, phash clusters).
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.u, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        # truncate lineage each round (plans would otherwise nest
        # exponentially) and converge on label mass: labels only
        # ever decrease, so equal sums ⇒ fixpoint.
        new_labels = new_labels.localCheckpoint(eager=True)
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def dedup_survivors(components: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, is_survivor): survivor = the cluster's
    min id — the same keep-min rule as exact dedup."""
    return components.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
    )
