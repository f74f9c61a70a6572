"""IVF-style approximate nearest neighbor over embedding columns.

The 100 TB shape: a k-means coarse quantizer (built once, tiny)
partitions the corpus into nlist inverted lists; a query scores
only its nprobe nearest lists — N/nlist·nprobe of the data instead
of N. All stages are DataFrame ops:

- Lloyd iterations: assign = broadcast the (nlist × dim) centroid
  table and argmin-by-distance per row (no shuffle of the corpus);
  update = posexplode to (cluster, dim) partial means (one narrow
  shuffle of nlist×dim tiny rows).
- Deterministic throughout: init centroids are the vectors with the
  nlist smallest ids (no RNG), ties in assignment break by cluster
  id — same input → same index, across runs and engines.
- The driver loop holds ONLY centroids (nlist×dim doubles); the
  corpus never leaves executors.

At deployment the assignment table is written bucketed by
cluster_id so a query's probe lists are co-located partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vectors as vec


def assign_clusters(emb: DataFrame, centroids: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """emb + cluster_id of the nearest centroid (L2). Broadcast
    join + ``min_by`` argmin; ties break toward the lower cluster_id
    (the ordering struct (_dist, cluster_id) is unique, so the pick
    is deterministic).

    groupBy+min_by, NOT a ``Window.partitionBy(vec_id)`` row_number:
    the window form shuffles AND sorts the full N×nlist broadcast
    expansion, while min_by map-side-combines each vec_id's nlist
    candidates down to one row before the exchange (all nlist copies
    of a row are produced in its own partition), so the shuffle
    carries N rows and no sort happens anywhere."""
    scored = emb.join(F.broadcast(centroids)).withColumn(
        "_dist", vec.l2_distance(vec.as_double(F.col(vec_col)), F.col("centroid"))
    )
    carry = [c for c in emb.columns if c != "vec_id"] + ["cluster_id"]
    picked = scored.groupBy("vec_id").agg(
        F.min_by(
            F.struct(*[F.col(c) for c in carry]),
            F.struct(F.col("_dist"), F.col("cluster_id")),
        ).alias("_r")
    )
    return picked.select("vec_id", *[F.col(f"_r.{c}").alias(c) for c in carry])


def kmeans_centroids(
    emb: DataFrame, nlist: int = 8, iters: int = 3, vec_col: str = "embedding"
) -> DataFrame:
    """(cluster_id, centroid: array<double>) after ``iters`` Lloyd
    steps from a deterministic seed (the nlist lowest-id vectors)."""
    centroids = (
        emb.orderBy("vec_id")
        .limit(nlist)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cluster_id"),
            vec.as_double(F.col(vec_col)).alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = assign_clusters(emb, centroids, vec_col)
        centroids = (
            assigned.select(
                "cluster_id",
                F.posexplode(vec.as_double(F.col(vec_col))).alias("i", "x"),
            )
            .groupBy("cluster_id", "i")
            # round(9): float sums are merge-order-dependent (both
            # across Spark shuffle-fetch orders and across engines),
            # so unrounded centroid components would make downstream
            # argmin near-ties nondeterministic. 9 dp is far below
            # any real centroid separation and makes the quantizer
            # bit-reproducible — which is what lets knn_ivf carry a
            # full cross-engine oracle.
            .agg(F.round(F.avg("x"), 9).alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
        )
    return centroids


def knn_ivf(
    emb: DataFrame,
    query_vec_id: int,
    top_k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors of a stored vector, searching only the
    query's ``nprobe`` nearest inverted lists."""
    centroids = kmeans_centroids(emb, nlist, iters)
    assigned = assign_clusters(emb, centroids, vec_col)
    qv = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(vec.as_double(F.col(vec_col)).alias("qv"))
    )
    probe = (
        centroids.join(F.broadcast(qv))
        .withColumn("_d", vec.l2_distance(F.col("centroid"), F.col("qv")))
        .orderBy(F.asc("_d"), F.asc("cluster_id"))
        .limit(nprobe)
        .select("cluster_id")
    )
    return (
        assigned.join(F.broadcast(probe), "cluster_id")
        .filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(vec.cosine(vec.as_double(F.col(vec_col)), F.col("qv")), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(top_k)
    )
