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
            # localCheckpoint per Lloyd round (the iterative-loop
            # invariant): without it each round's plan nests the
            # previous round's whole assign+update subtree, and every
            # consumer of the final centroids replays the full stack.
            # The checkpointed frame is nlist tiny rows; eager
            # execution here makes centroid-consuming builders
            # BUILD_EXECUTES (jobs run at plan time, measured ~0.5 s
            # faster end-to-end at sf0.1 and O(1) plan depth).
            .localCheckpoint(eager=True)
        )
    return centroids


def write_ivf_index(
    spark,
    emb: DataFrame,
    table_prefix: str,
    nlist: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index the module docstring promises:

    - ``{prefix}_assign``: the corpus + cluster_id, written BUCKETED
      by cluster_id (``write_bucketed``) so each inverted list is a
      co-located set of files. A probe filter
      ``cluster_id IN (<nprobe ids>)`` then bucket-prunes the scan to
      nprobe/nlist of the data — no shuffle, no join, no full scan
      (asserted on the plan in test_similarity).
    - ``{prefix}_centroids``: the nlist × dim quantizer, a plain tiny
      table the query side loads to pick its probe lists.
    """
    import shutil

    from ..operators.compaction import table_location
    from ..sources.writers import write_bucketed

    # A fresh session's in-memory catalog has no record of tables an
    # earlier session materialized, but their managed files survive
    # in the warehouse dir — saveAsTable then refuses the "dangling"
    # location (LOCATION_ALREADY_EXISTS). Drop catalog entries AND
    # clear leftover default-location directories before writing
    # (table_location handles the lowercased-identifier dance — one
    # copy of it repo-wide, r11 review).
    # _dels too (the minhash-index precedent): a fresh build must not
    # inherit a previous index generation's tombstones.
    for suffix in ("_centroids", "_assign", "_dels"):
        t = f"{table_prefix}{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(table_location(spark, t), ignore_errors=True)

    centroids = kmeans_centroids(emb, nlist, iters, vec_col)
    centroids.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_centroids"
    )
    write_bucketed(
        assign_clusters(emb, centroids, vec_col),
        f"{table_prefix}_assign",
        ["cluster_id"],
        n_buckets=nlist,
    )


def append_ivf_index(
    spark,
    emb: DataFrame,
    table_prefix: str,
    nlist: int = 8,
    vec_col: str = "embedding",
) -> None:
    """Append a delta batch to an ALREADY-WRITTEN IVF index — the
    index-maintenance half of the ANN ingestion loop (the
    ``append_minhash_index`` pattern): the delta is assigned against
    the FROZEN centroid table (read back from the index — centroids
    are NOT retrained, which is exactly what a production IVF
    deployment does between periodic rebuilds) and appended to the
    bucketed assignment table. A bucketed append writes its own
    per-bucket files next to the existing ones (never rewriting
    them), and every file of bucket N still holds only cluster_ids
    hashing to N — bucket PRUNING survives any number of appends.
    ``nlist`` must match the original build's bucket count."""
    centroids = spark.table(f"{table_prefix}_centroids")
    (
        # bucket-hash clustering before the append (see
        # write_bucketed): one file per touched inverted list per
        # batch instead of partitions×lists
        assign_clusters(emb, centroids, vec_col)
        .repartition(nlist, "cluster_id")
        .write.mode("append")
        .format("parquet")
        .bucketBy(nlist, "cluster_id")
        .saveAsTable(f"{table_prefix}_assign")
    )


def delete_from_ivf_index(spark, vec_ids, table_prefix: str) -> None:
    """DELETE vectors from a written IVF index the way every
    immutable-file index does it (the LSM/tombstone pattern,
    ``delete_from_minhash_index``'s twin): append the vec_ids to an
    append-only ``{prefix}_dels`` table and filter them out at probe
    time. Nothing in ``_assign``/``_centroids`` is read or rewritten —
    a retraction (takedown, opt-out, re-embedding recall) costs one
    tiny append no matter the index size; dead rows are reclaimed by
    ``vacuum_ivf_index`` or the next rebuild. ``write_ivf_index``
    drops the tombstone table, so a fresh build never inherits a
    previous generation's deletes."""
    vec_ids.select("vec_id").write.mode("append").format(
        "parquet"
    ).saveAsTable(f"{table_prefix}_dels")


def _catalog_bucket_count(spark, table: str) -> int:
    """The bucket count a table was WRITTEN with, from the catalog —
    maintenance ops must never trust a caller-supplied count (r12
    review: a mismatched pmod would mark the wrong buckets affected,
    leave tombstoned rows live, and still drop ``_dels`` — silent
    resurrection of deleted vectors)."""
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r.col_name.strip() == "Num Buckets":
            return int(r.data_type.strip())
    raise ValueError(f"{table} is not a bucketed table")


def vacuum_ivf_index(
    spark, table_prefix: str, n_buckets: int | None = None,
    max_parallel: int = 8,
) -> int:
    """Fold the tombstones into the index — and, unlike the MinHash
    band index (whose every doc scatters across all 16 bands' buckets,
    forcing vacuum to be a FULL rewrite), an inverted list vacuums
    INCREMENTALLY: each vector lives in exactly ONE cluster bucket,
    so only the buckets that actually hold tombstoned rows are read
    and rewritten; every other inverted list's files are untouched
    byte-for-byte (pinned in test_similarity). At 100 TB this is the
    difference between a vacuum proportional to the retraction set's
    lists and one proportional to the index.

    Mechanics: the affected bucket ids are computed with the same
    murmur3+pmod expression Spark's bucketing uses (evaluated engine-
    side on the actual column type — never a driver-side reimpl.);
    each affected bucket's files are read directly, anti-joined
    against the broadcast tombstones, rewritten as one bucket-id-
    encoded file, and swapped in via the manifest-backed
    ``publish_replacing`` protocol (crash at any point is recovered
    by ``recover_inprogress`` at the next maintenance entry).
    The ``_dels`` drop comes LAST: re-running an interrupted vacuum
    is idempotent and converges (the anti-join of already-vacuumed
    buckets is a no-op), so the recovery rule is simply "run it
    again". Returns the number of distinct vec_ids vacuumed."""
    import os
    import shutil
    import uuid
    from concurrent.futures import ThreadPoolExecutor

    from ..operators.compaction import (
        bucket_id_of,
        publish_replacing,
        recover_inprogress,
        table_location,
    )

    if not spark.catalog.tableExists(f"{table_prefix}_dels"):
        return 0
    dels = (
        spark.table(f"{table_prefix}_dels")
        .select("vec_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_dels = dels.count()
    if n_dels == 0:
        return 0
    table = f"{table_prefix}_assign"
    path = table_location(spark, table)
    recover_inprogress(path)
    # the bucket count comes from the CATALOG (what the index was
    # written with); a caller-supplied value is validated against it
    cat_n = _catalog_bucket_count(spark, table)
    if n_buckets is not None and n_buckets != cat_n:
        raise ValueError(
            f"{table} was written with {cat_n} buckets, "
            f"caller claimed {n_buckets}"
        )
    n_buckets = cat_n
    # buckets holding tombstoned rows: pmod(murmur3(cluster_id), n) is
    # exactly HashPartitioning.partitionIdExpression — computed on the
    # table's own cluster_id column so the hash sees the stored type
    affected = {
        r.b
        for r in spark.table(table)
        .select("vec_id", "cluster_id")
        .join(F.broadcast(dels), "vec_id")
        .select(
            F.pmod(F.hash("cluster_id"), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    }
    by_bucket: dict = {}
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            b = bucket_id_of(f)
            if b is not None:
                by_bucket.setdefault(b, []).append(os.path.join(path, f))
    tmp_root = path + ".vacuum.tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)

    def _rewrite(b: int) -> None:
        group = sorted(by_bucket[b])
        out_dir = os.path.join(tmp_root, f"b{b:05d}")
        (
            spark.read.parquet(*group)
            .join(F.broadcast(dels), "vec_id", "left_anti")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        outs = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
        assert len(outs) == 1, outs
        publish_replacing(
            path,
            os.path.join(out_dir, outs[0]),
            group,
            f"part-00000-{uuid.uuid4().hex}_{b:05d}.c000.snappy.parquet",
        )

    jobs = sorted(b for b in affected if b in by_bucket)
    if jobs:
        with ThreadPoolExecutor(max_workers=max_parallel) as ex:
            list(ex.map(_rewrite, jobs))
    shutil.rmtree(tmp_root, ignore_errors=True)
    spark.sql(f"REFRESH TABLE {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_dels")
    return n_dels


def knn_ivf_indexed(
    spark,
    table_prefix: str,
    query_vec_id: int,
    top_k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    tombstones: bool = False,
) -> DataFrame:
    """Query the materialized IVF index. Driver-side work is bounded
    by the index size, never the corpus: the centroid table (nlist
    rows) and the query row (1 row) are collected to compute the
    nprobe probe list as literal ints, precisely so the assignment
    scan gets a ``cluster_id IN (...)`` filter it can bucket-prune —
    a join, even broadcast, would read every bucket. The resulting
    probe plan is a pruned scan + TakeOrdered: zero exchanges.

    Same output as ``knn_ivf`` run inline (pinned by parity test)."""
    # Spark's auto-bucketed-scan heuristic disables bucketed reads
    # when no JOIN/AGG needs the hash distribution — but that also
    # silently drops bucket PRUNING, turning the probe into a full
    # scan ("Bucketed: false (disabled by query planner)"). Pruning
    # is the entire point of this index, so pin bucketed reads on
    # for THIS plan only: build_with_conf forces the physical plan
    # under the flipped conf and restores the session value, so the
    # pin no longer leaks into later queries sharing the session
    # (r8 advice item).
    from ..operators.confscope import build_with_conf

    def _probe() -> DataFrame:
        assign = spark.table(f"{table_prefix}_assign")
        if tombstones:
            # broadcast anti-join of the tiny _dels table — map-side,
            # so the pruned exchange-free probe plan survives; a
            # deleted query vector correctly raises KeyError below.
            dels = spark.table(f"{table_prefix}_dels").select("vec_id")
            assign = assign.join(F.broadcast(dels), "vec_id", "left_anti")
        qrow = (
            assign.filter(F.col("vec_id") == query_vec_id)
            .select(vec.as_double(F.col(vec_col)).alias("qv"))
            .head()
        )
        if qrow is None:
            raise KeyError(f"query_vec_id {query_vec_id} not in index")
        qv = list(qrow["qv"])
        centroids = [
            (r["cluster_id"], list(r["centroid"]))
            for r in spark.table(f"{table_prefix}_centroids").collect()
        ]
        # argmin over nlist centroids, ties to the lower cluster_id —
        # same rule as assign_clusters
        scored = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv, c)), cid)
            for cid, c in centroids
        )
        probe_ids = [cid for _, cid in scored[:nprobe]]
        qv_col = F.array(*[F.lit(float(x)) for x in qv])
        return (
            assign.filter(F.col("cluster_id").isin(probe_ids))
            .filter(F.col("vec_id") != query_vec_id)
            .select(
                "vec_id",
                F.round(
                    vec.cosine(vec.as_double(F.col(vec_col)), qv_col), 6
                ).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(top_k)
        )

    return build_with_conf(
        spark,
        "spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false",
        _probe,
    )


def knn_ivf(
    emb: DataFrame,
    query_vec_id: int,
    top_k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 3,
    vec_col: str = "embedding",
    label_filter: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbors of a stored vector, searching only the
    query's ``nprobe`` nearest inverted lists. ``label_filter``
    restricts candidates BEFORE scoring (pre-filtering — the variant
    that still returns k rows from the filtered set where
    post-filtering a plain top-k can come up short)."""
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
    cand = assigned.join(F.broadcast(probe), "cluster_id").filter(
        F.col("vec_id") != query_vec_id
    )
    if label_filter is not None:
        cand = cand.filter(F.col("label") == label_filter)
    return (
        cand
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


def kmeans_unrolled_cte(nlist: int, iters: int, dim: int = 64) -> str:
    """DuckDB CTE chain restating ``kmeans_centroids`` +
    ``assign_clusters`` exactly (lowest-id seeds, 9-dp-rounded
    centroid components, argmin with cid tiebreak): produces CTEs
    ``e(vec_id, v)`` and ``af(vec_id, v, cid)`` — the final
    assignment, already filtered to the argmin row. Shared by the
    oracles of queries that compose on top of the deterministic
    quantizer (the _ivf_oracle idiom, factored)."""

    def dist(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
        )

    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""seed AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
        FROM e ORDER BY vec_id LIMIT {nlist}
    )""",
    ]
    prev = "seed"
    for k in range(1, iters + 1):
        parts.append(
            f"""a{k} AS (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist('e.v', 'c.c')}, c.cid) AS rn
        FROM e, {prev} AS c
    )"""
        )
        parts.append(
            f"""c{k} AS (
        SELECT cid, list(m ORDER BY i) AS c FROM (
            SELECT a.cid, t.i, round(avg(a.v[t.i]), 9) AS m
            FROM a{k} AS a, generate_series(1, {dim}) AS t(i)
            WHERE a.rn = 1
            GROUP BY a.cid, t.i
        ) GROUP BY cid
    )"""
        )
        prev = f"c{k}"
    final = iters + 1
    parts.append(
        f"""af AS MATERIALIZED (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {dist('e.v', 'c.c')}, c.cid)
                       AS rn
            FROM e, {prev} AS c
        ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(parts)
