"""GreilFS storage-semantics analogs (SURVEY.md §2.9) as data-
parallel queries.

The reference implements an HDFS simulation: files split into fixed
blocks, 3× replicated across DataNodes, read back by fetching blocks
from their holders and reassembling in position order
(``Server/managers.py:361-386``, sort at ``:182``), plus liveness/
replication repair. On Spark the storage layer owns placement and
replication; the *observable semantics* worth keeping as engine
operators are:

- ordered reassembly of out-of-order fragments (H5/O7);
- the replication-invariant audit (H9: every block must have ≥3
  live replicas);
- round-robin placement balance (H4's allocator).

The queries derive a deterministic chunk/replica table from
``events`` IN THE QUERY ITSELF (same arithmetic in the oracle), so
the driver can value-check the operator without extra fixtures:
  file_id = user_id, position = per-file sequence by (ts, event_id),
  content = event_type, replicas on 5 simulated nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import table
from .registry import register

N_NODES = 5
REPLICATION = 3


@register(
    "chunks_ordered_reassembly",
    oracle="""
    SELECT user_id AS file_id,
           count(*) AS n_chunks,
           md5(string_agg(event_type, '|' ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS content_md5
    FROM events
    GROUP BY user_id
    """,
)
def chunks_ordered_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5/O7: ordered reassembly — fragments arrive unordered (the
    reference buffers Display messages and sorts by Position,
    ``Server/managers.py:178-187``); here: collect_list (arbitrary
    arrival order) → array_sort on (ts, event_id, payload) struct →
    ordered concat → content hash. One shuffle on file_id; the sort
    is per-group over the collected array, not a global sort."""
    e = table(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", F.col("event_type").alias("payload")))
    )
    return (
        e.groupBy(F.col("user_id").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.md5(
                F.concat_ws("|", F.transform(ordered, lambda s: s["payload"]))
            ).alias("content_md5"),
        )
    )


@register(
    "replication_audit",
    oracle=f"""
    WITH chunks AS (
        SELECT event_id AS chunk_id, r.replica,
               CAST((event_id + r.replica) % {N_NODES} AS INTEGER) AS node
        FROM events, generate_series(0, {REPLICATION - 1}) AS r(replica)
        WHERE event_type <> 'error'
    ), placement AS (
        SELECT chunk_id, count(DISTINCT node) AS n_live_replicas
        FROM chunks
        WHERE node <> 0
        GROUP BY chunk_id
    )
    SELECT CAST(n_live_replicas AS INTEGER) AS n_live_replicas,
           count(*) AS n_chunks
    FROM placement
    GROUP BY n_live_replicas
    """,
)
def replication_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9 analog: the replication-invariant check that motivates the
    reference's rebuild path (``Server/managers.py:219-267``).
    Chunks get {REPLICATION} replicas round-robin over {N_NODES}
    nodes (the reference's allocator, ``managers.py:666-700``);
    node 0 is marked dead (the H8 timeout outcome); the audit
    histograms surviving replica counts — any bucket < 3 is the
    rebuild work queue. At scale: one groupBy on chunk_id over the
    block-report table."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") != "error")
    replicas = e.select(
        F.col("event_id").alias("chunk_id"),
        F.explode(F.sequence(F.lit(0), F.lit(REPLICATION - 1))).alias("replica"),
    ).withColumn(
        "node", ((F.col("chunk_id") + F.col("replica")) % N_NODES).cast("int")
    )
    placement = (
        replicas.filter(F.col("node") != 0)
        .groupBy("chunk_id")
        .agg(F.countDistinct("node").alias("n_live_replicas"))
    )
    return (
        placement.groupBy(F.col("n_live_replicas").cast("int").alias("n_live_replicas"))
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )


@register(
    "placement_balance",
    oracle=f"""
    WITH chunks AS (
        SELECT CAST((event_id + r.replica) % {N_NODES} AS INTEGER) AS node
        FROM events, generate_series(0, {REPLICATION - 1}) AS r(replica)
    )
    SELECT node, count(*) AS n_blocks
    FROM chunks
    GROUP BY node
    """,
)
def placement_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4's round-robin placement, audited: blocks per node. The
    reference allocates replicas round-robin over alive nodes
    (``Server/managers.py:483-495``); balance = every node within
    one block of the mean. This is the per-node load histogram."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            F.explode(F.sequence(F.lit(0), F.lit(REPLICATION - 1))).alias("replica"),
            "event_id",
        )
        .select((((F.col("event_id") + F.col("replica")) % N_NODES).cast("int")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_blocks"))
    )
