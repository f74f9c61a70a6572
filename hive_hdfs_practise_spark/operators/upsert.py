"""MERGE-style upsert over plain parquet tables.

Without a table format that supports row-level MERGE (Delta/Iceberg
— not available here), the engine-level upsert is: union the base
table with the change set, keep the newest version per key
(row_number over a version column), rewrite. One shuffle on the
key; at scale the rewrite is bounded by partitioning the base table
and rewriting only partitions the change set touches (the
copy-on-write pattern table formats automate).

This is the durable-write twin of the ``events_dedup_latest`` query
(same keep-latest rule, applied at write time instead of read time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Newest row per key across base ∪ changes; change rows win ties
    (same version) over base rows. With ``delete_col`` (boolean),
    winning rows flagged True are dropped — tombstone semantics.

    Replay caveat (pinned in test_upsert::TestReplayIdempotence):
    applying the same change batch twice is idempotent as long as
    tombstones are RETAINED between applies (call without
    ``delete_col`` and filter at read time). Passing ``delete_col``
    drops winning tombstones physically, and a subsequent replay of
    a STALE change (older version than the dropped tombstone) would
    resurrect the deleted key — the standard reason log-structured
    stores keep tombstones for a retention window covering the
    at-least-once delivery horizon before compacting them away."""
    tagged_base = base.withColumn("_src", F.lit(0))
    tagged_changes = changes.withColumn("_src", F.lit(1))
    unioned = tagged_base.unionByName(tagged_changes)
    w = Window.partitionBy(*keys).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    latest = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    if delete_col is not None:
        latest = latest.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return latest


def upsert_table(
    spark,
    table_name: str,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    delete_col: str | None = None,
) -> None:
    """Apply the upsert to a managed parquet table (full rewrite —
    see module docstring for the partition-scoped variant at scale).
    The result is materialized before overwriting: Spark cannot
    overwrite a table from a plan that reads the same table."""
    base = spark.table(table_name)
    result = upsert(base, changes, keys, version_col, delete_col)
    cols = result.columns
    # Stage through a temp path unconditionally: one execution of the
    # upsert plan, bounded executor memory at any size. (A previous
    # small-table fast path ran count() THEN collect() — two full
    # executions — to route tiny results through the driver; the
    # write+read costs one extra parquet round-trip but never
    # collects, which is also the only shape that works at scale.)
    # Unique per-invocation staging path: a fixed name would race two
    # concurrent upserts to the same table (or two sessions sharing
    # the host) into overwriting each other's stage mid-read.
    import shutil
    import tempfile

    stage_root = tempfile.mkdtemp(prefix=f"upsert_stage_{table_name.replace('.', '_')}_")
    tmp = f"{stage_root}/stage"
    try:
        result.write.mode("overwrite").parquet(tmp)
        out = spark.read.parquet(tmp)
        out.select(cols).write.mode("overwrite").format("parquet").saveAsTable(
            table_name
        )
    finally:
        shutil.rmtree(stage_root, ignore_errors=True)
