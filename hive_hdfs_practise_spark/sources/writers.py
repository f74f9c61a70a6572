"""Storage layout writers — where 100 TB performance is actually
won. The reference's only layout decision was denormalizing
movie_name into order_info to skip a join
(``Document/Hive&Hdfs.md:707-711``); the engine generalizes that
idea into the three Spark-native layout levers:

- ``write_partitioned``: hive-style partition directories on
  low-cardinality derived keys (year/month). Predicates on the
  partition columns prune whole directories — the engine-side
  replacement for the reference's LIKE-on-date-string filters.
- ``write_bucketed``: pre-shuffled, persistently hashed layout on a
  join key. Two tables bucketed the same way join WITHOUT any
  exchange (verified in tests by asserting the absence of Exchange
  in the physical plan) — at scale this turns every
  orders⋈lineitem from a 2-sided shuffle into a local zip.
- ``compact``: small-file compaction via repartition-on-write,
  the antidote to streaming sinks' file explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    table: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .format("parquet")
        .partitionBy(*partition_cols)
        .saveAsTable(table)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    # Cluster rows by the bucket hash BEFORE the write (guide §6
    # small files / §2.4 one-exchange layout): repartition(n, cols)
    # is the same Murmur3 HashPartitioning bucketBy assigns files
    # with, so each write task holds exactly one bucket's rows and
    # emits ONE file — without it every input partition writes up to
    # n_buckets files (measured 96 vs 32 files and 1.60 vs 0.86 s
    # for the sf0.1 minhash bands build; at scale the M×n_buckets
    # blowup is what compaction exists to undo). Write parallelism
    # equals n_buckets, which a deployment sizes to the corpus
    # (the nlist ∝ √n rule) exactly like the probe side.
    w = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def compact(df: DataFrame, path: str, target_files: int, mode: str = "overwrite") -> None:
    """Rewrite with a bounded file count (coalesce keeps it
    shuffle-free when reducing)."""
    df.coalesce(target_files).write.mode(mode).parquet(path)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Overwrite ONLY the partitions present in ``df``, leaving all
    others intact — the incremental-backfill write (reprocess one
    day without rewriting the table). Spark's static overwrite mode
    would drop every partition first; the dynamic option scopes the
    delete to partitions the frame touches."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
