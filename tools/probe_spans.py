"""Round-8 probe: span-family fusion lever (verdict item 2).

Compares the current _duplicate_span_table plan (groupBy gram count
>= 2, join positions back — two gram-keyed passes over the persisted
gram table) against a FUSED form (count(*) OVER (PARTITION BY gram):
one shuffle of the gram table, no persist, no join-back) at 1x/10x/40x.

    python tools/probe_spans.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_hdfs_practise_spark.sources.catalog import wide_table
from hive_hdfs_practise_spark.plans.dedup import ESD_K
from hive_hdfs_practise_spark.session import get_spark


def _grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = wide_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        d.where(F.length("text") >= ESD_K)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - F.lit(ESD_K - 1))
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("i"),
            F.expr(f"substring(text, i, {ESD_K})").alias("gram"),
        )
    )


def _islands(pos: DataFrame, gap: int) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy("i")
    flg = pos.select(
        "doc_id",
        "i",
        F.when(F.lag("i").over(w) >= F.col("i") - gap, 0).otherwise(1).alias("f"),
    )
    grp = flg.select(
        "doc_id",
        "i",
        F.sum("f").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("gid"),
    )
    return grp.groupBy("doc_id", "gid").agg(
        F.min("i").cast("bigint").alias("span_start"),
        (F.max("i") + F.lit(ESD_K - 1)).cast("bigint").alias("span_end"),
        (F.max("i") + F.lit(ESD_K) - F.min("i")).cast("bigint").alias("span_len"),
        F.count(F.lit(1)).alias("n_dup_grams"),
    ).drop("gid")


def current(spark, sf_dir, gap=1) -> DataFrame:
    g = _grams(spark, sf_dir)
    g.persist()
    dup = (
        g.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2).select("gram")
    )
    pos = g.join(dup, "gram").select("doc_id", "i")
    return _islands(pos, gap)


def fused(spark, sf_dir, gap=1) -> DataFrame:
    g = _grams(spark, sf_dir)
    wg = Window.partitionBy("gram")
    pos = (
        g.select("doc_id", "i", F.count(F.lit(1)).over(wg).alias("c"))
        .where(F.col("c") >= 2)
        .select("doc_id", "i")
    )
    return _islands(pos, gap)


def fused_hash(spark, sf_dir, gap=1) -> DataFrame:
    """Fused, but shuffle an md5-u64 of the gram instead of the
    20-char string (portable across engines if oracled)."""
    g = _grams(spark, sf_dir).select(
        "doc_id",
        "i",
        F.expr("cast(conv(substring(md5(gram), 1, 15), 16, 10) as bigint)").alias(
            "gh"
        ),
    )
    wg = Window.partitionBy("gh")
    pos = (
        g.select("doc_id", "i", F.count(F.lit(1)).over(wg).alias("c"))
        .where(F.col("c") >= 2)
        .select("doc_id", "i")
    )
    return _islands(pos, gap)


def fused_pfx(spark, sf_dir, gap=1) -> DataFrame:
    """Fused, EXACT: window partitioned by (md5-u60 prefix, gram).
    gram determines the prefix, so the count equals count-by-gram
    (oracle unchanged); the numeric first key makes the sort
    radix-fast, the trailing gram comparison fires only on hash
    ties (i.e. almost only on true equals)."""
    g = _grams(spark, sf_dir).select(
        "doc_id",
        "i",
        "gram",
        F.expr("cast(conv(substring(md5(gram), 1, 15), 16, 10) as bigint)").alias(
            "gh"
        ),
    )
    wg = Window.partitionBy("gh", "gram")
    pos = (
        g.select("doc_id", "i", F.count(F.lit(1)).over(wg).alias("c"))
        .where(F.col("c") >= 2)
        .select("doc_id", "i")
    )
    return _islands(pos, gap)


VARIANTS = {
    "current": current,
    "fused": fused,
    "fused_hash": fused_hash,
    "fused_pfx": fused_pfx,
}


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)
    spark = get_spark("probe-spans")
    # warm
    spark.range(10).select(F.sum("id")).collect()
    dirs = [
        ("1x", "/root/testdata/sf0.1"),
        ("10x", "/tmp/testdata/sfx10"),
        ("40x", "/tmp/testdata/sfx40"),
    ]
    for label, sf in dirs:
        for name in names:
            fn = VARIANTS[name]
            best = None
            rows = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                df = fn(spark, sf)
                rows = df.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"{label:4s} {name:12s} {best:7.2f} s  rows={rows}",
                  flush=True)


if __name__ == "__main__":
    main()
