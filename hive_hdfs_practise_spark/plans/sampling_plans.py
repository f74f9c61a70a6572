"""Deterministic sampling/split plans (training-pipeline surface).

Because the bucket rule is md5-based (``operators/sampling.py``),
even the SAMPLING is value-checked against DuckDB — same rows in
the sample, same split membership counts, bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import dataset_split, hash_sample
from ..sources.catalog import table
from .registry import register

_BUCKET = (
    "((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))"
)


@register(
    "dataset_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_BUCKET} % 256 < 26
    """,
)
def dataset_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of documents by md5 bucket of
    doc_id — identical membership across engines, runs, and
    partitionings (what ``df.sample(seed=...)`` cannot promise)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return hash_sample(d, "doc_id", 10)


@register(
    "dataset_split_counts",
    oracle=f"""
    SELECT CASE WHEN {_BUCKET} % 256 < 205 THEN 'train'
                WHEN {_BUCKET} % 256 < 231 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-proof 80/10/10 split assignment + per-split volume."""
    d = table(spark, sf_dir, "documents")
    return (
        dataset_split(d, "doc_id", 80, 10)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "dataset_stratified_sample",
    oracle=f"""
    SELECT lang, count(*) AS n_kept
    FROM documents
    WHERE {_BUCKET} % 256 < CASE WHEN lang = 'en' THEN 128
                                 WHEN lang = 'zh' THEN 51
                                 ELSE 26 END
    GROUP BY lang
    """,
)
def dataset_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED sample: per-language keep rates
    (50% en, 20% zh, 10% rest) via per-stratum md5-bucket cutoffs —
    the language-rebalancing step of a curation pipeline, exact in
    membership (not just expectation) across engines and
    partitionings, one filter and no sampling state."""
    from ..operators.sampling import stratified_hash_sample

    d = table(spark, sf_dir, "documents")
    kept = stratified_hash_sample(d, "doc_id", "lang", {"en": 50, "zh": 20}, 10)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "orders_reservoir_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
           o_orderstatus
    FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT 100
    """,
)
def orders_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-row sample without replacement, as a distributed
    reservoir: rank rows by a uniform hash of the key and keep the
    global k smallest. Classic single-pass reservoir sampling is
    sequential; the order-statistics formulation is its distributed
    equivalent (each partition keeps its local top-k, the driver
    merges k-sized heaps — Spark's TakeOrderedAndProject, no full
    sort, no shuffle of the table). md5 as the random key makes the
    sample reproducible across engines/runs/layouts, which
    ``df.sample(seed=...)`` cannot promise (partition-dependent).
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderstatus",
            F.md5(F.col("o_orderkey").cast("string")).alias("_hv"),
        )
        .orderBy("_hv", "o_orderkey")
        .limit(100)
        .drop("_hv")
    )
