"""Distinct aggregation surface (SURVEY.md §2.4 lists distinct-agg
ABSENT in the reference; engine-complete here).

``count(DISTINCT x)`` plans as a two-phase expand+aggregate in
Spark — exact, but the expand multiplies shuffle rows by the number
of distinct-agg columns. At 100 TB prefer
``approx_count_distinct`` (HyperLogLog++, one pass, mergeable
sketches); it has no cross-engine oracle (different HLL
implementations) so the exact form carries the value check and the
approx form is asserted within rsd bounds in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import table
from .registry import register


@register(
    "distinct_counts",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)                         AS n_customers,
           count(DISTINCT CAST(year(o_orderdate) AS INTEGER)) AS n_years,
           count(*)                                          AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase expand+aggregate):
    distinct customers and order years per status."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.year("o_orderdate")).alias("n_years"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register("distinct_counts_approx")
def distinct_counts_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-pass sketch form: HyperLogLog++ (mergeable partial
    sketches — the 100 TB default for distinct counts). Deterministic
    for fixed input but implementation-specific, so no cross-engine
    oracle; tests bound it against the exact twin."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_customers_approx"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# KMV (k-minimum-values, the theta-sketch core): keep the k smallest
# hash values of the distinct keys; estimate = (k-1)/h_(k). Unlike
# HLL the sketch is just k ordered doubles — trivially mergeable
# (min-k of unions) and, with an md5-derived hash, identical in any
# engine, so the estimate itself is oracle-checked EXACTLY.
KMV_K = 32
# uniform (0,1] from the first 8 md5 nibbles (dialect-neutral idiom)
_KMV_H = (
    "(("
    + " + ".join(
        f"CAST(instr('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), {p + 1}, 1)) - 1 AS BIGINT) * {1 << (4 * (7 - p))}"
        for p in range(8)
    )
    + " + 1) / 4294967296.0)"
)


@register(
    "events_kmv_distinct_users",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type, {_KMV_H} AS hv FROM events
    ),
    ranked AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_distinct
        FROM h
    )
    SELECT event_type,
           CAST(n_distinct AS BIGINT) AS n_exact,
           round(CASE WHEN n_distinct >= {KMV_K}
                      THEN ({KMV_K} - 1) / max(CASE WHEN rn = {KMV_K} THEN hv END)
                      ELSE CAST(n_distinct AS DOUBLE) END, 4) AS n_kmv
    FROM ranked
    GROUP BY event_type, n_distinct
    """,
)
def events_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a KMV/theta sketch: the
    k smallest md5-hash values of the key set. Sketch state is k
    doubles per group (mergeable by taking the min-k of a union —
    the property HLL shares but with exact cross-engine
    reproducibility, since the hash is md5-derived). Estimate
    (k-1)/h_(k); groups with fewer than k distinct keys fall back to
    the exact count the sketch already holds. The oracle restates
    hash, rank, and estimate — an 'approximate' operator, checked
    exactly."""
    e = table(spark, sf_dir, "events")
    h = e.select("event_type", F.expr(_KMV_H.replace("VARCHAR", "STRING")).alias("hv")).distinct()
    w = Window.partitionBy("event_type")
    ranked = h.select(
        "event_type",
        "hv",
        F.row_number().over(w.orderBy("hv")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_distinct"),
    )
    est = F.when(
        F.col("n_distinct") >= KMV_K,
        (KMV_K - 1) / F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))),
    ).otherwise(F.col("n_distinct").cast("double"))
    return (
        ranked.groupBy("event_type", "n_distinct")
        .agg(F.round(est, 4).alias("n_kmv"))
        .select(
            "event_type",
            F.col("n_distinct").cast("bigint").alias("n_exact"),
            "n_kmv",
        )
    )
