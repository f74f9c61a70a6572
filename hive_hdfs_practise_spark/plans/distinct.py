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
