"""Scalar-function surface (SURVEY.md §2.8, F1-F10) exercised
end-to-end in one oracle-checked projection — string building,
substring search, date formatting, rounding, arithmetic, casts, and
codecs, each mapped from its reference call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table
from .registry import register


@register(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           concat('%', o_orderstatus, '%')                          AS like_pattern,
           instr(o_orderpriority, '-')                              AS dash_pos,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')               AS formatted_ts,
           round(o_totalprice, 1)                                   AS price_1dp,
           round(o_totalprice * 2 / 7, 4)                           AS arith,
           CAST(trunc(o_totalprice) AS INTEGER)                     AS price_int,
           CAST(CAST(o_orderkey AS DOUBLE) AS BIGINT)               AS key_roundtrip,
           upper(substring(o_orderpriority, 1, 3))                  AS prio_prefix,
           octet_length(encode(o_orderpriority))                          AS prio_bytes,
           CAST(year(o_orderdate) AS INTEGER) * 100
             + CAST(month(o_orderdate) AS INTEGER)                  AS yyyymm
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 concat (LIKE-pattern building, ``Server.py:23``); F2 instr
    (``Chart.vue:101``); F3 date_format (``DatabaseAccessor.py:130``);
    F4 1-decimal round (``:127``); F5 arithmetic (``Detail.vue:312``);
    F8 casts (``:124-127``); F9 str/bytes codec (``toolkit.py:4-22``);
    plus the year*100+month bucketing idiom (``Chart.vue:100-104``).
    All JVM built-ins inside one whole-stage-codegen projection."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.concat(F.lit("%"), F.col("o_orderstatus"), F.lit("%")).alias("like_pattern"),
        F.instr("o_orderpriority", "-").alias("dash_pos"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("formatted_ts"),
        F.round("o_totalprice", 1).alias("price_1dp"),
        F.round(F.col("o_totalprice") * 2 / 7, 4).alias("arith"),
        F.col("o_totalprice").cast("int").alias("price_int"),
        F.col("o_orderkey").cast("double").cast("bigint").alias("key_roundtrip"),
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio_prefix"),
        F.length(F.encode("o_orderpriority", "UTF-8")).alias("prio_bytes"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("yyyymm"),
    )
