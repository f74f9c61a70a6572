"""JSON document operators (SURVEY.md §1.2/§2.8 F6-F7): build →
parse round-trip, engine-side.

The reference's ``movie.information`` pattern — a JSON document
stored as a string, parsed per row at projection time
(``DatabaseAccessor.py:43``) — re-expressed as ``to_json(struct)``
→ ``from_json(schema)``. The oracle states the IDENTITY (original
columns), so the check proves the round trip is lossless; the raw
JSON string itself is never compared (engines format JSON
differently)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import table
from .registry import register

_PART_DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("attrs", T.StructType(
            [
                T.StructField("brand", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("size", T.IntegerType()),
            ]
        )),
        T.StructField("price", T.DoubleType()),
    ]
)


@register(
    "json_roundtrip",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size,
           round(p_retailprice, 2) AS price
    FROM part
    WHERE p_size >= 25
    """,
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part rows → nested JSON document string → parsed struct →
    scalars again. Values must equal the originals bit-for-bit
    (F6 full-doc parse; nested attrs mirror the information doc's
    rating struct)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    doc = F.to_json(
        F.struct(
            F.col("p_partkey").alias("id"),
            F.col("p_name").alias("name"),
            F.struct(
                F.col("p_brand").alias("brand"),
                F.col("p_type").alias("type"),
                F.col("p_size").alias("size"),
            ).alias("attrs"),
            F.col("p_retailprice").alias("price"),
        )
    )
    parsed = p.select(doc.alias("doc")).select(
        F.from_json("doc", _PART_DOC_SCHEMA).alias("d")
    )
    return parsed.select(
        F.col("d.id").alias("p_partkey"),
        F.col("d.name").alias("p_name"),
        F.col("d.attrs.brand").alias("p_brand"),
        F.col("d.attrs.size").alias("p_size"),
        F.round("d.price", 2).alias("price"),
    )


@register(
    "events_salted_agg",
    oracle="""
    SELECT event_type,
           round(sum(value), 2) AS total,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: event_type has only 5 values — the
    degenerate low-cardinality/hot-key case — aggregated via the
    salted two-stage pattern (``operators/skew.py``). The oracle is
    the plain aggregate: salting must never change results."""
    from ..operators.skew import salted_sum_count

    e = table(spark, sf_dir, "events")
    out = salted_sum_count(e, ["event_type"], F.col("value"), n_salt=16)
    return out.select(
        "event_type", F.round("total", 2).alias("total"), F.col("n")
    )


@register(
    "events_props_map",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events
    WHERE event_type = 'signup'
    """,
)
def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed JSON: parse props into map<string,int>, then
    map_keys/element_at — the §2.8 array/map function surface that
    unlocks once documents are typed."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
    )


@register(
    "events_props_variant",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT path for semi-structured columns (Spark 4):
    ``parse_json`` converts the props string to the binary variant
    encoding once, ``try_variant_get`` extracts typed scalars — at
    scale the parse happens at INGEST and lands in parquet as a
    shredded variant column, so queries skip string parsing
    entirely. Same output contract (and oracle) as the
    get_json_object form in events_json_extract."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "event_type",
            F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("prop_k"),
        )
    )
