"""Explicit schemas for the movie workload (no inference — the
reference declares fixed DDL types, ``create_table.sql:6-38``).

``information`` is the semi-structured JSON document column
(SURVEY.md §1.2): permissive all-string leaves where the source data
is degenerate (empty-string numerics, ``"id": "search"``
placeholders), typed only where every row is well-formed. ``pubdate``
is DOUBLE-encoded JSON (a JSON string containing a JSON array —
the frontend does a second JSON.parse, ``MovieCard.vue:85``), so it
stays a string here and ``functions/json_doc.py`` exposes the second
decode.
"""

from __future__ import annotations

from pyspark.sql import types as T

MOVIE_SCHEMA = T.StructType(
    [
        T.StructField("movie_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("ranking", T.DoubleType(), True),
        T.StructField("information", T.StringType(), True),
    ]
)

REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("review_id", T.IntegerType(), False),
        T.StructField("movie_id", T.IntegerType(), True),
        T.StructField("ranking", T.DoubleType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType(), False),
        T.StructField("movie_id", T.IntegerType(), True),
        T.StructField("movie_name", T.StringType(), True),
        T.StructField("movie_num", T.IntegerType(), True),
        T.StructField("price_sum", T.DoubleType(), True),
        T.StructField("create_time", T.StringType(), True),
    ]
)

_PERSON = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)

INFORMATION_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("aka", T.ArrayType(T.StringType()), True),
        T.StructField("casts", T.ArrayType(_PERSON), True),
        T.StructField("directors", T.ArrayType(_PERSON), True),
        T.StructField("writers", T.ArrayType(_PERSON), True),
        T.StructField("countries", T.ArrayType(T.StringType()), True),
        T.StructField("genres", T.ArrayType(T.StringType()), True),
        T.StructField("languages", T.ArrayType(T.StringType()), True),
        T.StructField("duration", T.StringType(), True),
        T.StructField("episodes", T.StringType(), True),
        T.StructField("imdb", T.StringType(), True),
        T.StructField("poster", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        # double-encoded JSON array — second decode via json_doc.pubdates()
        T.StructField("pubdate", T.StringType(), True),
        T.StructField(
            "rating",
            T.StructType(
                [
                    T.StructField("average", T.StringType(), True),
                    T.StructField("rating_people", T.StringType(), True),
                    T.StructField("stars", T.ArrayType(T.StringType()), True),
                ]
            ),
            True,
        ),
        T.StructField("season_count", T.StringType(), True),
        T.StructField("site", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("year", T.StringType(), True),
    ]
)
