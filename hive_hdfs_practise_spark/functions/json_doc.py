"""JSON document column helpers for ``movie.information``.

The reference stores a whole JSON document as a string column and
parses it per-row at projection time (``DatabaseAccessor.py:43``).
Engine-side that becomes ``from_json`` with the explicit schema —
parsed once, JVM-side, prunable by Catalyst (Spark only evaluates
the struct fields a query actually selects).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import INFORMATION_SCHEMA


def parse_information(col: Column) -> Column:
    """String → typed struct (malformed rows → NULL struct, matching
    the reference's behavior of failing only the affected row)."""
    return F.from_json(col, INFORMATION_SCHEMA)


def pubdates(info: Column) -> Column:
    """Second decode of the double-encoded pubdate field:
    ``"[\\"1967-03-21\\"]"`` → array<string> (``MovieCard.vue:85``,
    ``Detail.vue:224`` both JSON.parse twice)."""
    return F.from_json(info["pubdate"], T.ArrayType(T.StringType()))


def rating_5star(info: Column) -> Column:
    """rating.average is a STRING on a 10-scale, '' for unrated;
    frontend divides by 2 for 5-star display (``MovieCard.vue:90``,
    empty-string guard ``Detail.vue:231-236``)."""
    avg = info["rating"]["average"]
    return F.when(avg == "", None).otherwise(avg.cast("double") / 2.0)


def with_information(movies: DataFrame, keep_raw: bool = True) -> DataFrame:
    """Attach the parsed ``info`` struct (keeping the raw string by
    default — list endpoints return it verbatim in the reference,
    only detail views parse)."""
    out = movies.withColumn("info", parse_information(F.col("information")))
    return out if keep_raw else out.drop("information")


def explode_genres(movies: DataFrame) -> DataFrame:
    """(movie_id, genre) — array function surface over the parsed
    doc; enables genre-level aggregation the reference never could
    (it looped client-side)."""
    return with_information(movies).select(
        "movie_id", F.explode_outer(F.col("info.genres")).alias("genre")
    )
