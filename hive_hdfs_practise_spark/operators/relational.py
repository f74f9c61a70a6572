"""The reference's five HTTP endpoints + two dashboard aggregations
as DataFrame-returning functions (SURVEY.md §2.12).

Each function takes the input DataFrames (movie/review/order_info in
the FIXTURES.md schemas) plus the endpoint's parameters and returns
the result DataFrame; serialization to JSON happens at the API edge
(``df.toJSON()``), exactly where the reference called ``jsonify``.

Reference pipelines (ops from SURVEY §2):
  query_movie_list   S1→P4→O2    Server.py:15-24
  query_movie        S1→P3→J1→P9 Server.py:27-29
  query_order_list   S1→P5→O3    Server.py:32-39
  recommend          S1→P6→O1    Server.py:49-53
  monthly/yearly sales  A3/A4/A5  Chart.vue:96-111,182-190 (was
                                  client-side; now engine-side)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.json_doc import parse_information
from .pagination import paginate

MOVIE_COLS = ["movie_id", "name", "price", "ranking", "information"]


def query_movie_list(
    movie: DataFrame, start_from: int = 0, limitation: int = 200, search_key: str = ""
) -> DataFrame:
    """Movie list with substring search. Empty/None search key →
    match-all, the reference normalizes to LIKE '%%'
    (``Server.py:20-23``). CJK substrings work — LIKE is
    codepoint-based in both engines."""
    pattern = f"%{search_key or ''}%"
    return paginate(
        movie.filter(F.col("name").like(pattern)).select(*MOVIE_COLS),
        [F.col("movie_id").asc()],
        start_from,
        limitation,
    )


def query_movie(movie: DataFrame, review: DataFrame, movie_id: int) -> DataFrame:
    """Single movie + its reviews nested as an ordered array + parsed
    information doc (P3 → J1 → P9). The single-row probe side makes
    the join a broadcast by construction."""
    m = movie.filter(F.col("movie_id") == movie_id)
    r = review.select(
        F.col("movie_id").alias("r_movie_id"),
        F.struct("review_id", "movie_id", "ranking", "content").alias("review"),
    )
    joined = m.join(r, m.movie_id == r.r_movie_id, "left")
    return (
        joined.groupBy(*MOVIE_COLS)
        .agg(
            F.array_sort(
                F.filter(F.collect_list("review"), lambda x: x.isNotNull())
            ).alias("reviews")
        )
        .withColumn("information_parsed", parse_information(F.col("information")))
    )


def query_order_list(
    order_info: DataFrame,
    start_from: int = 0,
    limitation: int = 10,
    time_limitation: str = "%",
) -> DataFrame:
    """Order list with LIKE time filter. The frontend assembles
    patterns like ``'2017-%-%'`` / ``'%-%-%'`` per selected date
    component (``OrderList.vue:126``); ``%`` wildcards pass through
    unchanged — same semantics, including '_' as a metacharacter."""
    return paginate(
        order_info.filter(F.col("create_time").like(time_limitation or "%")),
        [F.col("create_time").desc(), F.col("order_id").desc()],
        start_from,
        limitation,
    )


def recommend_movie_list(
    movie: DataFrame, start_from: int = 0, limitation: int = 15
) -> DataFrame:
    """Leaderboard: NULL rankings excluded (``DatabaseAccessor.py:115``),
    top-K by ranking desc; movie_id tiebreak makes pagination stable."""
    return paginate(
        movie.filter(F.col("ranking").isNotNull()).select(*MOVIE_COLS),
        [F.col("ranking").desc(), F.col("movie_id").asc()],
        start_from,
        limitation,
    )


def monthly_sales(order_info: DataFrame) -> DataFrame:
    """A3: per (year, month) revenue — replaces Chart.vue's triple
    nested loop over the full table shipped to the browser."""
    ts = F.to_timestamp("create_time", "yyyy-MM-dd HH:mm:ss")
    return (
        order_info.select(
            F.year(ts).alias("year"), F.month(ts).alias("month"), "price_sum"
        )
        .groupBy("year", "month")
        .agg(F.round(F.sum("price_sum"), 1).alias("total_sales"))
    )


def yearly_sales(order_info: DataFrame) -> DataFrame:
    """A4: yearly totals (the pie chart's re-sum)."""
    ts = F.to_timestamp("create_time", "yyyy-MM-dd HH:mm:ss")
    return (
        order_info.select(F.year(ts).alias("year"), "price_sum")
        .groupBy("year")
        .agg(F.round(F.sum("price_sum"), 1).alias("total_sales"))
    )


def max_monthly_sales(order_info: DataFrame) -> DataFrame:
    """A5: the chart's axis-scaling max over monthly buckets."""
    return monthly_sales(order_info).agg(
        F.max("total_sales").alias("max_monthly_sales")
    )
