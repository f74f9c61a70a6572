"""Drop-in replacement for the reference's HTTP API surface
(SURVEY.md §2.12; ``Codes/MovieShoppingServer/Server.py``).

Same five endpoints, same parameter names, same response shape
(list of dicts / dict, JSON-ready) — a user of the reference's
Flask backend can point at this class instead of
``DBAccessor`` and keep their client unchanged. The two dashboard
aggregations the frontend used to compute client-side
(``Chart.vue:96-111,182-190``) are exposed as first-class endpoints.

Serialization happens here (``collect`` at the API edge — the only
place a driver-side materialization is legitimate); everything
upstream is lazy DataFrame algebra.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .operators import relational as rel
from .operators import write as w


def _rows(df: DataFrame) -> list[dict[str, Any]]:
    return [json.loads(r) for r in df.toJSON().collect()]


class MovieShopAPI:
    """Bind to the three workload tables (any source: managed tables
    via ``sources.tsv.load_table``, parquet, or test fixtures)."""

    def __init__(
        self,
        spark: SparkSession,
        movie: DataFrame,
        review: DataFrame,
        order_info: DataFrame,
        order_table: str | None = None,
    ):
        self.spark = spark
        self.movie = movie
        self.review = review
        self.order_info = order_info
        self.order_table = order_table

    # POST /api/query_movie_list
    def query_movie_list(
        self, start_from: int = 0, limitation: int = 200, search_key: str = ""
    ) -> list[dict]:
        return _rows(
            rel.query_movie_list(self.movie, start_from, limitation, search_key)
        )

    # POST /api/query_movie/<id>
    def query_movie(self, movie_id: int) -> dict | None:
        rows = _rows(rel.query_movie(self.movie, self.review, movie_id))
        return rows[0] if rows else None

    # POST /api/query_order_list
    def query_order_list(
        self, start_from: int = 0, limitation: int = 10, time_limitation: str = "%"
    ) -> list[dict]:
        return _rows(
            rel.query_order_list(self.order_info, start_from, limitation, time_limitation)
        )

    # POST /api/insert_order
    def insert_order(self, item: dict) -> dict:
        updated = w.insert_order(
            self.spark, self.order_info, item, table=self.order_table
        )
        self.order_info = updated
        return {"success": True}

    # POST /api/recommend_movie_list
    def recommend_movie_list(self, start_from: int = 0, limitation: int = 15) -> list[dict]:
        return _rows(rel.recommend_movie_list(self.movie, start_from, limitation))

    # engine-side replacements for Chart.vue's client-side aggregation
    def monthly_sales(self) -> list[dict]:
        return _rows(rel.monthly_sales(self.order_info))

    def yearly_sales(self) -> list[dict]:
        return _rows(rel.yearly_sales(self.order_info))
