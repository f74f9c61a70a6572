"""API facade tests: the drop-in endpoint layer returns JSON-ready
shapes matching the reference's response contracts."""

from __future__ import annotations

import pytest

from hive_hdfs_practise_spark.api import MovieShopAPI


@pytest.fixture()
def api(spark, movie_df, review_df, order_df):
    return MovieShopAPI(spark, movie_df, review_df, order_df)


class TestApi:
    def test_movie_list_shape(self, api):
        rows = api.query_movie_list(limitation=2)
        assert len(rows) == 2
        assert set(rows[0]) == {"movie_id", "name", "price", "ranking", "information"}

    def test_movie_detail_with_reviews(self, api):
        m = api.query_movie(1299731)
        assert m["movie_id"] == 1299731
        assert [r["review_id"] for r in m["reviews"]] == [1, 2]
        assert m["information_parsed"]["title"] == "肖申克的救赎"

    def test_missing_movie_none(self, api):
        assert api.query_movie(999) is None

    def test_order_list_time_filter(self, api):
        rows = api.query_order_list(time_limitation="2016-%-%")
        assert [r["order_id"] for r in rows] == [3, 2]

    def test_insert_then_visible(self, api):
        api.insert_order(
            {"movie_id": 2133323, "movie_name": "活着 To Live", "movie_num": 2, "price_sum": 110.0}
        )
        rows = api.query_order_list(limitation=1)
        assert rows[0]["order_id"] == 7

    def test_recommend_excludes_null(self, api):
        ids = [r["movie_id"] for r in api.recommend_movie_list()]
        assert 3000001 not in ids

    def test_dashboard_totals(self, api):
        yearly = {r["year"]: r["total_sales"] for r in api.yearly_sales()}
        assert round(sum(yearly.values()), 1) == 620.5
