"""Endpoint parity tests (SURVEY.md §2.12, §5.2-5.3): the five HTTP
queries + dashboard aggregations on reference-shaped fixtures,
edge cases taken from reference behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_hdfs_practise_spark.functions.json_doc import (
    pubdates,
    rating_5star,
    with_information,
)
from hive_hdfs_practise_spark.operators.relational import (
    max_monthly_sales,
    monthly_sales,
    query_movie,
    query_movie_list,
    query_order_list,
    recommend_movie_list,
    yearly_sales,
)
from hive_hdfs_practise_spark.operators.write import insert_order, next_order_id


class TestMovieList:
    def test_cjk_substring_search(self, movie_df):
        # P4: CJK substring must match (reference data is Chinese)
        got = query_movie_list(movie_df, search_key="救赎").collect()
        assert [r.movie_id for r in got] == [1299731]

    def test_latin_substring_search(self, movie_df):
        got = query_movie_list(movie_df, search_key="Hombre").collect()
        assert [r.movie_id for r in got] == [10746041]

    def test_empty_key_matches_all(self, movie_df):
        # Server.py:20-23: '' → LIKE '%%' → match-all
        assert query_movie_list(movie_df, search_key="").count() == 5
        assert query_movie_list(movie_df, search_key=None).count() == 5

    def test_pagination_ordered_by_id(self, movie_df):
        page = query_movie_list(movie_df, start_from=1, limitation=2).collect()
        assert [r.movie_id for r in page] == [2133323, 3000001]


class TestMovieDetail:
    def test_join_nests_ordered_reviews(self, movie_df, review_df):
        row = query_movie(movie_df, review_df, 1299731).collect()[0]
        assert [rv.review_id for rv in row.reviews] == [1, 2]
        assert row.reviews[0].content.startswith("希望")

    def test_movie_without_reviews_gets_empty_array(self, movie_df, review_df):
        row = query_movie(movie_df, review_df, 3000001).collect()[0]
        assert row.reviews == []

    def test_information_parsed(self, movie_df, review_df):
        row = query_movie(movie_df, review_df, 1299731).collect()[0]
        info = row.information_parsed
        assert info.title == "肖申克的救赎"
        assert "剧情" in info.genres
        assert info.casts[0].name == "张三"


class TestJsonDoc:
    def test_double_encoded_pubdate(self, movie_df):
        df = with_information(movie_df).select(
            "movie_id", pubdates(F.col("info")).alias("pd")
        )
        row = df.filter(F.col("movie_id") == 1299731).collect()[0]
        assert row.pd == ["1994-09-10(多伦多电影节)"]

    def test_empty_rating_average_is_null(self, movie_df):
        # Detail.vue:231-236 guards '' average; engine → NULL not crash
        df = with_information(movie_df).select(
            "movie_id", rating_5star(F.col("info")).alias("stars")
        )
        by_id = {r.movie_id: r.stars for r in df.collect()}
        assert by_id[3000001] is None
        assert abs(by_id[1299731] - 4.25) < 1e-9


class TestOrderList:
    def test_time_like_year_month(self, order_df):
        got = query_order_list(order_df, time_limitation="2016-03%").collect()
        assert [r.order_id for r in got] == [3, 2]  # desc by create_time

    def test_frontend_wildcard_pattern(self, order_df):
        # OrderList.vue:126 builds '%-%-%' style patterns
        assert query_order_list(order_df, time_limitation="%-%-%").count() == 6
        got = query_order_list(order_df, time_limitation="2017-%-%").count()
        assert got == 2

    def test_default_matches_all_sorted_desc(self, order_df):
        got = query_order_list(order_df, limitation=3).collect()
        assert [r.order_id for r in got] == [6, 5, 4]


class TestRecommend:
    def test_null_ranking_excluded_topk(self, movie_df):
        got = recommend_movie_list(movie_df).collect()
        ids = [r.movie_id for r in got]
        assert 3000001 not in ids  # NULL ranking filtered (P6)
        assert ids[0] == 1299731  # 9.7 first
        assert ids[1:3] == [2133323, 3000002]  # 9.3 tie → id asc


class TestInsert:
    def test_dense_ascending_id_and_rounding(self, spark, order_df):
        item = {
            "movie_id": 1299731,
            "movie_name": "肖申克的救赎 The Shawshank Redemption",
            "movie_num": 3,
            "price_sum": 195.0001,
        }
        assert next_order_id(order_df) == 7
        out = insert_order(spark, order_df, item, now="2020-01-01 00:00:00")
        new = out.filter(F.col("order_id") == 7).collect()[0]
        assert new.price_sum == 195.0  # F4: 1-decimal rounding
        assert new.create_time == "2020-01-01 00:00:00"
        assert out.count() == 7

    def test_empty_table_starts_at_one(self, spark, order_df):
        empty = order_df.filter(F.lit(False))
        assert next_order_id(empty) == 1


class TestDashboard:
    def test_monthly_sales_groups(self, order_df):
        got = {(r.year, r.month): r.total_sales for r in monthly_sales(order_df).collect()}
        assert got[(2016, 3)] == 245.5  # 80.5 + 165.0
        assert got[(2015, 1)] == 130.0

    def test_yearly_rollup_consistent(self, order_df):
        yearly = {r.year: r.total_sales for r in yearly_sales(order_df).collect()}
        assert yearly[2017] == 190.0
        # total across years == total across months == Σ price_sum
        total = round(sum(yearly.values()), 1)
        assert total == 620.5

    def test_max_monthly(self, order_df):
        assert max_monthly_sales(order_df).collect()[0][0] == 245.5


class TestMalformedJson:
    def test_malformed_information_yields_null_struct(self, spark):
        from hive_hdfs_practise_spark.functions.json_doc import parse_information

        df = spark.createDataFrame(
            [(1, '{"title": "ok"}'), (2, "{not json"), (3, None)],
            "movie_id INT, information STRING",
        ).select("movie_id", parse_information(F.col("information")).alias("info"))
        rows = {r.movie_id: r.info for r in df.collect()}
        assert rows[1].title == "ok"
        # malformed → struct of all-NULL fields (PERMISSIVE), no crash
        assert rows[2].title is None and rows[2].rating is None
        assert rows[3] is None  # NULL input → NULL struct
