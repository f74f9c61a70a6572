"""Ingest-path tests (SURVEY.md §2.1 S2/S3): TSV → managed table →
Spark SQL over it — the 'Spark SQL over Hive tables' north-star
path, exercised end to end on the session catalog."""

from __future__ import annotations

import pytest

from hive_hdfs_practise_spark.sources import tsv


@pytest.fixture(scope="module")
def movie_tsv(tmp_path_factory):
    p = tmp_path_factory.mktemp("ingest") / "movie_info.tsv"
    rows = [
        "1299731\t肖申克的救赎 The Shawshank Redemption\t65.0\t9.7\t{}",
        "10746041\t野狼 Hombre\t80.5\t7.2\t{}",
        "2133323\t活着 To Live\t55.0\t\t{}",  # empty ranking → NULL
    ]
    p.write_text("\n".join(rows), encoding="utf-8")
    return str(p)


class TestIngest:
    def test_tsv_schema_on_read(self, spark, movie_tsv):
        df = tsv.read_tsv(spark, movie_tsv, "movie")
        assert df.count() == 3
        assert dict(df.dtypes)["movie_id"] == "int"
        null_rank = df.filter("ranking IS NULL").collect()
        assert [r.movie_id for r in null_rank] == [2133323]

    def test_load_then_sql_over_managed_table(self, spark, movie_tsv):
        tsv.load_table(spark, movie_tsv, "movie", database="movie_shop_test")
        got = spark.sql(
            """
            SELECT movie_id, name FROM movie_shop_test.movie
            WHERE name LIKE '%救赎%' ORDER BY movie_id
            """
        ).collect()
        assert [r.movie_id for r in got] == [1299731]
        # reload OVERWRITEs (reference LOAD ... OVERWRITE semantics)
        tsv.load_table(spark, movie_tsv, "movie", database="movie_shop_test")
        assert spark.table("movie_shop_test.movie").count() == 3
        tsv.drop_table(spark, "movie", database="movie_shop_test")
        assert "movie" not in [
            t.name for t in spark.catalog.listTables("movie_shop_test")
        ]
