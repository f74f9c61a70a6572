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


class TestFormatMatrix:
    def test_round_trip_all_formats(self, spark, order_df, tmp_path):
        from hive_hdfs_practise_spark.sources.formats import FORMATS, round_trip

        want = {tuple(r) for r in order_df.collect()}
        for fmt in FORMATS:
            got = {
                tuple(r)
                for r in round_trip(order_df, str(tmp_path / fmt), fmt).collect()
            }
            assert got == want, f"{fmt} round trip lost data"

    def test_text_formats_preserve_timestamps(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from hive_hdfs_practise_spark.sources.formats import round_trip

        df = spark.createDataFrame(
            [(1, "2015-01-08 10:00:00.123456")], "id LONG, s STRING"
        ).select("id", F.col("s").cast("timestamp").alias("ts"))
        for fmt in ("json", "csv"):
            got = round_trip(df, str(tmp_path / f"ts_{fmt}"), fmt).collect()[0]
            assert got.ts == df.collect()[0].ts, f"{fmt} lost timestamp precision"

    def test_unknown_format_rejected(self, spark, order_df, tmp_path):
        import pytest as _pytest

        from hive_hdfs_practise_spark.sources.formats import write_table

        with _pytest.raises(ValueError):
            write_table(order_df, str(tmp_path / "x"), "avro")


class TestEventsTsUnitProbe:
    """r4 (ADVICE): events_ts_unit must find the REAL unit through
    pyarrow.dataset when the direct ParquetFile probe can't open the
    layout, and must warn loudly when both probes fail and it falls
    back to guessing 'ns'."""

    def test_dataset_fallback_reads_real_unit(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from hive_hdfs_practise_spark.sources import catalog

        # a MICROS-unit events table in a nested directory layout the
        # flat glob doesn't cover (subdir between table dir and files)
        d = tmp_path / "events.parquet" / "part=0"
        d.mkdir(parents=True)
        tbl = pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
                "user_id": pa.array([1], pa.int64()),
                "event_type": pa.array(["click"]),
                "value": pa.array([1.0]),
                "props": pa.array(["{}"]),
            }
        )
        pq.write_table(tbl, d / "part-0.parquet")
        catalog._EVENTS_UNIT_CACHE.pop(str(tmp_path), None)
        assert catalog.events_ts_unit(str(tmp_path)) == "us"

    def test_unreachable_path_warns_and_guesses_ns(self):
        import warnings

        from hive_hdfs_practise_spark.sources import catalog

        missing = "/nonexistent/sfdir-r4-probe"
        catalog._EVENTS_UNIT_CACHE.pop(missing, None)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            assert catalog.events_ts_unit(missing) == "ns"
        assert any("GUESSING" in str(w.message) for w in caught)
