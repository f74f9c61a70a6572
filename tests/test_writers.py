"""Storage-layout tests: partition pruning and bucketed
(exchange-free) joins, asserted on the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_hdfs_practise_spark.sources.catalog import table
from hive_hdfs_practise_spark.sources.writers import write_bucketed, write_partitioned

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def layout_tables(spark):
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS layout_test")
    for t in ["orders_part", "orders_b", "lineitem_b"]:
        # clear both the catalog entry and any orphaned warehouse dir
        # left by a previous session (LOCATION_ALREADY_EXISTS guard)
        spark.sql(f"DROP TABLE IF EXISTS layout_test.{t}")
        shutil.rmtree(f"spark-warehouse/layout_test.db/{t}", ignore_errors=True)
    o = table(spark, SF, "orders").withColumn("o_year", F.year("o_orderdate"))
    write_partitioned(o, "layout_test.orders_part", ["o_year"])
    write_bucketed(
        table(spark, SF, "orders"),
        "layout_test.orders_b",
        ["o_orderkey"],
        n_buckets=4,
    )
    write_bucketed(
        table(spark, SF, "lineitem"),
        "layout_test.lineitem_b",
        ["l_orderkey"],
        n_buckets=4,
    )
    yield
    for t in ["orders_part", "orders_b", "lineitem_b"]:
        spark.sql(f"DROP TABLE IF EXISTS layout_test.{t}")


class TestPartitionPruning:
    def test_partition_filter_prunes(self, spark, layout_tables):
        df = spark.table("layout_test.orders_part").filter(F.col("o_year") == 1997)
        plan = _plan(df)
        assert "PartitionFilters" in plan
        assert "o_year" in plan.split("PartitionFilters", 1)[1][:200]
        # and the data still comes back right
        years = {r.o_year for r in df.select("o_year").distinct().collect()}
        assert years == {1997}


class TestBucketedJoin:
    def test_join_without_exchange(self, spark, layout_tables):
        o = spark.table("layout_test.orders_b")
        li = spark.table("layout_test.lineitem_b")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        # at fixture scale Catalyst would broadcast (also shuffle-free
        # but not what we're proving); disable broadcast to exercise
        # the bucketed sort-merge path a 100 TB join would take.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # no shuffle below the join: both sides read pre-bucketed
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning" not in plan.split("SortMergeJoin", 1)[1]
        # result parity vs the plain-table join
        plain = (
            table(spark, SF, "lineitem")
            .join(table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


class TestDynamicPartitionOverwrite:
    def test_only_touched_partitions_replaced(self, spark, tmp_path):
        from hive_hdfs_practise_spark.sources.writers import (
            overwrite_partitions_dynamic,
        )

        path = str(tmp_path / "t")
        full = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id LONG, p STRING, v LONG"
        )
        overwrite_partitions_dynamic(full, path, ["p"])
        # backfill partition b only (new value, new row count)
        patch = spark.createDataFrame([(9, "b", 99)], "id LONG, p STRING, v LONG")
        overwrite_partitions_dynamic(patch, path, ["p"])
        got = {
            (r.id, r.p, r.v) for r in spark.read.parquet(path).collect()
        }
        assert got == {(1, "a", 10), (9, "b", 99), (3, "c", 30)}
