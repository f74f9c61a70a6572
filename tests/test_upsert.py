"""MERGE-style upsert semantics: insert, update, tombstone delete,
tie-breaking, and the managed-table round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_hdfs_practise_spark.operators.upsert import upsert, upsert_table


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "id LONG, v STRING, ver LONG"
    )


class TestUpsert:
    def test_insert_update_passthrough(self, spark, base):
        changes = spark.createDataFrame(
            [(2, "b2", 2), (4, "d", 1)], "id LONG, v STRING, ver LONG"
        )
        got = {r.id: (r.v, r.ver) for r in upsert(base, changes, ["id"], "ver").collect()}
        assert got == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 1), 4: ("d", 1)}

    def test_equal_version_change_wins(self, spark, base):
        changes = spark.createDataFrame([(1, "a_new", 1)], "id LONG, v STRING, ver LONG")
        got = {r.id: r.v for r in upsert(base, changes, ["id"], "ver").collect()}
        assert got[1] == "a_new"

    def test_stale_change_loses(self, spark):
        base = spark.createDataFrame([(1, "newer", 5)], "id LONG, v STRING, ver LONG")
        changes = spark.createDataFrame([(1, "older", 3)], "id LONG, v STRING, ver LONG")
        got = upsert(base, changes, ["id"], "ver").collect()
        assert got[0].v == "newer"

    def test_tombstone_delete(self, spark, base):
        b = base.withColumn("deleted", F.lit(False))
        changes = spark.createDataFrame(
            [(3, "c", 2, True)], "id LONG, v STRING, ver LONG, deleted BOOLEAN"
        )
        got = {r.id for r in upsert(b, changes, ["id"], "ver", "deleted").collect()}
        assert got == {1, 2}

    def test_managed_table_round_trip(self, spark, base):
        import shutil

        spark.sql("CREATE DATABASE IF NOT EXISTS upsert_test")
        spark.sql("DROP TABLE IF EXISTS upsert_test.t")
        shutil.rmtree("spark-warehouse/upsert_test.db/t", ignore_errors=True)
        base.write.format("parquet").saveAsTable("upsert_test.t")
        changes = spark.createDataFrame(
            [(2, "b9", 9), (5, "e", 1)], "id LONG, v STRING, ver LONG"
        )
        upsert_table(spark, "upsert_test.t", changes, ["id"], "ver")
        got = {r.id: r.v for r in spark.table("upsert_test.t").collect()}
        assert got == {1: "a", 2: "b9", 3: "c", 5: "e"}
        spark.sql("DROP TABLE upsert_test.t")


class TestQualityReport:
    def test_metrics_and_failures(self, spark):
        from hive_hdfs_practise_spark.operators.checks import quality_report

        df = spark.createDataFrame(
            [(1, 1, 10.0), (2, None, 200.0), (3, 3, 30.0), (3, 3, 40.0)],
            "k LONG, v LONG, x DOUBLE",
        )
        rows = {
            r.check_name: (r.metric, r.passed)
            for r in quality_report(
                df,
                completeness=["k", "v"],
                unique=[["k"]],
                ranges={"x": (0.0, 100.0)},
            ).collect()
        }
        assert rows["completeness:k"] == (1.0, True)
        assert rows["completeness:v"] == (0.75, False)
        assert rows["unique:k"] == (0.75, False)       # duplicate k=3
        assert rows["range:x"] == (0.75, False)        # 200.0 out of range

    def test_single_scan_plan(self, spark):
        from hive_hdfs_practise_spark.operators.checks import quality_report
        from hive_hdfs_practise_spark.sources.catalog import table

        li = table(spark, "/root/testdata/sf0.001", "lineitem")
        rep = quality_report(
            li, completeness=["l_orderkey"], unique=[["l_orderkey", "l_linenumber"]],
            ranges={"l_quantity": (1, 50)},
        )
        plan = rep._jdf.queryExecution().executedPlan().toString()
        # one wide metric scan + one key-pruned scan per unique check
        assert plan.count("FileScan") == 2
        # the uniqueness branch must prune its scan to the key columns
        import re

        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert any(
            set(s.split(",")) and all(c.startswith(("l_orderkey", "l_linenumber")) for c in s.split(","))
            for s in schemas
        ), schemas
        # no Expand (the combined count-DISTINCT plan would add one)
        assert "Expand" not in plan


class TestReplayIdempotence:
    """r4: MERGE replay safety — the at-least-once delivery property
    (verdict task: the reference's single-writer lock semantics, A2,
    generalized). A change batch applied twice, or re-applied after
    already being merged, must leave the table exactly as one apply
    would; similarly the managed-table round trip under a simulated
    double-apply."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _rows = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # id: forced collisions
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=0, max_value=4),  # version: forced ties
            st.booleans(),  # tombstone flag
        ),
        min_size=0,
        max_size=12,
    ).map(
        # one row per (id, ver): duplicate (id, ver) rows with
        # different payloads make keep-latest itself ambiguous, which
        # is an input contract, not a replay property
        lambda rows: list({(r[0], r[2]): r for r in rows}.values())
    )

    @given(base_rows=_rows, change_rows=_rows)
    @settings(max_examples=8, deadline=None)
    def test_double_apply_equals_single_apply(self, spark, base_rows, change_rows):
        """Idempotence holds when tombstones are RETAINED between
        applies (merge without delete_col; filter at read time) —
        the retention model the upsert docstring prescribes for
        at-least-once delivery."""
        schema = "id LONG, v STRING, ver LONG, deleted BOOLEAN"
        base = spark.createDataFrame(base_rows, schema)
        changes = spark.createDataFrame(change_rows, schema)

        def read_view(df):
            return sorted(
                map(
                    tuple,
                    df.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
                    .drop("deleted")
                    .collect(),
                )
            )

        once = upsert(base, changes, ["id"], "ver")
        twice = upsert(once, changes, ["id"], "ver")
        assert read_view(once) == read_view(twice)

    def test_dropped_tombstone_resurrection_is_real(self, spark):
        """The documented NON-property (found by hypothesis): if the
        winning tombstone is physically dropped (delete_col applied)
        and a STALE change for that key replays, the deleted key
        resurrects — which is exactly why the docstring prescribes
        tombstone retention across the delivery horizon."""
        schema = "id LONG, v STRING, ver LONG, deleted BOOLEAN"
        base = spark.createDataFrame([(0, "a", 1, True)], schema)
        stale = spark.createDataFrame([(0, "a", 0, False)], schema)
        once = upsert(base, stale, ["id"], "ver", delete_col="deleted")
        assert once.collect() == []  # tombstone wins and is dropped
        merged_base = once.withColumn("deleted", F.lit(False))
        replayed = upsert(merged_base, stale, ["id"], "ver", delete_col="deleted")
        assert [tuple(r) for r in replayed.collect()] == [(0, "a", 0)]

    def test_managed_table_double_apply(self, spark, base):
        spark.sql("DROP TABLE IF EXISTS upsert_replay_t")
        import shutil

        shutil.rmtree("spark-warehouse/upsert_replay_t", ignore_errors=True)
        base.write.mode("overwrite").format("parquet").saveAsTable("upsert_replay_t")
        changes = spark.createDataFrame(
            [(2, "b2", 2), (4, "d", 1)], "id LONG, v STRING, ver LONG"
        )
        upsert_table(spark, "upsert_replay_t", changes, ["id"], "ver")
        after_once = sorted(map(tuple, spark.table("upsert_replay_t").collect()))
        upsert_table(spark, "upsert_replay_t", changes, ["id"], "ver")
        after_twice = sorted(map(tuple, spark.table("upsert_replay_t").collect()))
        assert after_once == after_twice == [
            (1, "a", 1),
            (2, "b2", 2),
            (3, "c", 1),
            (4, "d", 1),
        ]
        spark.sql("DROP TABLE IF EXISTS upsert_replay_t")
