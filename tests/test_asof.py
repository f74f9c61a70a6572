"""Generic as-of join + banded range join operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_hdfs_practise_spark.operators.asof import asof_join, range_join_count


def _ts(s):
    return f"2024-01-01 {s}"


class TestAsofJoin:
    def _frames(self, spark):
        quotes = spark.createDataFrame(
            [
                ("A", _ts("09:00:00"), 10.0),
                ("A", _ts("09:00:05"), 11.0),
                ("A", _ts("09:00:20"), 12.0),
                ("B", _ts("09:00:03"), 100.0),
            ],
            "sym STRING, ts STRING, px DOUBLE",
        ).select("sym", F.to_timestamp("ts").alias("ts"), "px")
        trades = spark.createDataFrame(
            [
                ("A", _ts("09:00:04"), 7),   # after 10.0, before 11.0
                ("A", _ts("09:00:05"), 3),   # same instant as 11.0 → 11.0
                ("A", _ts("09:00:30"), 9),   # after 12.0
                ("B", _ts("09:00:01"), 5),   # before any B quote → NULL
            ],
            "sym STRING, ts STRING, qty INT",
        ).select("sym", F.to_timestamp("ts").alias("ts"), "qty")
        return trades, quotes

    def test_most_recent_at_or_before(self, spark):
        trades, quotes = self._frames(spark)
        out = asof_join(trades, quotes, on=["sym"], right_values=["px"])
        got = {(r.sym, r.qty): r.px_asof for r in out.collect()}
        assert got[("A", 7)] == 10.0
        assert got[("A", 3)] == 11.0  # same-instant right row included
        assert got[("A", 9)] == 12.0
        assert got[("B", 5)] is None  # nothing at or before

    def test_tolerance_nullifies_stale_matches(self, spark):
        trades, quotes = self._frames(spark)
        out = asof_join(
            trades, quotes, on=["sym"], right_values=["px"], tolerance_seconds=5
        )
        got = {(r.sym, r.qty): r.px_asof for r in out.collect()}
        assert got[("A", 7)] == 10.0   # 4s old → within tolerance
        assert got[("A", 9)] is None   # 10s old → stale

    def test_row_count_preserved(self, spark):
        trades, quotes = self._frames(spark)
        assert asof_join(trades, quotes, on=["sym"], right_values=["px"]).count() == 4


class TestRangeJoin:
    def test_banded_range_count(self, spark):
        left = spark.createDataFrame(
            [("A", _ts("09:10:00"))], "k STRING, ts STRING"
        ).select("k", F.to_timestamp("ts").alias("ts"))
        right = spark.createDataFrame(
            [
                ("A", _ts("09:05:30")),  # 270s before → in
                ("A", _ts("09:04:00")),  # 360s before → out
                ("A", _ts("09:09:59")),  # in
                ("A", _ts("09:10:01")),  # after → out (after_seconds=0)
                ("B", _ts("09:10:00")),  # other key
            ],
            "k STRING, ts STRING",
        ).select("k", F.to_timestamp("ts").alias("ts"))
        out = range_join_count(left, right, on=["k"], before_seconds=300).collect()
        assert len(out) == 1
        assert out[0].n_in_range == 2
