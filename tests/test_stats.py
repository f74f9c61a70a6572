"""Approx-sketch aggregates asserted against their exact twins
(the cross-engine oracle covers the exact forms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_hdfs_practise_spark.sources.catalog import table

SF = "/root/testdata/sf0.001"


class TestApproxSketches:
    def test_approx_percentile_within_bounds(self, spark):
        o = table(spark, SF, "orders")
        row = o.agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)).alias("approx"),
        ).collect()[0]
        assert abs(row.approx - row.exact) / row.exact < 0.05

    def test_approx_count_distinct_within_rsd(self, spark):
        o = table(spark, SF, "orders")
        row = o.agg(
            F.countDistinct("o_custkey").alias("exact"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        ).collect()[0]
        assert abs(row.approx - row.exact) / row.exact < 0.08


class TestApproxPercentilesQuery:
    def test_within_one_percent_of_exact(self, spark):
        from hive_hdfs_practise_spark import plans as P

        exact = {
            r.o_orderstatus: (r.p50, r.p90, r.p99)
            for r in P.QUERIES["order_value_percentiles"](spark, SF).collect()
        }
        approx = {
            r.o_orderstatus: (r.p50, r.p90, r.p99)
            for r in P.QUERIES["order_value_percentiles_approx"](spark, SF).collect()
        }
        assert exact.keys() == approx.keys()
        for status, vals in exact.items():
            for e, a in zip(vals, approx[status]):
                assert abs(a - e) / e < 0.01


class TestKmvSketch:
    def test_estimate_accuracy_and_small_group_fallback(self, spark):
        from hive_hdfs_practise_spark import plans as P

        rows = P.QUERIES["events_kmv_distinct_users"](spark, "/root/testdata/sf0.01").collect()
        assert rows
        for r in rows:
            if r.n_exact < 32:
                assert r.n_kmv == float(r.n_exact)  # exact below k
            else:
                # k=32 → relative std ≈ 1/sqrt(k-1) ≈ 18%; allow 4σ
                assert abs(r.n_kmv - r.n_exact) / r.n_exact < 0.75
