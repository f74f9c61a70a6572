"""Keyset pagination + sampling determinism + JSON array explode —
the remaining untested library operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_hdfs_practise_spark.functions.json_doc import explode_genres
from hive_hdfs_practise_spark.operators.pagination import keyset_page, paginate
from hive_hdfs_practise_spark.operators.sampling import dataset_split, hash_sample
from hive_hdfs_practise_spark.sources.catalog import table

SF = "/root/testdata/sf0.001"


class TestKeysetPagination:
    def test_keyset_pages_equal_offset_pages(self, spark):
        o = table(spark, SF, "orders")
        page1 = paginate(o, [F.col("o_orderkey").asc()], 0, 10).collect()
        page2_offset = paginate(o, [F.col("o_orderkey").asc()], 10, 10).collect()
        last_key = page1[-1].o_orderkey
        page2_keyset = keyset_page(o, F.col("o_orderkey"), last_key, 10).collect()
        assert [r.o_orderkey for r in page2_keyset] == [
            r.o_orderkey for r in page2_offset
        ]

    def test_keyset_descending(self, spark):
        o = table(spark, SF, "orders")
        first = keyset_page(o, F.col("o_orderkey"), None, 5, descending=True).collect()
        nxt = keyset_page(
            o, F.col("o_orderkey"), first[-1].o_orderkey, 5, descending=True
        ).collect()
        keys = [r.o_orderkey for r in first + nxt]
        assert keys == sorted(keys, reverse=True) and len(set(keys)) == 10

    def test_keyset_predicate_pushed_to_scan(self, spark):
        o = table(spark, SF, "orders")
        df = keyset_page(o, F.col("o_orderkey"), 5000, 10)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "GreaterThan(o_orderkey,5000)" in plan  # PushedFilters

class TestSamplingDeterminism:
    def test_hash_sample_stable_under_repartition(self, spark):
        d = table(spark, SF, "documents")
        a = {r.doc_id for r in hash_sample(d, "doc_id", 20).select("doc_id").collect()}
        b = {
            r.doc_id
            for r in hash_sample(d.repartition(17), "doc_id", 20)
            .select("doc_id")
            .collect()
        }
        assert a == b and 0 < len(a) < d.count()

    def test_split_partitions_exhaustive_and_disjoint(self, spark):
        d = table(spark, SF, "documents")
        out = dataset_split(d, "doc_id").groupBy("split").count().collect()
        counts = {r.split: r["count"] for r in out}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == d.count()
        assert counts["train"] > counts["val"]


class TestGenreExplode:
    def test_explode_genres_rows(self, spark, movie_df):
        rows = explode_genres(movie_df).collect()
        pairs = {(r.movie_id, r.genre) for r in rows}
        assert (1299731, "剧情") in pairs and (1299731, "犯罪") in pairs
        # every movie contributes at least one row (outer explode)
        assert len({r.movie_id for r in rows}) == movie_df.count()


class TestStratifiedSample:
    def test_membership_deterministic_and_stratified(self, spark):
        from pyspark.sql import functions as F

        from hive_hdfs_practise_spark.operators.sampling import (
            md5_bucket,
            stratified_hash_sample,
        )
        from hive_hdfs_practise_spark.sources.catalog import table

        d = table(spark, "/root/testdata/sf0.001", "documents")
        kept = stratified_hash_sample(d, "doc_id", "lang", {"en": 50}, 10)
        a = {r.doc_id for r in kept.collect()}
        b = {r.doc_id for r in kept.collect()}
        assert a == b
        # membership follows the per-stratum cutoff exactly
        rows = d.select(
            "doc_id", "lang", md5_bucket(F.col("doc_id")).alias("bucket")
        ).collect()
        want = {
            r.doc_id for r in rows if r.bucket < (128 if r.lang == "en" else 26)
        }
        assert a == want


class TestBloomSemiJoin:
    def test_no_false_negatives_and_pruning(self, spark):
        from pyspark.sql import functions as F

        from hive_hdfs_practise_spark.operators.bloom import (
            bloom_semi_join,
            build_bloom,
            might_contain,
        )
        from hive_hdfs_practise_spark.sources.catalog import table

        sf = "/root/testdata/sf0.001"
        li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
        dim = spark.createDataFrame([(1,), (3,), (7,)], "s_suppkey LONG")
        bloom = build_bloom(dim, "s_suppkey")
        pruned = li.join(F.broadcast(bloom)).filter(
            might_contain(F.col("bloom"), F.col("l_suppkey"))
        )
        exact = {
            tuple(r)
            for r in li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey, "left_semi").collect()
        }
        survivors = {tuple(r.asDict(True).values())[:2] for r in pruned.drop("bloom").collect()}
        assert exact <= survivors          # never drops a real match
        assert len(survivors) < li.count() # and it actually prunes
        got = {tuple(r) for r in bloom_semi_join(li, dim, "l_suppkey", "s_suppkey").collect()}
        assert got == exact

    def test_empty_dimension_prunes_everything(self, spark):
        from hive_hdfs_practise_spark.operators.bloom import bloom_semi_join
        from hive_hdfs_practise_spark.sources.catalog import table

        sf = "/root/testdata/sf0.001"
        li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
        empty = spark.createDataFrame([], "s_suppkey LONG")
        assert bloom_semi_join(li, empty, "l_suppkey", "s_suppkey").count() == 0


class TestSourceQuota:
    """r4: documents_source_quota — per-source cap with md5-rank
    selection."""

    def test_cap_and_determinism(self, spark):
        from hive_hdfs_practise_spark import plans
        from hive_hdfs_practise_spark.plans.sampling_plans import SOURCE_QUOTA

        sf = "/root/testdata/sf0.001"
        df = plans.QUERIES["documents_source_quota"](spark, sf)
        rows = df.collect()
        per_source = {}
        for r in rows:
            per_source.setdefault(r.source, []).append(r.quota_rank)
        for src, ranks in per_source.items():
            assert len(ranks) <= SOURCE_QUOTA
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
        # deterministic across runs
        again = {(r.doc_id, r.quota_rank) for r in df.collect()}
        assert again == {(r.doc_id, r.quota_rank) for r in rows}

    def test_rank_filter_pushes_window_group_limit(self, spark):
        from hive_hdfs_practise_spark import plans

        p = (
            plans.QUERIES["documents_source_quota"](spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # map-side top-K per source before the exchange
        assert "WindowGroupLimit" in p and "Partial" in p


class TestLangRebalance:
    """r4: documents_lang_rebalance — sqrt-smoothed language mix."""

    def test_keep_counts_match_formula_and_tails_kept(self, spark):
        import math

        from hive_hdfs_practise_spark import plans
        from hive_hdfs_practise_spark.sources.catalog import table

        sf = "/root/testdata/sf0.001"
        docs = table(spark, sf, "documents")
        n_by_lang = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        total = sum(n_by_lang.values())
        s = round(sum(round(math.sqrt(n), 9) for n in n_by_lang.values()), 9)
        want = {
            lang: min(n, math.floor(round(total * round(math.sqrt(n), 9) / s, 9)))
            for lang, n in n_by_lang.items()
        }
        out = plans.QUERIES["documents_lang_rebalance"](spark, sf).collect()
        got = {}
        for r in out:
            got[r.lang] = got.get(r.lang, 0) + 1
        assert got == want
        # the dominant language is trimmed, the smallest keeps all
        small = min(n_by_lang, key=n_by_lang.get)
        big = max(n_by_lang, key=n_by_lang.get)
        assert got[small] == n_by_lang[small]
        assert got[big] < n_by_lang[big]
