"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a count-style action (collect) so the
full plan executes; timings exclude session startup and the first
warm-up run of the flagship query (JVM/codegen warm-up), matching
how a resident engine would serve queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_hdfs_practise_spark import plans  # noqa: E402
from hive_hdfs_practise_spark.session import get_spark  # noqa: E402

# Headline set: scan-agg, multi-join, selective filter, window,
# dedup (exact + LSH), similarity, text — the operator classes that
# dominate at scale. (Quadratic verifier queries like
# dedup_ngram_jaccard are deliberately excluded: they are correctness
# oracles, not scale-path operators.)
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customer",
    "q4_order_priority",
    "q7_volume_shipping",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "q22_global_sales_opportunity",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_customer_distribution",
    "q16_supplier_counts",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "sales_by_year_month",
    "sales_rollup",
    "sales_grouping_sets",
    "monthly_sales_ranked",
    "events_sessionize",
    "events_dedup_latest",
    "events_hourly_tumbling",
    "heartbeat_liveness",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # dedup_simhash_bucketed is deliberately NOT benched: the
    # crossover study (SCALING.md, tools/simhash_crossover.py) shows
    # the brute pair stage wins through at least 200k docs; the
    # bucketed form is the documented asymptotic path, test-pinned.
    "knn_brute_cosine",
    "knn_brute_cosine_vectorized",
    "text_quality_score",
    "text_lang_id",
    "word_freq_topk",
    "text_tfidf_topk",
    "text_repetition_stats",
    "text_char_bigram_logprob",
    "events_asof_join",
    "events_range_join_clicks",
    "events_sliding_distinct_kmv",
    "events_ohlc_hourly",
    "events_enriched_nation",
    "events_salted_join",
    "lineitem_bloom_semi_join",
    "lineitem_quality_report",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    # cross-doc member of the multimodal family: Arrow dHash + banded join
    "multimodal_phash_neardup",
    "multimodal_phash_clusters",
    "chunks_ordered_reassembly",
    "replication_audit",
    "order_value_percentiles",
    "lineitem_moments",
    "dataset_split_counts",
    "dataset_stratified_sample",
    "json_roundtrip",
    "events_salted_agg",
    "stream_hourly_tumbling",
    "stream_upsert_latest",
    "documents_pack_sequences",
    "documents_chunk_overlap",
    "split_decontamination",
    "events_moving_median",
    # round 4: previously checked-but-unbenched operators + the two
    # new curation operators
    "events_props_variant",
    "word_freq_cms_topk",
    "knn_lsh_multiprobe",
    "knn_ivf",
    # end-to-end deployment path: index build (bucketed write) +
    # bucket-pruned probe — the write dominates; the probe alone is
    # the exchange-free pruned scan the plan test pins
    "knn_ivf_indexed",
    "knn_ivf_filtered",
    "documents_pii_scrub",
    "documents_source_quota",
    "documents_lang_rebalance",
    "embedding_hard_negatives",
    "embeddings_ann_self_join",
    "embeddings_covariance_topk",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_anomaly_mad",
    "events_anomaly_mad_hist",
    "text_bpe_merges",
    "text_bpe_apply",
    "dedup_embedding_lsh_strict",
    "dedup_semdedup",
    "documents_duplicate_spans",
    "documents_winnowing_pairs",
    "embeddings_cluster_balanced_sample",
    "graph_pagerank",
    "documents_boilerplate_ngrams",
    "part_fuzzy_name_match",
    "embeddings_quantize_int8",
    "knn_quantized_int8",
    "events_transition_matrix",
    "events_gap_fill",
    "lineitem_profile",
    "sales_pivot_by_status",
    "dataset_weighted_sample",
    "documents_tfidf_similarity",
    "events_scd2_intervals",
    "customer_rfm_segments",
    "lineitem_checksum",
    "lineitem_ols",
    "orders_frequent_part_pairs",
    "orders_association_rules",
    "events_rate_cusum",
    "sales_mom_growth",
    "documents_curriculum_deciles",
    "documents_source_classifier",
    "documents_dsir_weights",
    # exact-recall set-similarity join: the priciest line by design —
    # this corpus's pairwise-similarity mass sits just under tau, so
    # ~1.2M candidates need exact verification (bitmap popcounts);
    # the measured optimization ladder is in the plan's docstring
    "dedup_jaccard_prefix_join",
    "graph_triangle_count",
    "part_price_skyline",
    "lineitem_weighted_median",
    "documents_source_entropy",
    "documents_top_phrase",
    "lineitem_zorder_buckets",
    "events_time_weighted_avg",
    "lineitem_winsorized_stats",
    "lineitem_chi2_flag_status",
    "orders_ks_statistic",
    "customer_spend_gini",
    "stream_session_windows",
    "stream_pattern_browse_buy",
    "stream_sliding_rate",
    "sales_seasonal_decomposition",
    "word_freq_zipf_slope",
    "anonymize_join_preservation",
    "orders_snapshot_diff",
    "orders_psi_value_drift",
    "graph_bfs_levels",
    "graph_label_propagation",
    "graph_link_prediction",
    "events_error_run_alerts",
    "events_pattern_browse_buy",
    "events_top_paths",
    "lineitem_jackknife_mean_se",
    "lineitem_correlation_matrix",
    "events_lateness_audit",
    "dataset_shuffle_audit",
    "documents_interleave_audit",
    "sales_incremental_refresh",
    "supplier_abc_classification",
    "supplier_top_parts",
    "lineitem_measures_unpivot",
    "embeddings_pca_power",
    "knn_pq_adc",
    "knn_ivfpq_adc",
    "knn_opq_adc",
    "embeddings_matryoshka_audit",
    "word_pair_pmi",
    "part_similar_items",
    # asymmetric sibling of the prefix join: A-prefix x B-full
    # candidate stream makes it family-priced with the line above.
    # (its KMV sketch twin dedup_containment_kmv is bench-EXCLUDED:
    # on this saturating vocab the exact join dominates — regime
    # analysis in the sketch docstring, simhash-crossover precedent)
    "documents_containment_join",
    # r7: its banded MinHash sketch twin (the 100x-scale exit for the
    # B-full-postings candidate mass) and the bounded link-prediction
    # twin (the exact form's wedge join is Sigma deg^2 — no 40x point)
    "documents_containment_minhash",
    "graph_link_prediction_minhash",
    "documents_url_dedup",
    "documents_winnowing_top_pairs",
    "documents_duplicate_spans_summary",
    "split_decontamination_bloom",
    "documents_kn_perplexity",
    "documents_bm25_topk",
    "stream_url_dedup",
    "documents_remove_duplicate_spans",
    "documents_rrf_fusion",
    "documents_hybrid_rrf",
    "documents_kn_trigram_perplexity",
    "stream_dedup_minhash",
    "documents_tokenizer_fertility",
    "split_contamination_by_source",
    "dedup_survivors_quality",
    "documents_filter_cascade",
    "knn_recall_audit",
    "dedup_cross_source_matrix",
    "embeddings_drift_by_label",
    "stream_kmv_distinct_users",
    "documents_pack_efficiency",
    "dedup_minhash_indexed",
    "documents_temperature_mix",
    # r9 additions. dedup_recall_audit is bench-EXCLUDED: its truth
    # side is the deliberately-quadratic dedup_ngram_jaccard verifier
    # (same exclusion class as the other correctness oracles).
    "dedup_minhash_probe_delta",
    "documents_perplexity_buckets",
    "dedup_survivors_indexed",
    "documents_ngram_novelty",
    "stream_filter_cascade",
    "knn_mmr_rerank",
    "documents_gopher_rules",
    "embeddings_outlier_audit",
    # r9 continuation-session additions
    "documents_shard_rendezvous",
    "documents_vocab_drift",
    "documents_range_shard_plan",
    "orders_decile_migration",
    "stream_transition_matrix",
    "graph_kcore_peel",
    "documents_heaps_vocab_growth",
    "knn_ivf_nprobe_sweep",
    "embeddings_knn_graph_stats",
    "documents_langid_confusion",
    "embeddings_jl_projection_audit",
    "embeddings_cluster_topics",
    "lineitem_benford_audit",
    "dedup_minhash_j_spectrum",
    "orders_cohort_ltv",
    "supplier_hhi_concentration",
    # r10 additions
    "dedup_cross_source_indexed",
    "dedup_minhash_index_append",
    "documents_dedup_cost_report",
    "stream_gopher_rules",
    "embeddings_knn_graph_ivf",
    "embeddings_ivf_cell_stats",
    "knn_ivf_index_append",
    "graph_clustering_coefficient",
    "documents_cdc_dedup",
    "stream_ivf_assign",
    "events_markov_stationary",
    "orders_survival_km",
    "dedup_detector_agreement",
    "lineitem_rank_auc",
    "dedup_simhash_spectrum",
    "lineitem_spearman_corr",
    # r11 additions
    "dedup_minhash_index_compact",
    "stream_decontamination_bloom",
    "knn_ivf_index_compact",
    "events_change_points",
    "events_holt_forecast",
    "text_bigram_greedy_decode",
    "dedup_minhash_index_delete",
    "documents_token_mi",
    "stream_rate_cusum",
    "events_purchase_attribution",
    "events_bot_detection",
    # r12 additions — incl. the three headline composition pipelines
    # the r11 verdict flagged as unbenched (what an end-to-end user
    # actually runs)
    "pipeline_training_data_lsh",
    "dedup_clusters_lsh",
    "knn_lsh_bucketed",
    "knn_ivf_index_delete",
    "stream_minhash_index_append",
    "documents_chunk_fuzzy_dedup",
    "stream_ivf_index_append",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")

    # warm-up: JVM + codegen + parquet footer caches
    plans.QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    # warm-up: Python worker pool + Arrow serialization path. The
    # first Arrow-batched query in a session pays worker fork +
    # Arrow init (~2s measured at sf0.1); that belongs to session
    # startup, not to whichever mapInPandas query happens to run
    # first in bench order (r2 attributed it to
    # knn_brute_cosine_vectorized, reading as a bogus 4x regression).
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").collect()
    # warm-up: micro-batch engine + state store init (~6 s measured
    # on the first streaming query of a session); the stream_* bench
    # lines should carry their per-query cost, not engine bring-up.
    plans.QUERIES["stream_dedup_keys"](spark, sf_dir).collect()

    # Best-of-2 per query: this host shows ~15% hypervisor CPU steal
    # (/proc/stat), which lands as random multi-second stalls on
    # whichever highly-parallel stage is running when the host
    # contends — single runs made different queries look 2-4x slower
    # on different bench invocations. The min of two runs measures
    # the engine, not the neighbor; both runs execute the full plan
    # (no caching between them beyond the session's parquet footers,
    # which every run after the warm-ups shares anyway).
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = plans.QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
            # queries that persist() intermediates (the prefix join)
            # must not hand their cache to the next run — best-of-2
            # measures the engine, not the cache
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": "headline_queries_total_time",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    # The JSON line must be the absolute LAST stdout of the process: a
    # bounded tail capture of this process's output has to contain the
    # whole (growing, ~7 KB) line. Stop the session first so any JVM
    # shutdown chatter lands BEFORE it, flush both streams around it,
    # and print nothing after. A shutdown error must never discard the
    # finished run's output (review catch).
    try:
        spark.stop()
    except Exception:
        pass
    sys.stderr.flush()
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
