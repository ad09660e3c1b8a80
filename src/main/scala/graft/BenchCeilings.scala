package graft

/** Per-query wall-clock CEILINGS for [[BenchGate]] (seconds, sf0.1,
  * min-of-3 compared against them).
  *
  * Seeded from BENCHDETAIL_r12 min-of-12 (the steadiest per-query
  * number the session produced: four identical-code 3-pass runs) as
  * `min * 1.8 + 0.3` — 1.8x covers the measured per-query noise band
  * (worst observed identical-code swing 1.44x on a streaming monitor,
  * most queries well inside 1.3x) plus 0.3 s absolute slack so
  * 0.1-s-class queries don't flag on scheduler jitter; a real plan
  * regression (interpreted-lambda fallback, fused countDistinct,
  * lost broadcast) measures 2x-14x and clears the band.
  *
  * a22/x34/x35 landed late in round 12 with fewer passes, and
  * s19/s20 are new in round 13 — those five are seeded from a
  * dedicated 12-pass BenchOne run at sf0.1 (round 13), same formula.
  *
  * Maintenance contract (BenchGateSpec enforces the name sets): every
  * benchQueries entry MUST have a ceiling — seed new queries from a
  * measured min; retire entries with their queries. Re-seed a ceiling
  * only from a measured min on an unchanged-or-faster plan, never to
  * absorb an unexplained slowdown.
  *
  * RATCHET-DOWN (round 14): ceilings must track the engine's actual
  * speed, not its round-12 snapshot. Every gate run records per-query
  * min-of-3 in bench_gate.json; once per round run
  * `python3 tools/reseed_ceilings.py --apply bench_gate.json
  * BENCHDETAIL_r*.json` — it merges mins across the given artifacts
  * and LOWERS (never raises) any ceiling whose merged min dropped
  * >= 20% below the min the current ceiling implies, using the same
  * `min * 1.8 + 0.3` formula. A raise is always a deliberate manual
  * edit after a plan read.
  */
object BenchCeilings {
  val ceilings: Map[String, Double] = Map(
    "a10_sketch_union_shards" -> 0.81,  // reseed: min 0.284
    "a11_kanon" -> 2.32,
    "a12_zscore" -> 0.92,
    "a13_heavy_hitters" -> 0.84,
    "a14_psi_drift" -> 1.09,
    "a15_winsorize" -> 0.94,
    "a16_bootstrap_ci" -> 2.5,
    "a17_ess" -> 0.65,
    "a18_median_ci" -> 5.85,
    "a19_embedding_drift" -> 4.32,
    "a1_conditional_agg" -> 0.68,
    "a20_ks_drift" -> 1.19,
    "a21_mannwhitney" -> 1.77,
    "a2_distinct_agg" -> 1.8,
    "a3_percentiles" -> 2.35,
    "a4_rollup" -> 0.81,
    "a5_cube" -> 0.97,
    "a6_sketches" -> 2.83,
    "a7_grouping_sets" -> 0.93,
    "a8_histogram" -> 0.69,
    "a9_mode" -> 0.97,
    "c1_rank_fractional" -> 1.28,
    "c2_spearman_pairs" -> 6.27,
    "c5_corr_pipeline" -> 4.62,
    "d1_dim_build" -> 0.86,
    "d3_merge_upsert" -> 0.7,
    "d5_latest_snapshot" -> 0.86,
    "d6_scd2_history" -> 1.3,
    "d7_snapshot_diff" -> 0.8,
    "d8_cdc_apply" -> 1.09,
    "d9_fk_check" -> 1.68,
    "f1_semijoin_filter" -> 0.97,
    "f4_filter_agg" -> 0.68,
    "j1_star_join" -> 1.92,
    "j2_semi_join" -> 0.9,
    "j3_broadcast_lookup" -> 1.12,
    "j5_pair_selfjoin" -> 0.62,
    "j6_spearman_exact" -> 1.92,
    "j7_anti_join" -> 0.82,
    "j8_skew_join" -> 1.61,
    "o1_topk" -> 0.57,
    "o2_setops" -> 1.32,
    "p10_fingerprint" -> 0.6,
    "p11_multimodal_stub" -> 0.58,
    "p12_embedding_dup" -> 1.64,
    "p13_ivf_topk" -> 5.9,
    "p14_frame_sample" -> 0.69,
    "p15_resize" -> 0.65,
    "p16_stream_dedup" -> 2.96,
    "p17_hash_sample" -> 0.88,
    "p18_normalized_dedup" -> 1.25,
    "p19_tfidf_topterms" -> 2.81,
    "p1_dedup_exact" -> 0.73,
    "p20_chunking" -> 0.69,
    "p21_sequence_packing" -> 0.95,
    "p22_dup_components" -> 3.18,
    "p23_blocked_neardup" -> 2.59,
    "p24_quantize_int8" -> 0.78,
    "p25_lsh_topk_banded" -> 5.5,
    "p26_decontaminate" -> 1.21,
    "p27_repetition" -> 0.93,
    "p28_pii_redact" -> 0.74,
    "p29_token_budget" -> 0.87,
    "p30_curation_funnel" -> 5.63,
    "p31_split_assign" -> 0.5,
    "p32_reshard" -> 0.64,
    "p33_boilerplate" -> 1.98,
    "p34_unicode_dedup" -> 1.02,
    "p35_profile" -> 1.36,
    "p36_substring_dedup" -> 2.04,
    "p37_expectations" -> 0.92,
    "p38_incremental_minhash" -> 5.15,
    "p39_weighted_sample" -> 0.83,
    "p3_minhash_lsh" -> 3.14,
    "p40_bloom_decontaminate" -> 1.56,
    "p41_declarative_funnel" -> 5.81,
    "p42_ivf_incremental" -> 5.66,
    "p43_linear_quality" -> 0.91,
    "p44_semantic_dedup" -> 5.21,
    "p45_quality_buckets" -> 1.52,
    "p46_dedup_best" -> 2.13,
    "p47_vocab_encode" -> 2.59,
    "p48_mixture_calibrate" -> 1.02,
    "p49_bpe_train" -> 3.12,
    "p4_simhash" -> 3.49,
    "p50_bpe_encode" -> 5.27,
    "p51_unigram_lm" -> 2.39,
    "p52_tokenizer_compare" -> 5.62,
    "p53_unigram_em2" -> 1.73,
    "p54_perplexity_filter" -> 3.82,
    "p55_domain_cap" -> 1.62,
    "p56_bm25_topk" -> 2.73,
    "p57_lr_quality" -> 2.54,
    "p58_dsir_select" -> 1.49,
    "p59_hard_negatives" -> 6.25,
    "p5_cosine_topk" -> 2.45,
    "p60_signal_bundle" -> 4.07,
    "p61_hard_negatives_exact" -> 2.38,
    "p62_lr_hashed" -> 4.19,
    "p63_pq_encode" -> 3.12,
    "p64_ivfpq_topk" -> 12.96,
    "p65_l2_topk" -> 2.34,
    "p66_ivfpq_residual" -> 12.98,
    "p67_pq_incremental" -> 3.17,
    "p68_image_decode" -> 1.21,
    "p69_audio_decode" -> 1.42,
    "p6_lsh_topk" -> 2.25,
    "p70_lr_features" -> 2.4,
    "p71_cluster_stats" -> 4.05,
    "p72_classifier_auc" -> 2.89,
    "p73_calibration" -> 2.48,
    "p74_rrf_selection" -> 2.56,
    "p75_auc_bootstrap" -> 5.84,
    "p76_crossval_auc" -> 3.83,
    "p77_agreement_kappa" -> 6.81,
    "p78_tokenizer_fertility" -> 5.1,
    "p79_split_leakage" -> 3.73,
    "p7_langid" -> 1.3,
    "p80_video_decode" -> 2.13,
    "p81_split_by_component" -> 6.65,
    "p82_vocab_rebalance" -> 7.49,
    "p83_retrieval_eval" -> 7.71,
    "p84_paragraph_dedup" -> 3.4,
    "p85_mcnemar" -> 6.65,
    "p86_dedup_eval" -> 12.84,
    "p87_pagerank" -> 4.38,
    "p88_fleiss_kappa" -> 7.22,
    "p89_subgroup_audit" -> 2.58,
    "p8_quality" -> 1.33,
    "p90_mjpeg_decode" -> 2.09,
    "p9_token_count" -> 0.64,
    "r1_unpivot_agg" -> 2.48,
    "r2_pivot" -> 0.91,
    "s10_jsonl_source" -> 0.92,
    "s11_orc_source" -> 0.7,
    "s12_csv_source" -> 0.82,
    "s13_partitioned_source" -> 0.76,
    "s14_xml_source" -> 1.57,
    "s15_corrupt_tolerant_source" -> 0.69,
    "s16_sorted_layout" -> 1.07,
    "s17_schema_evolution" -> 0.77,
    "s18_corrupt_parquet_source" -> 0.79,
    "x10_stream_static_join" -> 3.02,
    "x11_sliding_agg" -> 0.82,
    "x12_session_window" -> 1.31,
    "x13_stream_sliding" -> 2.62,
    "x14_stream_session_window" -> 3.37,
    "x15_funnel" -> 1.35,
    "x16_retention" -> 1.35,
    "x17_asof_variants" -> 1.49,
    "x18_asof_exec" -> 1.06,
    "x19_incremental_agg" -> 0.95,
    "x1_window_running" -> 1.0,
    "x20_stream_latest" -> 2.77,
    "x21_funnel_windowed" -> 1.45,
    "x22_stream_psi" -> 6.7,
    "x23_stream_expectations" -> 1.49,
    "x24_stream_uniqueness" -> 3.66,
    "x25_stream_vocab_drift" -> 10.29,
    "x26_stream_quality_score" -> 5.69,
    "x27_stream_dsir" -> 3.74,
    "x28_stream_rebalance" -> 4.77,
    "x29_stream_pq_encode" -> 5.51,
    "x2_hourly_agg" -> 0.81,
    "x30_stream_ann_serve" -> 11.7,
    "x31_stream_kappa" -> 11.87,
    "x32_stream_ks" -> 6.14,
    "x33_stream_parity" -> 8.5,
    "x3_sessionize" -> 1.23,
    "x4_json_extract" -> 1.23,
    "x5_asof_join" -> 1.17,
    "x6_interval_join" -> 1.1,
    "x7_stream_hourly" -> 2.72,
    "x8_stream_sessionize" -> 3.63,
    // round-13 equal-pass reseeds (12-pass BenchOne at sf0.1; min in comment)
    "a22_tvd_drift" -> 1.00,             // min-of-12: 0.39
    "x34_stream_tvd" -> 5.99,            // min-of-12: 3.16
    "x35_stream_curation" -> 4.82,       // min-of-12: 2.51
    "s19_lake_delete_where" -> 0.93,     // min-of-12: 0.35
    "s20_lake_schema_evolution" -> 0.73, // min-of-12: 0.24
    "s21_lake_pruned_read" -> 0.82,  // reseed: min 0.287
    // round 14, 12-pass BenchOne seeds (same formula)
    "s22_lake_null_stats_read" -> 0.75,  // min-of-12: 0.25
    "s23_lake_incremental_dedup" -> 0.61 // min-of-12: 0.17 (staging cached after pass 1)
  )
}
