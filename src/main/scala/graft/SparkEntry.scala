package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtQueries, GeoQueries, IoQueries, Oracles, RefQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (names carry
  * the op number) plus the ext training-data operators to a DataFrame query
  * over the driver's parquet tables; `oracleSql` holds the DuckDB-equivalent
  * SQL for each SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.tpch1(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // headline analytics
    "q_tpch1" -> RefQueries.tpch1,
    "q_tpch3" -> RefQueries.tpch3,
    "q_tpch5" -> RefQueries.tpch5,
    "q_tpch6" -> RefQueries.tpch6,
    "q_tpch18" -> RefQueries.tpch18,
    // §2.1 scans / semi-structured
    "q02_json_flatten" -> RefQueries.q02JsonFlatten,
    "q03_scan_prune" -> RefQueries.q03ScanPrune,
    // §2.2 incremental
    "q09_checksum" -> RefQueries.q09Checksum,
    "q11_cache_diff" -> RefQueries.q11CacheDiff,
    "q12_cache_retain" -> RefQueries.q12CacheRetain,
    "q13_work_limit" -> RefQueries.q13WorkLimit,
    "q14_cache_merge" -> RefQueries.q14CacheMerge,
    "q15_backfill_sample" -> RefQueries.q15Backfill,
    // §2.3 scalar canonicalisation
    "q16_zeropad" -> RefQueries.q16Zeropad,
    "q17_enum_bool" -> RefQueries.q17EnumBool,
    "q18_parse_iso" -> RefQueries.q18ParseIso,
    "q19_expiry" -> RefQueries.q19Expiry,
    "q20_duration" -> RefQueries.q20Duration,
    "q21_dirty_time" -> RefQueries.q21DirtyTime,
    "q22_guarded_parse" -> RefQueries.q22GuardedParse,
    "q23_combine_datetime" -> RefQueries.q23Combine,
    "q24_rollover" -> RefQueries.q24Rollover,
    "q25_prefix_coalesce" -> RefQueries.q25PrefixCoalesce,
    "q26_rename_project" -> RefQueries.q26RenameProject,
    "q27_nulldrop" -> RefQueries.q27NullDrop,
    // §2.4 joins
    "q28_lookup_join" -> RefQueries.q28LookupJoin,
    "q29_keep_last" -> RefQueries.q29KeepLast,
    "q30_cdc_antijoin" -> RefQueries.q30CdcAntijoin,
    "q31_sent_registry" -> RefQueries.q31SentRegistry,
    "q32_map_lookup" -> RefQueries.q32MapLookup,
    "q35_fuzzy_match" -> RefQueries.q35FuzzyMatch,
    // §2.5 aggregations
    "q36_global_min" -> RefQueries.q36GlobalMin,
    "q37_group_collect" -> RefQueries.q37GroupCollect,
    "q39_null_scan" -> RefQueries.q39NullScan,
    "q40_uniques" -> RefQueries.q40Uniques,
    // §2.6 sorts / limits / sampling
    "q41_sort_desc" -> RefQueries.q41SortDesc,
    "q43_sample" -> RefQueries.q43Sample,
    // §2.7 serving layer
    "q44_serve_current" -> RefQueries.q44ServeCurrent,
    "q45_serve_7days" -> RefQueries.q45Serve7Days,
    "q46_versioned_projection" -> RefQueries.q46Versioned,
    "q47_bok_fanout" -> RefQueries.q47BokFanout,
    "q59_image_filename" -> RefQueries.q59ImageFilename,
    "q48_predicate_string" -> RefQueries.q48PredicateString,
    "q49_array_filter" -> RefQueries.q49ArrayFilter,
    "q50_service_area" -> RefQueries.q50ServiceArea,
    "q51_doc_render" -> RefQueries.q51DocRender,
    "q51b_html_render" -> RefQueries.q51HtmlRender,
    "q52_hashing" -> RefQueries.q52Hashing,
    // §2.8 enrichment stages (stub services, real mapPartitions plumbing)
    "q53_llm_draft" -> RefQueries.q53LlmDraft,
    "q54_toot" -> RefQueries.q54Toot,
    // §2.9 change stream (batch form; streaming form under graft.streaming)
    "q61_change_stream" -> RefQueries.q61ChangeStream,
    // io/serve operators as write-then-read-back + shape-repair surfaces
    "q55_shape_repair" -> IoQueries.q55ShapeRepair,
    "q05_versioned_store" -> IoQueries.q05VersionedStore,
    "q06_json_doc_sink" -> IoQueries.q06JsonDocSink,
    "q62_versioned_fanout" -> IoQueries.q62VersionedFanout,
    // EP-2 end-to-end composition (Ops 16-27 → 28 → 29 → 44-46)
    "q_ep2_pipeline" -> RefQueries.qEp2Pipeline,
    // EP-3 end-to-end composition (Ops 9/11/13 → 53/54 → 56-58 → 33+37 →
    // 59 → 12/14; the Augmenter chain)
    "q_ep3_pipeline" -> GeoQueries.qEp3Pipeline,
    // §2.4/§2.5/§2.8 geospatial (box-SQL oracles; exact geometry semantics
    // additionally locked by GeoSpec)
    "g33_overlay_join" -> GeoQueries.g33Overlay,
    "g34_spatial_semijoin" -> GeoQueries.g34SemiJoin,
    "g38_union_agg" -> GeoQueries.g38UnionAgg,
    "g56_geocode_cascade" -> GeoQueries.g56GeocodeCascade,
    "g63_grid_join" -> GeoQueries.g63GridJoin,
    "g_diff_erode" -> GeoQueries.gDiffErode,
    // ext: text analysis
    "x_tokens" -> ExtQueries.xTokens,
    "x_quality" -> ExtQueries.xQuality,
    "x_langid" -> ExtQueries.xLangId,
    "x_fingerprint" -> ExtQueries.xFingerprint,
    "x_nfc_norm" -> ExtQueries.xNfcNorm,
    "x_winnow" -> ExtQueries.xWinnow,
    "x_bpe_encode" -> ExtQueries.xBpeEncode,
    "x_bpe_pack" -> ExtQueries.xBpePack,
    "x_cdc_chunks" -> ExtQueries.xCdcChunks,
    "x_url_canon" -> ExtQueries.xUrlCanon,
    "x_weighted_bernoulli" -> ExtQueries.xWeightedBernoulli,
    "x_bpe_fertility" -> ExtQueries.xBpeFertility,
    // ext: dedup
    "x_dedup_exact" -> ExtQueries.xDedupExact,
    "x_dedup_minhash" -> ExtQueries.xDedupMinhash,
    "x_dedup_jaccard" -> ExtQueries.xDedupJaccard,
    "x_setsim_join" -> ExtQueries.xSetsimJoin,
    "x_setsim_rs" -> ExtQueries.xSetsimRs,
    "x_chunks" -> ExtQueries.xChunks,
    "x_rrf" -> ExtQueries.xRrf,
    "x_contain_join" -> ExtQueries.xContainJoin,
    "x_cluster_split" -> ExtQueries.xClusterSplit,
    "x_incr_dedup" -> ExtQueries.xIncrDedup,
    "x_decay" -> ExtQueries.xDecay,
    "x_hist_quantile" -> ExtQueries.xHistQuantile,
    "x_trend" -> ExtQueries.xTrend,
    "x_covisit" -> ExtQueries.xCovisit,
    "x_pagerank" -> ExtQueries.xPagerank,
    "x_triangles" -> ExtQueries.xTriangles,
    "x_clustering_coef" -> ExtQueries.xClusteringCoef,
    "x_label_prop" -> ExtQueries.xLabelProp,
    "x_concomp" -> ExtQueries.xConcomp,
    "x_concomp_exact" -> ExtQueries.xConcompExact,
    "x_random_walk" -> ExtQueries.xRandomWalk,
    "x_kcore" -> ExtQueries.xKcore,
    "x_auc" -> ExtQueries.xAuc,
    "x_pr_auc" -> ExtQueries.xPrAuc,
    "x_brier" -> ExtQueries.xBrier,
    "x_auc_stratum" -> ExtQueries.xAucStratum,
    "x_confusion" -> ExtQueries.xConfusion,
    "x_calibration" -> ExtQueries.xCalibration,
    "x_mm_ahash" -> ExtQueries.xMmAhash,
    "x_mm_scenes" -> ExtQueries.xMmScenes,
    "x_minhash_recall" -> ExtQueries.xMinhashRecall,
    "x_sorted_nbr" -> ExtQueries.xSortedNbr,
    "x_blocking_recall" -> ExtQueries.xBlockingRecall,
    "x_char_entropy" -> ExtQueries.xCharEntropy,
    "x_pii_luhn" -> ExtQueries.xPiiLuhn,
    "x_profile" -> ExtQueries.xProfile,
    "x_dq_check" -> ExtQueries.xDqCheck,
    "x_dedup_clusters" -> ExtQueries.xDedupClusters,
    "x_dedup_simhash" -> ExtQueries.xDedupSimhash,
    "x_simhash_pairs" -> ExtQueries.xSimhashPairs,
    // ext: embedding similarity
    "x_embed_topk" -> ExtQueries.xEmbedTopk,
    "x_embed_norm" -> ExtQueries.xEmbedNorm,
    "x_rp_project" -> ExtQueries.xRpProject,
    "x_embed_cov" -> ExtQueries.xEmbedCov,
    "x_pca_project" -> ExtQueries.xPcaProject,
    "x_pca_invariants" -> ExtQueries.xPcaInvariants,
    "x_mad_outlier" -> ExtQueries.xMadOutlier,
    "x_embed_neardup" -> ExtQueries.xEmbedNeardup,
    "x_embed_decontam" -> ExtQueries.xEmbedDecontam,
    "x_ann_filtered" -> ExtQueries.xAnnFiltered,
    "x_ann_lsh" -> ExtQueries.xAnnLsh,
    "x_ann_ivf" -> ExtQueries.xAnnIvf,
    "x_ann_recall" -> ExtQueries.xAnnRecall,
    "x_ann_ivf_batch" -> ExtQueries.xAnnIvfBatch,
    "x_ann_lsh_batch" -> ExtQueries.xAnnLshBatch,
    "x_ann_lsh_recall" -> ExtQueries.xAnnLshRecall,
    // ext: multimodal plumbing
    "x_mm_decode" -> ExtQueries.xMmDecode,
    "x_mm_decode_stage" -> ExtQueries.xMmDecodeStage,
    "x_mm_frames" -> ExtQueries.xMmFrames,
    "x_mm_resize" -> ExtQueries.xMmResize,
    "x_mm_features" -> ExtQueries.xMmFeatures,
    // ext: skew + fuzzy + composed pipeline
    "x_skew_join" -> ExtQueries.xSkewJoin,
    "x_range_join" -> ExtQueries.xRangeJoin,
    "x_interval_join" -> ExtQueries.xIntervalJoin,
    "x_fuzzy_join" -> ExtQueries.xFuzzyJoin,
    "x_pipeline" -> ExtQueries.xPipeline,
    // ext: SCD2 dimension history + layout + retrieval/collocation
    "x_scd2_history" -> ExtQueries.xScd2History,
    "x_scd2_merge" -> ExtQueries.xScd2Merge,
    "x_scd2_snapshot" -> ExtQueries.xScd2Snapshot,
    "x_bm25" -> ExtQueries.xBm25,
    "x_pmi" -> ExtQueries.xPmi,
    "x_skipgram" -> ExtQueries.xSkipgram,
    "x_cooc" -> ExtQueries.xCooc,
    "x_neg_sample" -> ExtQueries.xNegSample,
    "x_kmv_distinct" -> ExtQueries.xKmvDistinct,
    "x_zorder" -> ExtQueries.xZorder,
    "x_anomaly" -> ExtQueries.xAnomaly,
    "x_agg_merge" -> ExtQueries.xAggMerge,
    "x_bool_and" -> ExtQueries.xBoolAnd,
    "x_phrase" -> ExtQueries.xPhrase,
    "x_trending" -> ExtQueries.xTrending,
    "x_resample" -> ExtQueries.xResample,
    "x_funnel" -> ExtQueries.xFunnel,
    "x_retention" -> ExtQueries.xRetention,
    "x_transition" -> ExtQueries.xTransition,
    "x_sessionize" -> ExtQueries.xSessionize,
    "x_rolling" -> ExtQueries.xRolling,
    "x_rollup" -> ExtQueries.xRollup,
    "x_pivot" -> ExtQueries.xPivot,
    // ext: event-time windows
    "x_win_tumble" -> ExtQueries.xWinTumble,
    "x_win_slide" -> ExtQueries.xWinSlide,
    "x_win_session" -> ExtQueries.xWinSession,
    // ext: as-of join + corpus curation
    "x_asof_join" -> ExtQueries.xAsofJoin,
    "x_asof_exec" -> ExtQueries.xAsofExec,
    "x_asof_rewrite" -> ExtQueries.xAsofRewrite,
    "x_asof_nearest" -> ExtQueries.xAsofNearest,
    "x_quality_gopher" -> ExtQueries.xQualityGopher,
    "x_top_token" -> ExtQueries.xTopToken,
    "x_pii_scrub" -> ExtQueries.xPiiScrub,
    "x_boilerplate" -> ExtQueries.xBoilerplate,
    "x_strat_sample" -> ExtQueries.xStratSample,
    "x_group_stats" -> ExtQueries.xGroupStats,
    "x_source_gate" -> ExtQueries.xSourceGate,
    "x_weighted_sample" -> ExtQueries.xWeightedSample,
    "x_weighted_stratum" -> ExtQueries.xWeightedStratum,
    "x_html_extract" -> ExtQueries.xHtmlExtract,
    "x_ivfpq_append" -> ExtQueries.xIvfPqAppend,
    "x_curation_pipeline" -> ExtQueries.xCurationPipeline,
    "x_contamination" -> ExtQueries.xContamination,
    "x_pack_sequences" -> ExtQueries.xPackSequences,
    "x_count_min" -> ExtQueries.xCountMin,
    "x_tfidf" -> ExtQueries.xTfidf,
    "x_distinct" -> ExtQueries.xDistinct,
    // ext: repetition / rebalancing / pruning
    "x_chunk_dedup" -> ExtQueries.xChunkDedup,
    "x_substr_dedup" -> ExtQueries.xSubstrDedup,
    "x_repetition" -> ExtQueries.xRepetition,
    "x_bloom_prune" -> ExtQueries.xBloomPrune,
    "x_rebalance" -> ExtQueries.xRebalance,
    "x_tok_hist" -> ExtQueries.xTokHist,
    "x_semdedup" -> ExtQueries.xSemDedup,
    "x_semdedup_auto" -> ExtQueries.xSemDedupAuto,
    // ext: LM-based quality scoring
    "x_lm_score" -> ExtQueries.xLmScore,
    "x_bigram_lm" -> ExtQueries.xBigramLm,
    "x_lin_classify" -> ExtQueries.xLinClassify,
    "x_nb_classify" -> ExtQueries.xNbClassify,
    "x_logreg" -> ExtQueries.xLogreg,
    "x_jw_resolve" -> ExtQueries.xJwResolve,
    "x_snapshot_diff" -> ExtQueries.xSnapshotDiff,
    "x_winsorize" -> ExtQueries.xWinsorize,
    "x_dsir" -> ExtQueries.xDsir,
    // ext: product quantization
    "x_pq_topk" -> ExtQueries.xPqTopk,
    "x_pq_recall" -> ExtQueries.xPqRecall,
    "x_code_dedup" -> ExtQueries.xCodeDedup,
    "x_ivfpq" -> ExtQueries.xIvfPq,
    "x_ivfpq_res" -> ExtQueries.xIvfPqRes,
    "x_ivfpq_res_recall" -> ExtQueries.xIvfPqResRecall,
    "x_ivfpq_batch" -> ExtQueries.xIvfPqBatch,
    "x_ivfpq_stored" -> ExtQueries.xIvfPqStored,
    "x_ivfpq_stored_batch" -> ExtQueries.xIvfPqStoredBatch,
    "x_ivfpq_serve" -> ExtQueries.xIvfPqServe,
    "x_ivfpq_serve_batch" -> ExtQueries.xIvfPqServeBatch,
    "x_fuzzy_qgram" -> ExtQueries.xFuzzyQgram,
    // ext: mixture sampling + composed CCNet bucketing
    "x_temp_sample" -> ExtQueries.xTempSample,
    "x_ccnet_buckets" -> ExtQueries.xCcnetBuckets,
    "x_ccnet_approx" -> ExtQueries.xCcnetApprox,
    // ext: split + shuffled export
    "x_split" -> ExtQueries.xSplit,
    "x_shuffle_export" -> ExtQueries.xShuffleExport,
    // ext: drift monitoring
    "x_psi_drift" -> ExtQueries.xPsiDrift,
    "x_ks_drift" -> ExtQueries.xKsDrift,
    "x_js_div" -> ExtQueries.xJsDivergence
  )

  /** DuckDB equivalents — every query in `queries` has one. */
  def oracleSql: Map[String, String] = Oracles.all

  /** The heavier queries Bench runs (scans, shuffles, joins, the dedup
    * pipelines, similarity search, windows). The benched near-dup paths are
    * the scalable ones (banded SRP-LSH pairs, IVF top-k); the O(n²)
    * brute-force baseline is deliberately NOT benched — it exists to
    * validate LSH/IVF recall at small n, not as a headline plan. */
  val benchNames: Seq[String] = Seq(
    "q_tpch1", "q_tpch3", "q_tpch5", "q_tpch6", "q_tpch18",
    "q20_duration", "q28_lookup_join",
    "q29_keep_last", "q37_group_collect", "x_dedup_exact", "x_dedup_minhash",
    "x_dedup_jaccard", "x_dedup_simhash", "x_embed_topk", "x_ann_lsh",
    "x_ann_ivf", "x_win_tumble", "x_win_session", "x_fingerprint",
    "g63_grid_join", "q51b_html_render", "x_pipeline",
    "x_asof_join", "x_asof_exec", "x_asof_rewrite", "x_boilerplate",
    "x_contamination",
    "x_pack_sequences",
    "x_tfidf", "x_count_min", "q_ep2_pipeline", "q_ep3_pipeline", "g_diff_erode",
    "x_chunk_dedup", "x_substr_dedup", "x_repetition", "x_bloom_prune", "x_semdedup",
    "x_lm_score", "x_dsir", "x_pq_topk", "x_ccnet_buckets", "x_ccnet_approx",
    "x_ivfpq", "x_ivfpq_res", "x_ivfpq_batch", "x_ivfpq_stored",
    "x_ivfpq_stored_batch", "x_ivfpq_serve", "x_ivfpq_serve_batch",
    "x_fuzzy_join", "x_fuzzy_qgram", "x_range_join", "x_source_gate",
    "x_interval_join", "x_html_extract", "x_embed_decontam",
    "x_ivfpq_append", "x_curation_pipeline", "x_ann_filtered",
    "x_scd2_merge", "x_bm25", "x_pmi", "x_zorder",
    "x_sessionize", "x_rolling", "x_rollup", "x_pivot", "x_anomaly",
    "x_funnel", "x_retention", "x_transition", "x_agg_merge",
    "x_bool_and", "x_resample", "x_trending", "x_asof_nearest",
    "x_setsim_join", "x_phrase", "x_incr_dedup", "x_decay", "x_covisit",
    "x_hist_quantile", "x_trend", "x_setsim_rs", "x_chunks", "x_rrf",
    "x_contain_join", "x_cluster_split", "x_pagerank", "x_bigram_lm",
    "x_lin_classify", "x_nb_classify", "x_logreg", "x_jw_resolve",
    "x_snapshot_diff", "x_winsorize",
    "x_embed_norm", "x_rp_project", "x_mad_outlier",
    "x_embed_cov", "x_triangles", "x_char_entropy", "x_pii_luhn",
    "x_profile", "x_dq_check", "x_label_prop", "x_auc", "x_confusion",
    "x_calibration", "x_mm_ahash", "x_minhash_recall", "x_kcore",
    "x_auc_stratum", "x_clustering_coef", "x_sorted_nbr",
    "x_blocking_recall", "x_concomp", "x_concomp_exact", "x_random_walk",
    "x_ks_drift", "x_js_div", "x_pca_invariants", "x_skipgram", "x_cooc",
    "x_neg_sample", "x_pr_auc", "x_brier", "x_kmv_distinct",
    "x_mm_scenes", "x_nfc_norm", "x_bpe_encode", "x_bpe_pack",
    "x_cdc_chunks", "x_url_canon", "x_weighted_bernoulli",
    "x_bpe_fertility")
}
