package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a DataFrame
  * program over the testdata dir; `oracleSql` carries the DuckDB-dialect
  * equivalent for the driver's hash-compare. Column aliases match on both
  * sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation: 3-way join (two broadcastable dims) + hash agg —
    * exercises the pipeline a user of the reference would care about most.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("revenue"),
        count(lit(1)).as("items"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_project"        -> CoreQueries.q01 _,
    "q02_trunc_cast"     -> CoreQueries.q02 _,
    "q03_intdiv_ts"      -> CoreQueries.q03 _,
    "q04_filter"         -> CoreQueries.q04 _,
    "q05_agg"            -> CoreQueries.q05 _,
    "q06_distinct"       -> CoreQueries.q06 _,
    "q07_join_broadcast" -> CoreQueries.q07 _,
    "q08_join_topk"      -> CoreQueries.q08 _,
    "q09_left_join"      -> CoreQueries.q09 _,
    "q10_anti_join"      -> CoreQueries.q10 _,
    "q11_rollup"         -> CoreQueries.q11 _,
    "q12_window_rank"    -> CoreQueries.q12 _,
    "q13_window_frame"   -> CoreQueries.q13 _,
    "q14_intersect"      -> CoreQueries.q14 _,
    "q15_time_bucket"    -> CoreQueries.q15 _,
    "q16_dedup_distinct" -> CoreQueries.q16 _,
    "q17_text_stats"     -> CoreQueries.q17 _,
    "q18_wordcount"      -> CoreQueries.q18 _,
    "q19_cosine_topk"    -> CoreQueries.q19 _,
    "q20_flow_pipeline"  -> PipelineQueries.q20 _,
    "q21_cube"           -> CoreQueries.q21 _,
    "q22_union_except"   -> CoreQueries.q22 _,
    "q23_approx_distinct" -> CoreQueries.q23 _,
    "q24_json_extract"   -> CoreQueries.q24 _,
    "q25_asof_join"      -> CoreQueries.q25 _,
    "q26_range_join"     -> CoreQueries.q26 _,
    "q27_percentiles"    -> CoreQueries.q27 _,
    "q28_group_topk"     -> CoreQueries.q28 _,
    "q29_sliding_bucket" -> CoreQueries.q29 _,
    "q30_skew_join"      -> CoreQueries.q30 _,
    "q31_bucketed_join"  -> BucketedQueries.q31 _,
    "q32_session_window" -> CoreQueries.q32 _,
    "q33_approx_pct"     -> CoreQueries.q33 _,
    "q34_sketch_union"   -> CoreQueries.q34 _,
    "q35_pivot"          -> CoreQueries.q35 _,
    "q36_unpivot"        -> CoreQueries.q36 _,
    "q37_grouping_sets"  -> CoreQueries.q37 _,
    "q38_resample"       -> CoreQueries.q38 _,
    "q39_full_outer"     -> CoreQueries.q39 _,
    "q40_sql_surface"    -> SqlSurfaceQueries.q40 _,
    "q41_window_analytics" -> CoreQueries.q41 _,
    "q42_funnel"         -> CoreQueries.q42 _,
    "q43_range_window"   -> CoreQueries.q43 _,
    "q44_stats"          -> CoreQueries.q44 _,
    "q45_histogram"      -> CoreQueries.q45 _,
    "q46_outliers"       -> CoreQueries.q46 _,
    "q47_zorder"         -> CoreQueries.q47 _,
    "q48_merge_upsert"   -> CoreQueries.q48 _,
    "q49_profile"        -> CoreQueries.q49 _,
    "q50_retention"      -> CoreQueries.q50 _,
    "q51_sessionize"     -> CoreQueries.q51 _,
    "q52_sketch_intersect" -> CoreQueries.q52 _,
    "q53_growth"         -> CoreQueries.q53 _,
    "q54_bloom_join"     -> CoreQueries.q54 _,
    "q55_quantile_bins"  -> CoreQueries.q55 _,
    "q56_skew_profile"   -> CoreQueries.q56 _,
    "q57_table_checksum" -> CoreQueries.q57 _,
    "q58_ship_priority"  -> CoreQueries.q58 _,
    "q59_asof_join"      -> CoreQueries.q59 _,
    "q61_interval_join"  -> CoreQueries.q61 _,
    "q62_regression"     -> CoreQueries.q62 _,
    "q60_range_join"     -> CoreQueries.q60 _,
    "q63_scd2"           -> CoreQueries.q63 _,
    "q64_rolling_anomaly" -> CoreQueries.q64 _,
    "q65_gap_audit"      -> CoreQueries.q65 _,
    "q66_transitions"    -> CoreQueries.q66 _,
    "q67_snapshot_diff"  -> CoreQueries.q67 _,
    "q68_interval_coverage" -> CoreQueries.q68 _,
    "q69_mad_outliers"   -> CoreQueries.q69 _,
    "q70_pop_movers"     -> CoreQueries.q70 _,
    "q71_ewma"           -> CoreQueries.q71 _,
    "q72_incr_agg"       -> CoreQueries.q72 _,
    "q73_rolling_wau"    -> CoreQueries.q73 _,
    "q74_pareto"         -> CoreQueries.q74 _,
    "q75_basket"         -> CoreQueries.q75 _,
    "q76_cohort_ltv"     -> CoreQueries.q76 _,
    "q77_chi2"           -> StatQueries.chi2 _,
    "q78_abtest"         -> StatQueries.abtest _,
    "q79_corr"           -> StatQueries.corr2 _,
    "q80_attribution"    -> CoreQueries.q80 _,
    "q81_window_funnel"  -> CoreQueries.q81 _,
    "q82_fill_rate"      -> CoreQueries.q82 _,
    "q83_ratio_report"   -> CoreQueries.q83 _,
    "q84_paths"          -> CoreQueries.q84 _,
    "q85_integrity"      -> CoreQueries.q85 _,
    "q86_winsorize"      -> CoreQueries.q86 _,
    "q87_clamped_balance" -> CoreQueries.q87 _,
    "q88_rolling_median" -> CoreQueries.q88 _,
    "q89_bounce"         -> CoreQueries.q89 _,
    "q90_rfm"            -> CoreQueries.q90 _,
    "q91_conversion_lag" -> CoreQueries.q91 _,
    "q92_twap"           -> CoreQueries.q92 _,
    "q93_seasonality"    -> CoreQueries.q93 _,
    "q94_user_entropy"   -> CoreQueries.q94 _,
    "q95_session_cohort" -> CoreQueries.q95 _,
    "q96_events_lifecycle" -> EventsBackbone.lifecycle _,
    "q97_compact_delta"  -> EventsBackbone.compactDeltaLifecycle _,
    "q98_skyline"        -> CoreQueries.q98 _,
    "q99_gini"           -> CoreQueries.q99 _,
    "q100_benford"       -> CoreQueries.q100 _,
    "q101_zonemap"       -> CoreQueries.q101 _,
    "q102_cusum"         -> CoreQueries.q102 _,
    "q103_theilsen"      -> CoreQueries.q103 _,
    "q104_expectations"  -> CoreQueries.q104 _,
    "q105_zone_append"   -> CoreQueries.q105 _,
    "q106_forecast"      -> CoreQueries.q106 _,
    "text_rake"          -> TextQueries.rake _,
    "text_bpe"           -> TextQueries.bpe _,
    "dedup_cluster_sizes" -> DedupQueries.clusterSizes _,
    "mix_cluster_weight" -> CurationQueries.mixClusterWeight _,
    "text_ttr"           -> TextQueries.ttr _,
    "graph_pagerank"     -> GraphQueries.pagerank _,
    "graph_degree"       -> GraphQueries.degree _,
    "graph_common"       -> GraphQueries.common _,
    "graph_triangles"    -> GraphQueries.triangles _,
    "graph_kcore"        -> GraphQueries.kcore _,
    "graph_lpa"          -> GraphQueries.lpa _,
    "link_parts"         -> LinkQueries.parts _,
    // --- training-data pipeline extensions ---
    "text_langid"        -> TextQueries.langid _,
    "text_quality"       -> TextQueries.quality _,
    "text_tokens"        -> TextQueries.tokens _,
    "text_fingerprint"   -> TextQueries.fingerprints _,
    "text_tfidf"         -> TextQueries.tfidf _,
    "text_bm25"          -> TextQueries.bm25 _,
    "text_vocab"         -> TextQueries.vocab _,
    "text_zipf"          -> TextQueries.zipf _,
    "text_token_ids"     -> TextQueries.tokenIds _,
    "text_heavy"         -> TextQueries.heavy _,
    "text_lm_score"      -> TextQueries.lmScore _,
    "text_bigram_lm"     -> TextQueries.bigramLm _,
    "text_repetition"    -> TextQueries.repetition _,
    "text_redact"        -> TextQueries.redactQ _,
    "text_quality_norm"  -> TextQueries.qualityNorm _,
    "text_rolling_fp"    -> TextQueries.rollingFp _,
    "text_pmi"           -> TextQueries.pmi _,
    "text_oov"           -> TextQueries.oov _,
    "text_gopher"        -> TextQueries.gopher _,
    "text_novelty"       -> TextQueries.novelty _,
    "chunk_docs"         -> TextQueries.chunks _,
    "dedup_exact"        -> DedupQueries.exact _,
    "dedup_minhash"      -> DedupQueries.minhash _,
    "dedup_spans"        -> DedupQueries.spans _,
    "dedup_memorize"     -> DedupQueries.memorize _,
    "dedup_minhash_est"  -> DedupQueries.minhashEstimate _,
    "dedup_jaccard"      -> DedupQueries.jaccard _,
    "dedup_setsim"       -> DedupQueries.setsim _,
    "dedup_containment"  -> DedupQueries.containment _,
    "dedup_simhash"      -> DedupQueries.simhash _,
    "dedup_snm"          -> DedupQueries.snm _,
    "dedup_simhash_pairs" -> DedupQueries.simhashPairs _,
    "dedup_editdist"     -> DedupQueries.editDistance _,
    "dedup_groups"       -> DedupQueries.groups _,
    "dedup_keep_best"    -> DedupQueries.keepBest _,
    "dedup_lines"        -> DedupQueries.lines _,
    "dedup_apply"        -> DedupQueries.applyDedup _,
    "dedup_decontam"     -> DedupQueries.decontam _,
    "dedup_incr"         -> DedupQueries.incremental _,
    "dedup_incr_staged"  -> DedupQueries.incrementalStaged _,
    "dedup_embed"        -> DedupQueries.embedNearDup _,
    "dedup_semantic"     -> DedupQueries.semantic _,
    "dedup_overlap"      -> DedupQueries.overlap _,
    "sim_lsh_topk"       -> SimilarityQueries.lshTopK _,
    "sim_lsh_staged"     -> SimilarityQueries.lshStagedTopK _,
    "sim_filter_topk"    -> SimilarityQueries.filteredTopK _,
    "sim_filter_ivf"     -> SimilarityQueries.filteredIvfTopK _,
    "sim_ivf_topk"       -> SimilarityQueries.ivfTopK _,
    "sim_ivf_staged"     -> SimilarityQueries.ivfStagedTopK _,
    "sim_ivf_trained"    -> SimilarityQueries.ivfTrainedTopK _,
    "sim_quant_topk"     -> SimilarityQueries.quantTopK _,
    "sim_pq_topk"        -> SimilarityQueries.pqTopK _,
    "sim_ivfpq_topk"     -> SimilarityQueries.ivfPqTopK _,
    "sim_ivfpq_staged"   -> SimilarityQueries.ivfPqStagedTopK _,
    "sim_rp_topk"        -> SimilarityQueries.rpTopK _,
    "sim_pool"           -> SimilarityQueries.poolMatrix _,
    "sim_maxsim"         -> SimilarityQueries.maxSim _,
    "sim_dim_profile"    -> SimilarityQueries.dimProfile _,
    "sim_centroid_assign" -> SimilarityQueries.centroidAssign _,
    "sim_batch_topk"     -> SimilarityQueries.batchTopK _,
    "sim_batch_staged"   -> SimilarityQueries.batchStagedTopK _,
    "sim_recall"         -> SimilarityQueries.recallLsh _,
    "sim_recall_ivf"     -> SimilarityQueries.recallIvf _,
    "sim_recall_batch"   -> SimilarityQueries.recallBatch _,
    "sim_recall_filter"  -> SimilarityQueries.recallFilter _,
    "sim_recall_filter_ivf" -> SimilarityQueries.recallFilterIvf _,
    "sim_lsh_multi"      -> SimilarityQueries.lshMultiTopK _,
    "sim_recall_multi"   -> SimilarityQueries.recallMulti _,
    "search_hybrid"      -> RetrievalQueries.hybrid _,
    "search_mmr"         -> RetrievalQueries.mmr _,
    "search_lexical_staged" -> RetrievalQueries.lexicalStaged _,
    "mm_meta"            -> MultimodalQueries.meta _,
    "mm_features"        -> MultimodalQueries.features _,
    "mm_frames"          -> MultimodalQueries.frames _,
    "mm_dedup"           -> MultimodalQueries.dedup _,
    "curate_corpus"      -> CurationQueries.curate _,
    "curate_docs"        -> CurationQueries.curatedDocs _,
    "curate_budget"      -> CurationQueries.curateBudget _,
    "curate_classifier"  -> CurationQueries.classifier _,
    "curate_eval"        -> CurationQueries.evalGate _,
    "mix_sample"         -> CurationQueries.mixSample _,
    "mix_split"          -> CurationQueries.mixSplit _,
    "mix_weighted"       -> CurationQueries.mixWeighted _,
    "mix_temperature"    -> CurationQueries.mixTemperature _,
    "curate_kl"          -> CurationQueries.curateKl _,
    "mix_curriculum"     -> CurationQueries.mixCurriculum _,
    "mix_dsir"           -> CurationQueries.mixDsir _,
    "mix_reservoir"      -> CurationQueries.mixReservoir _,
    "mix_kcenter"        -> CurationQueries.kcenter _,
    "mix_group_split"    -> CurationQueries.groupSplit _,
    "mix_epochs"         -> CurationQueries.mixEpochs _,
    "curate_drift"       -> CurationQueries.drift _,
    "pipeline_dump"      -> CurationQueries.pipelineDump _,
    "pipeline_tokens"    -> CurationQueries.pipelineTokens _,
    "pack_shards"        -> CurationQueries.packShards _,
    "pack_seqs"          -> CurationQueries.packSeqs _,
    "stream_sessions"    -> StreamGateQueries.sessions _,
    "stream_twap"        -> StreamGateQueries.twap _,
    "stream_wau"         -> StreamGateQueries.wau _,
    "stream_anomaly"     -> StreamGateQueries.anomaly _,
    "stream_heavy"       -> StreamGateQueries.heavy _,
    "stream_expectations" -> StreamGateQueries.expectations _
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys get a weaker rows-only check.
    *
    * The similarity oracles render data-scaled code widths, keyed by the
    * TARGET DIR (`Verify` passes the dir it just ran the queries against);
    * the no-arg form renders the floor widths — what any driver-scale
    * corpus resolves to.
    */
  def oracleSqlFor(dir: String): Map[String, String] =
    Oracles.core ++ PipelineQueries.oracle ++ TextQueries.oracle ++ StatQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle(dir) ++ MultimodalQueries.oracle ++
      CurationQueries.oracle ++ BucketedQueries.oracle ++ SqlSurfaceQueries.oracle ++
      RetrievalQueries.oracle ++ GraphQueries.oracle ++ LinkQueries.oracle ++
      StreamGateQueries.oracle

  def oracleSql: Map[String, String] = oracleSqlFor("")
}
