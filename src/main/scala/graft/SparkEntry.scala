package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query bodies live in [[Queries]]; DuckDB oracle SQL in [[Oracles]]. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * D4 whitelist violations over the stg_territory staging model — the
    * reference's flagship post-transform check (pager-workflow.py:205-221),
    * with NATION_20..24 deliberately outside the whitelist so violations
    * surface (mirrors test-pager-action.py:186). */
  def entry(spark: SparkSession): DataFrame =
    Queries.d4WhitelistViolations(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_count" -> (Queries.d1Count _),
    "d2_null_keys" -> (Queries.d2NullKeys _),
    "d3_distinct" -> (Queries.d3Distinct _),
    "d4_whitelist_violations" -> (Queries.d4WhitelistViolations _),
    "r1_region_whitelist" -> (Queries.r1RegionWhitelist _),
    "r2_nonempty" -> (Queries.r2NonEmpty _),
    "r3_schema_compliance" -> (Queries.r3SchemaCompliance _),
    "r4_business_rule" -> (Queries.r4BusinessRule _),
    "t1_stg_territory" -> (Queries.t1StgTerritory _),
    "t2_stg_salesperson" -> (Queries.t2StgSalesperson _),
    "t3_mart_sales" -> (Queries.t3MartSales _),
    "g1_row_counts" -> (Queries.g1RowCounts _),
    "g2_not_null" -> (Queries.g2NotNull _),
    "g3_in_set" -> (Queries.g3InSet _),
    "g4_not_in_set" -> (Queries.g4NotInSet _),
    "g5_between" -> (Queries.g5Between _),
    "g6_schema_columns" -> (Queries.g6SchemaColumns _),
    "g7_unique" -> (Queries.g7Unique _),
    "g8_compound_unique" -> (Queries.g8CompoundUnique _),
    "g9_regex" -> (Queries.g9Regex _),
    "g10_type_cast" -> (Queries.g10TypeCast _),
    "g11_agg_bounds" -> (Queries.g11AggBounds _),
    "g12_pair_greater" -> (Queries.g12PairGreater _),
    "g13_g15_profile" -> (Queries.g13G15Profile _),
    "g16_declarative_suite" -> (Queries.g16DeclarativeSuite _),
    "v1_raw_gate" -> (Queries.v1RawGate _),
    "v2_suite_summary" -> (Queries.v2SuiteSummary _),
    "v5_drift_check" -> (Queries.v5DriftCheck _),
    "v6_checkpoint_run" -> (Queries.v6CheckpointRun _),
    "p5_etl_diamond" -> (Queries.p5EtlDiamond _),
    "x1_exact_dedup" -> (Queries.x1ExactDedup _),
    "x1_incremental_dedup" -> (Queries.x1IncrementalDedup _),
    "x1_bloom_dedup" -> (Queries.x1BloomDedup _),
    "x17_soft_dedup" -> (Queries.x17SoftDedup _),
    "x1_jaccard_pairs" -> (Queries.x1JaccardPairs _),
    "x1_minhash_pairs" -> (Queries.x1MinhashPairs _),
    "x1_minhash_planted" -> (Queries.x1MinhashPlanted _),
    "x1_simhash_pairs" -> (Queries.x1SimhashPairs _),
    "x1_simhash_planted" -> (Queries.x1SimhashPlanted _),
    "x1_dedup_groups" -> (Queries.x1DedupGroups _),
    "x1_span_dedup" -> (Queries.x1SpanDedup _),
    "x1_substring_dedup" -> (Queries.x1SubstringDedup _),
    "x1_embed_neardup" -> (Queries.x1EmbedNearDup _),
    "x2_topk_cosine" -> (Queries.x2TopkCosine _),
    "x2_ann_topk" -> (Queries.x2AnnTopk _),
    "x2_ivf_topk" -> (Queries.x2IvfTopk _),
    "x2_quant_topk" -> (Queries.x2QuantTopk _),
    "x2_semdedup" -> (Queries.x2SemDedup _),
    "x3_top_tokens" -> (Queries.x3TopTokens _),
    "x3_quality_by_lang" -> (Queries.x3QualityByLang _),
    "x3_fingerprints" -> (Queries.x3Fingerprints _),
    "x3_token_counts" -> (Queries.x3TokenCounts _),
    "x3_lang_confusion" -> (Queries.x3LangConfusion _),
    "x3_repetition" -> (Queries.x3Repetition _),
    "x3_gopher_rules" -> (Queries.x3GopherRules _),
    "x13_quality_bands" -> (Queries.x13QualityBands _),
    "x14_url_stage" -> (Queries.x14UrlStage _),
    "x4_zscore_flags" -> (Queries.x4ZscoreFlags _),
    "s1_windowed_checks" -> (Queries.s1WindowedChecks _),
    "s2_stream_dedup" -> (Queries.s2StreamDedup _),
    "s3_stream_neardup" -> (Queries.s3StreamNeardup _),
    "s3_planted_neardup" -> (Queries.s3PlantedNeardup _),
    "s4_stream_simhash" -> (Queries.s4StreamSimhash _),
    "s4_planted_simhash" -> (Queries.s4PlantedSimhash _),
    "x5_media_integrity" -> (Queries.x5MediaIntegrity _),
    "x5_media_features" -> (Queries.x5MediaFeatures _),
    "x5_frame_sample" -> (Queries.x5FrameSample _),
    "x5_header_parse" -> (Queries.x5HeaderParse _),
    "x6_stratified_sample" -> (Queries.x6StratifiedSample _),
    "x6_splits" -> (Queries.x6Splits _),
    "x6_sample_then_split" -> (Queries.x6SampleThenSplit _),
    "x7_pii_scan" -> (Queries.x7PiiScan _),
    "x8_contamination" -> (Queries.x8Contamination _),
    "x9_pack_sequences" -> (Queries.x9PackSequences _),
    "x9_pack_padded" -> (Queries.x9PackPadded _),
    "x10_curation_funnel" -> (Queries.x10CurationFunnel _),
    "x10_funnel_by_source" -> (Queries.x10FunnelBySource _),
    "x11_skew_profile" -> (Queries.x11SkewProfile _),
    "x11_salted_join" -> (Queries.x11SaltedJoin _),
    "x12_token_mix" -> (Queries.x12TokenMix _),
    "x12_training_order" -> (Queries.x12TrainingOrder _),
    "x12_temperature_mix" -> (Queries.x12TemperatureMix _),
    "x12_weighted_mix" -> (Queries.x12WeightedMix _),
    "x10_soft_funnel" -> (Queries.x10SoftFunnel _),
    "x5_png_decode" -> (Queries.x5PngDecode _),
    "x18_sessionize" -> (Queries.x18Sessionize _),
    "x19_text_clean" -> (Queries.x19TextClean _),
    "x20_psi_drift" -> (Queries.x20PsiDrift _),
    "x10_clean_funnel" -> (Queries.x10CleanFunnel _),
    "s5_stream_sessions" -> (Queries.s5StreamSessions _),
    "x21_asof_join" -> (Queries.x21AsofJoin _),
    "x22_range_join" -> (Queries.x22RangeJoin _),
    "x23_chunk_docs" -> (Queries.x23ChunkDocs _),
    "x24_tfidf_terms" -> (Queries.x24TfidfTerms _),
    "x15_lm_ppl" -> (Queries.x15LmPpl _),
    "x16_dsir_weights" -> (Queries.x16DsirWeights _),
    "x16_dsir_select" -> (Queries.x16DsirSelect _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.sql
}
