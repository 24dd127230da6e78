package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  import graft.queries._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_filter_project" -> (Relational.q2FilterProject _),
    "q3_join"           -> (Relational.q3Join _),
    "q4_brand_revenue"  -> (Relational.q4BrandRevenue _),
    "q5_multi_join"     -> (Relational.q5MultiJoin _),
    "q6_window"         -> (Relational.q6Window _),
    "q7_topk"           -> (Relational.q7TopK _),
    "q8_setops"         -> (Relational.q8SetOps _),
    "q9_distinct"       -> (Relational.q9Distinct _),
    "q10_rollup"        -> (Relational.q10Rollup _),
    "q11_semi_anti"     -> (Relational.q11SemiAnti _),
    "q12_scalar"        -> (Relational.q12Scalar _),
    "q13_having"        -> (Relational.q13Having _),
    "q14_subquery"      -> (Relational.q14Subquery _),
    "q16_pivot"         -> (Relational.q16Pivot _),
    "q17_udaf"          -> (Extras.udafAvg _),
    "q18_array_agg"     -> (Extras.arrayAgg _),
    "q19_like_in"       -> (Extras.likeIn _),
    "q22_cube"          -> (Extras.cube2 _),
    "q23_percentile"    -> (Extras.percentiles _),
    "q20_in_subquery"   -> (Extras.inSubquery _),
    "q21_date_arith"    -> (Extras.dateArith _),
    "x_custom_exprs"    -> (CustomExprs.customExprs _),
    "x_avro_roundtrip"  -> (Serde.avroRoundtrip _),
    "x_json_roundtrip"  -> (Serde.jsonRoundtrip _),
    "t_text_stats"      -> (LlmOps.textStats _),
    "t_quality"         -> (LlmOps.textQuality _),
    "t_langid"          -> (LlmOps.textLangId _),
    "t_token_freq"      -> (LlmOps.tokenFreq _),
    "t_corpus_filter"   -> (LlmOps.corpusFilter _),
    "d_exact"           -> (LlmOps.dedupExact _),
    "d_ngram_jaccard"   -> (LlmOps.dedupNgramJaccard _),
    "d_minhash_lsh"     -> (LlmOps.dedupMinhashLsh _),
    "d_simhash"         -> (LlmOps.dedupSimhash _),
    "s_ann_brute"       -> (LlmOps.annBruteForce _),
    "s_ann_pairs"       -> (LlmOps.annTopPairs _),
    "s_ann_lsh"         -> (LlmOps.annLsh _),
    "s_ann_ivf"         -> (LlmOps.annIvf _),
    "mm_decode"         -> (LlmOps.mmDecode _),
    "ev_hourly"         -> (Events.hourly _),
    "ev_json_props"     -> (Events.jsonProps _),
    "x_jsonschema_parse" -> (Events.jsonSchemaProps _),
    "ev_sessions"       -> (Events.sessions _),
    "st_hourly_stream"  -> ((s, d) => graft.streaming.Streaming.hourlyWindowed(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"            -> Relational.q1Sql,
    "q2_filter_project" -> Relational.q2Sql,
    "q3_join"           -> Relational.q3Sql,
    "q4_brand_revenue"  -> Relational.q4Sql,
    "q5_multi_join"     -> Relational.q5Sql,
    "q6_window"         -> Relational.q6Sql,
    "q7_topk"           -> Relational.q7Sql,
    "q8_setops"         -> Relational.q8Sql,
    "q9_distinct"       -> Relational.q9Sql,
    "q10_rollup"        -> Relational.q10Sql,
    "q11_semi_anti"     -> Relational.q11Sql,
    "q12_scalar"        -> Relational.q12Sql,
    "q13_having"        -> Relational.q13Sql,
    "q14_subquery"      -> Relational.q14Sql,
    "q16_pivot"         -> Relational.q16Sql,
    "q17_udaf"          -> Extras.udafAvgSql,
    "q18_array_agg"     -> Extras.arrayAggSql,
    "q19_like_in"       -> Extras.likeInSql,
    "q22_cube"          -> Extras.cube2Sql,
    "q23_percentile"    -> Extras.percentilesSql,
    "q20_in_subquery"   -> Extras.inSubquerySql,
    "q21_date_arith"    -> Extras.dateArithSql,
    "x_custom_exprs"    -> CustomExprs.customExprsSql,
    "x_avro_roundtrip"  -> Serde.avroRoundtripSql,
    "x_json_roundtrip"  -> Serde.jsonRoundtripSql,
    "t_text_stats"      -> LlmOps.textStatsSql,
    "t_quality"         -> LlmOps.textQualitySql,
    "t_langid"          -> LlmOps.textLangIdSql,
    "t_token_freq"      -> LlmOps.tokenFreqSql,
    "t_corpus_filter"   -> LlmOps.corpusFilterSql,
    "d_exact"           -> LlmOps.dedupExactSql,
    "d_ngram_jaccard"   -> LlmOps.dedupNgramJaccardSql,
    "d_minhash_lsh"     -> LlmOps.dedupMinhashLshSql,
    "s_ann_brute"       -> LlmOps.annBruteForceSql,
    "s_ann_pairs"       -> LlmOps.annTopPairsSql,
    "mm_decode"         -> LlmOps.mmDecodeSql,
    // d_simhash, s_ann_lsh: no SQL oracle (custom hash / probabilistic
    // recall) → driver rows-only check; spec-verified against exact paths
    "ev_hourly"         -> Events.hourlySql,
    "ev_json_props"     -> Events.jsonPropsSql,
    "x_jsonschema_parse" -> Events.jsonSchemaPropsSql,
    "ev_sessions"       -> Events.sessionsSql,
    "st_hourly_stream"  -> graft.streaming.Streaming.hourlyWindowedSql,
  )
}
