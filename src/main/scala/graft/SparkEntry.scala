package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (and the LLM-pipeline extension surface,
  * SURVEY §7.4) is exposed as a named query; every SQL-expressible one has
  * a DuckDB oracle in [[oracleSql]] whose column names AND types match the
  * Spark output exactly (doubles that must hash-match are computed through
  * exact decimal arithmetic on both engines — see [[operators.Exact]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full star join + broadcast + exact aggregation path.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.broadcastStar(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.4). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── relational battery (SURVEY §7.3 step 5) ──────────────────────
    "q01_agg_pricing" -> (Relational.aggPricing(_, _)),
    "q02_filter_project" -> (Relational.filterProject(_, _)),
    "q03_join_topk" -> (Relational.joinTopK(_, _)),
    "q04_broadcast_star" -> (Relational.broadcastStar(_, _)),
    "q05_semi_join" -> (Relational.semiJoin(_, _)),
    "q06_anti_join" -> (Relational.antiJoin(_, _)),
    "q07_distinct" -> (Relational.distinctPairs(_, _)),
    "q08_sort_limit" -> (Relational.sortLimit(_, _)),
    "q09_window_rank" -> (Relational.windowRank(_, _)),
    "q10_window_running" -> (Relational.windowRunning(_, _)),
    "q11_union" -> (Relational.unionKeys(_, _)),
    "q12_intersect" -> (Relational.intersectKeys(_, _)),
    "q13_except" -> (Relational.exceptKeys(_, _)),
    "q14_rollup" -> (Relational.rollupCounts(_, _)),
    "q15_scalar_funcs" -> (Relational.scalarFuncs(_, _)),
    "q16_having" -> (Relational.havingCount(_, _)),
    "q17_in_subquery" -> (Relational.inSubquery(_, _)),
    "q18_scalar_subquery" -> (Relational.scalarSubquery(_, _)),
    "q19_conditional_agg" -> (Relational.conditionalAgg(_, _)),
    "q20_pivot_events" -> (Relational.pivotEvents(_, _)),
    "q21_json_extract" -> (Relational.jsonExtract(_, _)),
    "q22_monthly_revenue" -> (Relational.monthlyRevenue(_, _)),
    "q27_event_windows" -> (Relational.eventWindows(_, _)),
    "q28_cube" -> (Relational.cubeCounts(_, _)),
    "q29_sessionize" -> ((s, d) => Relational.sessionize(s, d)),
    "q43_typed_agg" -> (TypedOps.typedAgg(_, _)),
    // ── reference pipeline semantics: upsert / evolution / streaming ─
    "q23_upsert_latest" -> (UpsertOps.upsertLatest(_, _)),
    "q24_upsert_merge" -> (UpsertOps.upsertMerge(_, _)),
    "q25_schema_evolution" -> (UpsertOps.schemaEvolution(_, _)),
    "q26_stream_upsert" -> (UpsertOps.streamUpsert(_, _)),
    // ── LLM-data-pipeline surface (SURVEY §7.4) ──────────────────────
    "q30_dedup_exact" -> (Dedup.exact(_, _)),
    "q31_dedup_ngram" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q32_dedup_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q33_dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "q34_embed_dedup" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "q35_text_stats" -> (TextAnalysis.stats(_, _)),
    "q36_text_quality" -> (TextAnalysis.quality(_, _)),
    "q37_text_langid" -> (TextAnalysis.langId(_, _)),
    "q38_text_fingerprint" -> (TextAnalysis.fingerprints(_, _)),
    "q39_ann_brute" -> ((s, d) => Similarity.annBrute(s, d)),
    "q40_ann_lsh" -> ((s, d) => graft.table.SketchedTable.annLshIndexed(s, d)),
    "q44_ann_ivf" -> ((s, d) => graft.table.SketchedTable.annIvfIndexed(s, d)),
    "q41_knn_join" -> ((s, d) => Similarity.knnJoin(s, d)),
    "q42_mm_meta" -> (Multimodal.metaQuery(_, _)),
    "q45_salted_join" -> (Skew.saltedRevenue(_, _)),
    "q46_bm25" -> ((s, d) => Search.bm25(s, d)),
    "q47_asof_join" -> (Temporal.clickAsofPurchase(_, _)),
    "q48_range_join" -> ((s, d) => Temporal.errorNeighborhood(s, d)),
    "q49_profile" -> (Profile.eventsProfile(_, _)),
    "q50_quantiles" -> (Profile.orderPriceQuartiles(_, _)),
    "q51_dedup_clusters" -> ((s, d) => Dedup.nearDupClusters(s, d)),
    "q52_dataset_split" -> (Curation.datasetSplit(_, _)),
    "q53_contamination" -> ((s, d) => Curation.crossSplitContamination(s, d)),
    "q54_range_window" -> (Relational.windowRangeHour(_, _)),
    "q55_incremental_read" -> (UpsertOps.incrementalRead(_, _)),
    "q56_pii_redact" -> (Curation.piiRedact(_, _)),
    "q57_repetition" -> (TextAnalysis.repetition(_, _)),
    "q58_vocabulary" -> ((s, d) => TextAnalysis.vocabulary(s, d)),
    "q59_stratified_sample" -> ((s, d) => Curation.stratifiedSample(s, d)),
    "q60_corpus_report" -> (Curation.corpusReport(_, _)),
    "q61_compacted_merge" -> (UpsertOps.compactedMerge(_, _)),
    "q62_catalog_sql" -> (UpsertOps.catalogSqlRead(_, _)),
    "q63_curated_corpus" -> ((s, d) => Curation.curatedCorpus(s, d)),
    "q64_funnel" -> (Relational.funnel(_, _)),
    "q65_bucketed_stats" -> (graft.table.BucketedTable.bucketedOrderStats(_, _)),
    "q66_top_quality" -> ((s, d) => TextAnalysis.topQualityDocs(s, d)),
    "q67_ann_pq" -> ((s, d) => graft.table.SketchedTable.annPqIndexed(s, d)),
    "q68_shared_spans" -> ((s, d) => Dedup.sharedSpans(s, d)),
    "q69_transitions" -> (Relational.eventTransitions(_, _)),
    "q70_freq_terms" -> ((s, d) => TextAnalysis.vocabularySketched(s, d)),
    "q71_stream_rollup" -> (UpsertOps.streamRollup(_, _)),
    "q72_delete_users" -> (UpsertOps.deleteUsers(_, _)),
    "q73_doc_chunks" -> ((s, d) => TextAnalysis.chunks(s, d)),
    "q74_domain_mix" -> ((s, d) => Curation.domainMix(s, d)),
    "q75_quality_gate" -> ((s, d) => Curation.qualityGate(s, d)),
    "q76_inverted_index" -> ((s, d) => Search.invertedIndex(s, d)),
    "q77_common_score" -> (TextAnalysis.commonness(_, _)),
    "q78_decontaminated" -> ((s, d) => Curation.decontaminatedTrain(s, d)),
    "q79_seq_packing" -> ((s, d) => Curation.sequencePacking(s, d)),
    "q80_token_ids" -> ((s, d) => TextAnalysis.tokenIds(s, d)),
    "q81_label_centroids" -> (Similarity.labelCentroids(_, _)),
    "q82_mor_latest" -> (UpsertOps.morLatest(_, _)),
    "q83_time_travel" -> (UpsertOps.timeTravel(_, _)),
    "q84_cooccurrence" -> ((s, d) => TextAnalysis.cooccurrence(s, d)),
    "q85_quality_deciles" -> ((s, d) => TextAnalysis.qualityDeciles(s, d)),
    "q86_group_sample" -> ((s, d) => Curation.groupSample(s, d)),
    "q87_oov_stats" -> ((s, d) => TextAnalysis.oovStats(s, d)),
    "q88_clustered_merge" -> (UpsertOps.clusteredMerge(_, _)),
    "q89_restored_merge" -> (UpsertOps.restoredMerge(_, _)),
    "q90_pruned_range" -> (UpsertOps.prunedRangeRead(_, _)),
    "q91_change_feed" -> (UpsertOps.changeFeed(_, _)),
    "q92_zorder_merge" -> (UpsertOps.zorderedMerge(_, _)),
    "q93_stream_attribution" -> (UpsertOps.streamIntervalJoin(_, _)),
    "q94_media_decode" -> (Multimodal.decodedFeatures(_, _)),
    "q95_gif_frames" -> (Multimodal.gifFrameFeatures(_, _)),
    "q96_para_dedup" -> (Dedup.paragraphDedup(_, _)),
    "q97_edit_dedup" -> (Dedup.editDistanceDedup(_, _)),
    "q98_similar_neighbors" -> ((s, d) => Similarity.similarNeighbors(s, d)),
    "q99_mp4_meta" -> (Multimodal.mp4Metadata(_, _)),
    "q100_shared_runs" -> ((s, d) => Dedup.sharedRuns(s, d)),
    "q101_stream_restart" -> (UpsertOps.streamRestart(_, _)),
    "q102_image_resize" -> ((s, d) => Multimodal.resizedImages(s, d)),
    "q103_embed_gram" -> ((s, d) => Similarity.embeddingGram(s, d)),
    "q104_dpp_revenue" -> ((s, d) => Relational.partitionPrunedRevenue(s, d)),
    "q105_upsert_bloom" -> (UpsertOps.upsertBloomMerge(_, _)),
    "q106_kmv_distinct" -> ((s, d) => Profile.distinctUsersSketch(s, d)),
    "q107_incr_view" -> (UpsertOps.incrementalViewMaintain(_, _)),
    "q108_audio_frames" -> ((s, d) => Multimodal.audioFrames(s, d)),
    "q109_negative_pairs" -> ((s, d) => Curation.negativePairs(s, d)),
    "q110_manifest_snapshot" -> (UpsertOps.manifestSnapshotRead(_, _)),
    "q111_daily_resample" -> ((s, d) => TimeSeries.dailyResample(s, d)),
    "q112_sessionize" -> ((s, d) => TimeSeries.sessionStats(s, d)),
    "q113_epoch_shards" -> ((s, d) => Curation.trainingShards(s, d)),
    "q114_write_audit_publish" -> (UpsertOps.writeAuditPublish(_, _)),
    "q115_stream_bloom" -> (UpsertOps.streamBloomUpsert(_, _)),
    "q116_partition_evolution" -> (UpsertOps.partitionEvolutionMerge(_, _)),
    "q117_stream_kmv" -> (UpsertOps.streamDistinctSketch(_, _)),
    "q118_stream_schema_drift" -> (UpsertOps.streamSchemaDrift(_, _)),
    "q119_concurrent_upsert" -> (UpsertOps.concurrentUpsert(_, _)),
    "q120_zorder_pruned" -> (UpsertOps.zorderPrunedRead(_, _)),
    "q121_incremental_dedup" -> ((s, d) => Dedup.incrementalMinhash(s, d)),
    "q122_quant_error" -> (Similarity.int8QuantStats(_, _)),
    "q123_stream_enrich" -> (UpsertOps.streamEnrich(_, _)),
    "q124_stream_dedup" -> (UpsertOps.streamDedup(_, _)),
    "q125_cdc_replica" -> (UpsertOps.cdcReplica(_, _)),
    "q126_rollback_debris" -> (UpsertOps.rollbackDebris(_, _)),
    "q127_bpe_pairs" -> ((s, d) => TextAnalysis.bpePairs(s, d)),
    "q128_mv_rewrite" -> (table.MaterializedView.mvRewriteRevenue(_, _)),
    "q129_image_phash" -> (Multimodal.imagePhash(_, _)),
    "q130_phash_near" -> (Multimodal.phashNearDup(_, _)),
    "q131_mv_keyed" -> (table.MaterializedView.mvKeyedRefresh(_, _)),
    "q132_mv_avg" -> (table.MaterializedView.mvAvgDocLen(_, _)),
    "q133_mv_stream" -> (UpsertOps.mvStreamMaintain(_, _)),
    "q134_mv_select" -> (table.MaterializedView.mvSelectCheapest(_, _)),
    "q135_mv_minmax" -> (table.MaterializedView.mvKeyedMinMax(_, _)),
    "q136_mv_join" -> (table.MaterializedView.mvJoinRevenue(_, _)),
    "q137_mv_time" -> (table.MaterializedView.mvMonthlyRevenue(_, _)),
    "q138_mv_advisor" -> (table.MaterializedView.mvAdvisorRevenue(_, _)),
    "q139_mv_hybrid" -> (table.MaterializedView.mvHybridServe(_, _)),
    "q140_mv_rollup" -> (table.MaterializedView.mvRollupServe(_, _)),
    "q141_mv_advisor_star" -> (table.MaterializedView.mvAdvisorStar(_, _)),
    "q142_mv_keyed_hybrid" -> (table.MaterializedView.mvKeyedHybridServe(_, _)),
    "q143_mv_rollup_1phase" -> (table.MaterializedView.mvRollupSinglePhase(_, _)),
    "q144_mv_coarse_from_finer" -> (table.MaterializedView.mvCoarseFromFiner(_, _)),
    "q145_rli_lookup" -> (UpsertOps.rliPointLookup(_, _)),
    "q146_secondary_lookup" -> (UpsertOps.secondaryLookup(_, _)),
    "q147_plan_lookup" -> (UpsertOps.planLookupPushdown(_, _)),
    "q148_mv_star_1phase" -> (table.MaterializedView.mvStarSinglePhase(_, _)),
    "q149_stream_lookup_join" -> (UpsertOps.streamLookupJoin(_, _)),
    "q150_index_advisor" -> (UpsertOps.indexAdvisedLookup(_, _)),
    "q151_range_prune" -> (UpsertOps.rangePrunedQuery(_, _)),
    "q152_stats_agg" -> (UpsertOps.statsAggQuery(_, _)),
    "q153_stream_table_feed" -> (UpsertOps.streamTableFeed(_, _)),
    "q154_stats_group_agg" -> (UpsertOps.statsGroupAggQuery(_, _)),
    "q155_indexed_delete" -> (UpsertOps.indexedDelete(_, _)),
    "q156_layout_advisor" -> (UpsertOps.layoutAdvisedRange(_, _)),
    "q157_drop_partition" -> (UpsertOps.dropPartitionQuery(_, _)),
    "q158_ts_range_prune" -> (UpsertOps.tsRangePrunedQuery(_, _)),
    "q159_mor_range_prune" -> (UpsertOps.morRangePruned(_, _)),
    "q160_stream_si_join" -> (UpsertOps.streamSecondaryLookupJoin(_, _)),
    "q161_string_range_prune" -> (UpsertOps.stringRangePrunedQuery(_, _)),
    "q162_topk_prune" -> (UpsertOps.topKPrunedQuery(_, _)),
    "q163_null_prune" -> (UpsertOps.nullPrunedQuery(_, _)),
    "q164_join_prune" -> (UpsertOps.joinPrunedStar(_, _)),
    "q165_range_agg_hybrid" -> (UpsertOps.rangeAggHybrid(_, _)),
    "q166_compact_advisor" -> (UpsertOps.compactionAdvised(_, _)),
    "q167_inlist_prune" -> (UpsertOps.inListPrunedQuery(_, _)),
    "q168_range_agg_grouped" -> (UpsertOps.rangeAggGrouped(_, _)),
    "q169_topk_filtered" -> (UpsertOps.topKFilteredQuery(_, _)),
    "q170_mor_range_declarative" -> (UpsertOps.morRangeDeclarative(_, _)),
    "q171_inlist_agg_hybrid" -> (UpsertOps.inListAggHybrid(_, _)),
    "q172_join_prune_range" -> (UpsertOps.joinPrunedStarRange(_, _)),
    "q173_decimal_sum_stats" -> (UpsertOps.decimalSumStats(_, _)),
    "q174_topk_inlist" -> (UpsertOps.topKInListQuery(_, _)),
    "q175_topk_page" -> (UpsertOps.topKPageQuery(_, _)),
    "q176_mor_range_partitioned" -> (UpsertOps.morRangePartitioned(_, _)),
    "q177_group_topk" -> (UpsertOps.groupTopKQuery(_, _)),
    "q178_vacuum_partition" -> (UpsertOps.vacuumPartitionQuery(_, _)),
    "q179_stats_incremental" -> (UpsertOps.incrementalStatsQuery(_, _)),
    "q180_group_clustered_agg" -> (UpsertOps.groupByClusteredAgg(_, _)),
    "q181_distinct_partitions" -> (UpsertOps.distinctPartitionsQuery(_, _)),
    "q182_distinct_clustered" -> (UpsertOps.distinctClusteredQuery(_, _)),
    "q183_avg_stats" -> (UpsertOps.avgStatsQuery(_, _)),
    "q184_mor_live_count" -> (UpsertOps.morLiveCount(_, _)),
    "q185_rollup_advisor" -> (UpsertOps.rollupAdvised(_, _)),
    "q186_distinct_count" -> (UpsertOps.distinctCountQuery(_, _)),
    "q187_vacuum_advisor" -> (UpsertOps.vacuumAdvised(_, _)),
    "q188_mor_group_count" -> (UpsertOps.morGroupLiveCount(_, _)),
    "q189_avg_hybrid" -> (UpsertOps.rangeAvgHybrid(_, _)),
    "q190_distinct_count_clustered" -> (UpsertOps.distinctCountClustered(_, _)),
    "q191_mor_resolved_stats" -> (UpsertOps.morResolvedStats(_, _)),
    "q192_group_topk_clustered" -> (UpsertOps.groupTopKClustered(_, _)),
    "q193_stream_maintained" -> (UpsertOps.streamMaintainedReads(_, _)),
    "q194_distinct_filtered" -> (UpsertOps.distinctCountFiltered(_, _)),
    "q195_mor_group_stats" -> (UpsertOps.morGroupResolvedStats(_, _)),
    "q196_mor_filtered_stats" -> (UpsertOps.morFilteredResolvedStats(_, _)),
    "q197_cluster_split" -> ((s, d) => Curation.clusterAwareSplit(s, d)),
    "q198_mor_range_stats" -> (UpsertOps.morRangeResolvedStats(_, _)),
    "q199_mor_group_data" -> (UpsertOps.morGroupDataStats(_, _)),
    "q200_mor_distinct" -> (UpsertOps.morDistinctLangs(_, _)),
    "q201_mor_topk" -> (UpsertOps.morTopKResolved(_, _)),
    "q202_incremental_labels" ->
      ((s, d) => Dedup.incrementalClusterLabels(s, d)),
    "q203_mor_topk_part" -> (UpsertOps.morTopKPartitioned(_, _)),
    "q204_mor_distinct_filtered" ->
      (UpsertOps.morDistinctLangsFiltered(_, _)),
    "q205_mor_distinct_set" -> (UpsertOps.morDistinctLangSet(_, _)),
    "q206_mor_topk_lang" -> (UpsertOps.morTopKLangFiltered(_, _)),
    "q207_mor_group_topk" -> (UpsertOps.morGroupTopK(_, _)),
    "q208_mor_star_join" -> (UpsertOps.morStarCurrent(_, _)),
    "q209_group_topk_filtered" -> (UpsertOps.groupTopKFiltered(_, _)),
    "q210_mor_group_topk_filtered" ->
      (UpsertOps.morGroupTopKFiltered(_, _))
  )

  // Exact-decimal SQL fragments shared by several oracles (mirrors
  // operators.Exact — the same rational arithmetic, DuckDB syntax).
  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))"
  private val charge =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * ((CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4))))"
  private def dsum(c: String) =
    s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"
  private def davg(c: String) =
    s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / COUNT($c)"
  private val stopwordsAll =
    Seq("the", "of", "and", "to", "in", "le", "la", "les", "des", "et",
      "el", "los", "las", "una", "y", "der", "die", "das", "und", "ist")
      .map(w => s"'$w'").mkString("[", ", ", "]")
  private def wordOcc(words: String) =
    s"len(list_filter(string_split(text, ' '), x -> list_contains($words, x)))"
  // Distinct word 3-gram shingles per document (mirrors
  // TextFunctions.shingles + array_distinct: k consecutive tokens joined
  // by one space; docs shorter than 3 tokens yield the whole text).
  // connected components of the near-dup graph via a recursive CTE:
  // every doc's label = min doc_id reachable over pair edges (shared by
  // q51's full propagation and q202's incremental maintenance — the
  // incremental path must reproduce the full labels exactly)
  private lazy val clusterLabelsSql =
    s"""WITH RECURSIVE
       |sh AS ($shingleTable),
       |p AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS j
       |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) q
       |  WHERE j >= 0.5),
       |e AS (SELECT a_id AS src, b_id AS dst FROM p
       |      UNION ALL SELECT b_id, a_id FROM p),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id)
       |SELECT id AS doc_id, MIN(r) AS cluster_rep
       |FROM reach GROUP BY id""".stripMargin

  private val shingleTable =
    """SELECT doc_id,
      |  CASE WHEN len(toks) >= 3
      |       THEN list_distinct(list_transform(range(1, len(toks) - 1),
      |            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
      |       ELSE [text] END AS sh
      |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)""".stripMargin
  // Exact all-pairs shingle-jaccard — the ground truth the MinHash-banded
  // (q32) and SimHash-pigeonholed (q33) candidate generators must recall
  // completely at their calibrated thresholds.
  private def shingleJaccardSql(tau: Double) =
    s"""WITH sh AS ($shingleTable)
       |SELECT a_id, b_id, jaccard FROM (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) p
       |WHERE jaccard >= $tau""".stripMargin
  // Exact top-10 cosine neighbors of vec_id 0 — shared by the brute-force
  // (q39), LSH-filtered (q40), and IVF-probed (q44) ANN variants, whose
  // calibrated budgets make all three outputs identical.
  private val annTop10Sql =
    """SELECT vec_id, label FROM (
      |  SELECT e.vec_id, e.label,
      |         list_cosine_similarity(e.embedding, q.embedding) AS cos
      |  FROM embeddings e,
      |       (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      |  WHERE e.vec_id <> 0) t
      |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin

  // BM25-shaped relevance (rational idf — see operators.Search): every
  // arithmetic step mirrors the Spark expression exactly (same constants,
  // same association order, integer-derived corpus stats), so the score
  // doubles are bit-identical. DuckDB decimal literals are DECIMAL by
  // default — each constant is CAST to DOUBLE to match Scala's literals.
  private val bm25Sql: String = {
    val terms = Seq("the", "of", "and")
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS df$i"
    }.mkString(",\n              ")
    val termExprs = terms.zipWithIndex.map { case (t, i) =>
      val tf = s"CAST(len(list_filter(d.toks, x -> x = '$t')) AS DOUBLE)"
      s"(st.n - st.df$i + CAST(0.5 AS DOUBLE)) / (st.df$i + CAST(0.5 AS DOUBLE))" +
        s" * ($tf * (CAST(1.2 AS DOUBLE) + 1))" +
        s" / ($tf + CAST(1.2 AS DOUBLE) * ((1 - CAST(0.75 AS DOUBLE))" +
        s" + CAST(0.75 AS DOUBLE) * (CAST(d.dl AS DOUBLE) / st.avgdl)))"
    }.mkString("\n        + ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
       |                  len(string_split(text, ' ')) AS dl FROM documents),
       |st AS (SELECT COUNT(*) AS n,
       |              CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
       |              $dfCols
       |       FROM d)
       |SELECT doc_id, score FROM (
       |  SELECT d.doc_id,
       |        $termExprs AS score
       |  FROM d, st) t
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  private val latestPerUserType =
    """SELECT user_id, event_type, ts_us, event_id, value FROM (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  private val textQualitySql =
    s"""SELECT doc_id,
       |  CAST(${wordOcc(stopwordsAll)} AS INT) AS n_stopwords,
       |  CAST(${wordOcc(stopwordsAll)} AS DOUBLE) /
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
       |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS n_punct,
       |  (CASE WHEN CAST(len(string_split(text, ' ')) AS DOUBLE) >= 20.0 THEN 1.0
       |        ELSE CAST(len(string_split(text, ' ')) AS DOUBLE) / 20.0 END) * 0.5 +
       |  (CASE WHEN CAST(${wordOcc(stopwordsAll)} AS DOUBLE) /
       |             CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.1 THEN 1.0
       |        ELSE (CAST(${wordOcc(stopwordsAll)} AS DOUBLE) /
       |              CAST(len(string_split(text, ' ')) AS DOUBLE)) * 10.0 END) * 0.5
       |    AS quality
       |FROM documents""".stripMargin

  private val langIdSql = {
    val en = wordOcc("['the', 'of', 'and', 'to', 'in']")
    val fr = wordOcc("['le', 'la', 'les', 'des', 'et']")
    val es = wordOcc("['el', 'los', 'las', 'una', 'y']")
    val de = wordOcc("['der', 'die', 'das', 'und', 'ist']")
    s"""SELECT doc_id, lang,
       |  CASE WHEN $en = 0 AND $fr = 0 AND $es = 0 AND $de = 0 THEN 'unknown'
       |       WHEN $en >= $fr AND $en >= $es AND $en >= $de THEN 'en'
       |       WHEN $fr >= $es AND $fr >= $de THEN 'fr'
       |       WHEN $es >= $de THEN 'es'
       |       ELSE 'de' END AS lang_guess
       |FROM documents""".stripMargin
  }

  private val repetitionSql =
    """WITH g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 2
      |         THEN list_transform(range(1, len(toks)),
      |              i -> concat_ws(' ', toks[i], toks[i+1]))
      |         ELSE [text] END AS grams
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))
      |SELECT doc_id,
      |  CAST(len(grams) AS INT) AS n_bigrams,
      |  CAST(len(list_distinct(grams)) AS INT) AS n_unique,
      |  CASE WHEN len(grams) > 0
      |       THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) /
      |            CAST(len(grams) AS DOUBLE)
      |       ELSE 0.0 END AS rep_ratio
      |FROM g""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The sketch-based operators (q32/q33 LSH
    * banding, q40 hyperplane sketch, q41/q44 IVF) are calibrated so their
    * candidate stage recalls 100% of the exact answer on the fixtures
    * (margins measured by `graft.Calibrate`), which makes their outputs
    * equal plain SQL-expressible sets — the exact pair set or the exact
    * top-k — so every query has a full-strength oracle.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($charge) AS DOUBLE) AS sum_charge,
         |  ${davg("l_quantity")} AS avg_qty,
         |  ${davg("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q03_join_topk" ->
      s"""SELECT o_orderkey, CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
         |  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
         |GROUP BY o_orderkey
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin,
    "q04_broadcast_star" ->
      s"""SELECT r_name, n_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)""".stripMargin,
    "q06_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin,
    "q07_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q08_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q09_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders) t
        |WHERE rnk <= 3""".stripMargin,
    "q10_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |       OVER (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 10""".stripMargin,
    "q11_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q12_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q13_except" ->
      """SELECT l_orderkey AS orderkey FROM lineitem WHERE l_quantity > 45
        |EXCEPT
        |SELECT l_orderkey AS orderkey FROM lineitem WHERE l_quantity > 48""".stripMargin,
    "q14_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |       COALESCE(l_linestatus, 'ALL') AS ls,
         |       COUNT(*) AS n,
         |       ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q15_scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS od_year,
        |  CAST(month(o_orderdate) AS INT) AS od_month,
        |  CAST(day(o_orderdate) AS INT) AS od_day,
        |  strftime(o_orderdate, '%Y-%m') AS od_ym,
        |  upper(substr(o_orderpriority, 1, 1)) AS prio_code,
        |  CAST(length(o_orderpriority) AS INT) AS prio_len,
        |  o_orderstatus || '#' || o_orderpriority AS status_tag,
        |  CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |       WHEN o_totalprice > 100000.0 THEN 'mid'
        |       ELSE 'small' END AS size_class
        |FROM orders""".stripMargin,
    "q16_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
         |  ${dsum("o_totalprice")} AS total_spent
         |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12""".stripMargin,
    "q17_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')""".stripMargin,
    "q18_scalar_subquery" ->
      s"""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         |WHERE l_extendedprice >
         |  (SELECT ${davg("l_extendedprice")} FROM lineitem) * 1.5""".stripMargin,
    "q19_conditional_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |                THEN CAST(o_totalprice AS DECIMAL(18,4))
        |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS open_value
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q20_pivot_events" ->
      s"""SELECT user_id,
         |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         |  ${dsum("value")} AS total_value
         |FROM events GROUP BY user_id""".stripMargin,
    "q21_json_extract" ->
      """SELECT event_id,
        |  TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k_val
        |FROM events""".stripMargin,
    "q22_monthly_revenue" ->
      s"""SELECT CAST(month(o_orderdate) AS INT) AS od_month,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(DISTINCT o_orderkey) AS n_orders
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE year(o_orderdate) = 1997
         |GROUP BY CAST(month(o_orderdate) AS INT)""".stripMargin,
    "q27_event_windows" ->
      s"""SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
         |  COUNT(*) AS n_events,
         |  ${dsum("value")} AS sum_value,
         |  COUNT(DISTINCT user_id) AS n_users
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q28_cube" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |       COALESCE(l_linestatus, 'ALL') AS ls,
         |       COUNT(*) AS n,
         |       ${dsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q29_sessionize" ->
      """SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(ts_us) AS session_start, MAX(ts_us) AS session_end
        |FROM (
        |  SELECT user_id, ts_us,
        |         CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |                             ORDER BY ts_us, event_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |           CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                             ORDER BY epoch_us(ts), event_id) IS NULL
        |                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                             ORDER BY epoch_us(ts), event_id) > 3600000000
        |                THEN 1 ELSE 0 END AS new_sess
        |    FROM events) flagged) sessions
        |GROUP BY user_id, session_id""".stripMargin,
    "q43_typed_agg" ->
      """SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q23_upsert_latest" -> latestPerUserType,
    "q24_upsert_merge" -> latestPerUserType,
    // file-level bloom-index COW path: same merge contract as q24
    "q105_upsert_bloom" -> latestPerUserType,
    // partition-selective vacuum: reclaiming superseded versions in one
    // partition changes nothing observable, so the oracle is the plain
    // latest-per-key state
    "q178_vacuum_partition" -> latestPerUserType,
    // incrementally-maintained column stats: three insert commits each
    // refresh the sidecar by carrying the cache and scanning only their
    // own files; the maintained index only changes which files open, so
    // the oracle is the plain mid-domain range filter over all rows
    "q179_stats_incremental" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
        |                   event_type, value
        |            FROM events),
        |mm AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM ev)
        |SELECT event_id, user_id, event_type, ts_us, value
        |FROM ev, mm
        |WHERE ts_us BETWEEN mn + (mx - mn) // 3
        |                AND mn + 2 * ((mx - mn) // 3)""".stripMargin,
    // pinned snapshot: the post-manifest decoy commit must be invisible,
    // so the read equals the plain two-commit latest state
    "q110_manifest_snapshot" -> latestPerUserType,
    // WAP: the audited-out poison commit must leave no trace, so the
    // published state equals the plain two-batch merge
    "q114_write_audit_publish" -> latestPerUserType,
    // micro-batch loop through the file-level bloom write path: the
    // write path must not change the merge result
    "q115_stream_bloom" -> latestPerUserType,
    // lock-serialized racing writers ≡ any serial two-batch merge:
    // precombine-aware upsert is commutative over disjoint batches
    "q119_concurrent_upsert" -> latestPerUserType,
    "q120_zorder_pruned" ->
      // z-order + stats pruning is pure I/O elision: the 2-D range read
      // equals the full-scan filter with identical integer bounds
      """WITH m AS (
        |  SELECT min(epoch_us(ts)) AS tmn, max(epoch_us(ts)) AS tmx,
        |         min(user_id) AS umn, max(user_id) AS umx
        |  FROM events),
        |latest AS (
        |  SELECT user_id, event_type, ts_us, event_id, value FROM (
        |    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1)
        |SELECT l.user_id, l.event_type, l.ts_us, l.event_id, l.value
        |FROM latest l, m
        |WHERE l.ts_us BETWEEN m.tmx - (m.tmx - m.tmn) // 4 AND m.tmx
        |  AND l.user_id BETWEEN m.umn + (m.umx - m.umn) // 3
        |                    AND m.umn + 2 * ((m.umx - m.umn) // 3)""".stripMargin,
    // layout is physical, never semantic: the evolved table's
    // cross-generation read equals the plain merge
    "q116_partition_evolution" -> latestPerUserType,
    "q117_stream_kmv" ->
      // KMV exact mode: streamed hourly user cardinalities equal the
      // exact windowed COUNT(DISTINCT)
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |  event_type,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q118_stream_schema_drift" ->
      // mid-stream drift: `value` exists only from the wide (odd-id)
      // slice on, so the latest-per-key state carries it only where the
      // winning row is odd — even winners were ingested before the
      // column existed and were null-filled by the widening upsert
      """SELECT user_id, event_type, ts_us, event_id,
        |  CASE WHEN event_id % 2 = 1 THEN value END AS value
        |FROM (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "q111_daily_resample" ->
      // integer-µs day buckets; carried values are byte-copies of stored
      // doubles, so the forward fill hashes bit-for-bit
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         epoch_us(ts) AS ts_us, event_id, value
        |  FROM events),
        |obs AS (
        |  SELECT user_id, day,
        |         (array_agg(value ORDER BY ts_us DESC, event_id DESC))[1] AS day_value
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM e GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM b),
        |j AS (
        |  SELECT g.user_id, g.day, o.day_value
        |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day)
        |SELECT user_id, day,
        |  last_value(day_value IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING) AS value,
        |  CAST(day_value IS NOT NULL AS INT) AS observed
        |FROM j""".stripMargin,
    "q113_epoch_shards" ->
      // seeded multiplicative hash replayed closed-form; positions by
      // (hash, doc_id) order within each shard
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |         (doc_id*2654435761 + 7*40503) % 1000000007 AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(h % 64 AS INT) AS shard,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY h % 64 ORDER BY h, doc_id) AS INT) AS pos,
        |  n_chars
        |FROM h""".stripMargin,
    "q112_sessionize" ->
      // gap rule and bounds are pure integer µs arithmetic
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
        |f AS (
        |  SELECT user_id, ts_us, event_id,
        |    CASE WHEN ts_us - lag(ts_us) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s0,
        |    CASE WHEN lag(ts_us) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS first_s
        |  FROM e),
        |g AS (
        |  SELECT user_id, ts_us, event_id,
        |    CAST(SUM(CASE WHEN first_s = 1 THEN 1 ELSE new_s0 END) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        |       MAX(ts_us) - MIN(ts_us) AS duration_us
        |FROM g GROUP BY 1, 2""".stripMargin,
    "q107_incr_view" ->
      // the incrementally maintained view must equal this from-scratch
      // recompute over the FINAL latest state, decimal-exact
      s"""SELECT event_type, COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         |FROM ($latestPerUserType) GROUP BY event_type""".stripMargin,
    "q25_schema_evolution" ->
      """SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS value
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, event_type, value
        |FROM events WHERE event_id % 2 = 1""".stripMargin,
    "q26_stream_upsert" -> latestPerUserType,
    "q30_dedup_exact" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)""".stripMargin,
    "q31_dedup_ngram" ->
      """SELECT a_id, b_id, n_inter, n_union, jaccard FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(len(list_intersect(a.toks, b.toks)) AS INT) AS n_inter,
        |    CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS INT) AS n_union,
        |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |      CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS jaccard
        |  FROM (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks,
        |               len(list_distinct(string_split(text, ' '))) AS nt FROM documents) a
        |  JOIN (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks,
        |               len(list_distinct(string_split(text, ' '))) AS nt FROM documents) b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id
        |   AND a.nt * 5 >= b.nt * 4 AND b.nt * 5 >= a.nt * 4) p
        |WHERE jaccard >= 0.6""".stripMargin,
    "q35_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(length(text) AS INT) AS n_chars_actual,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE) /
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS INT) AS n_tokens_bpe
        |FROM documents""".stripMargin,
    "q36_text_quality" -> textQualitySql,
    "q37_text_langid" -> langIdSql,
    "q34_embed_dedup" ->
      // ids only: DuckDB's cosine runs in float32 (≈2e-7 error), ours in
      // float64 — the pair SET is stable (min threshold margin ≈1e-4 at
      // sf0.01) but the similarity VALUES would not hash-match.
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4""".stripMargin,
    "q38_text_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
    "q32_dedup_minhash" -> shingleJaccardSql(0.5),
    "q33_dedup_simhash" -> shingleJaccardSql(0.7),
    // incremental dedup: the all-pairs truth restricted to pairs that
    // involve an arriving (odd-id) doc — corpus×corpus pairs are the
    // standing index's history, not this probe's output
    "q121_incremental_dedup" ->
      (shingleJaccardSql(0.5) + "\n  AND (a_id % 2 = 1 OR b_id % 2 = 1)"),
    "q122_quant_error" ->
      // identical IEEE expression tree on both engines: (x/scale)*127
      // rounded half-away-from-zero, (q*scale)/127 back — bit-for-bit
      """WITH ex AS (
        |  SELECT vec_id, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, embedding,
        |               unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings)),
        |sc AS (SELECT vec_id, max(abs(x)) AS scale FROM ex GROUP BY vec_id),
        |q AS (
        |  SELECT ex.vec_id, x, scale,
        |         CASE WHEN scale = 0 THEN 0.0
        |              ELSE round(x / scale * 127) * scale / 127 END AS deq
        |  FROM ex JOIN sc USING (vec_id))
        |SELECT vec_id, scale,
        |  max(abs(x - deq)) AS max_abs_err,
        |  CAST(SUM(CASE WHEN x = deq THEN 1 ELSE 0 END) AS INT) AS n_exact
        |FROM q GROUP BY vec_id, scale""".stripMargin,
    // stream-static broadcast enrichment ≡ the one-shot batch join + agg
    "q123_stream_enrich" ->
      s"""SELECT n_name, event_type, COUNT(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events
         |JOIN customer ON user_id = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1, 2""".stripMargin,
    // at-least-once transport (every third event re-delivered) collapsed
    // to exactly-once: the output is the original event set, each once
    "q124_stream_dedup" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events""".stripMargin,
    // the replica maintained from the CDC feed must equal the source's
    // latest-per-key state
    "q125_cdc_replica" -> latestPerUserType,
    // debris removal is observability-free: read-back ≡ the plain merge
    "q126_rollback_debris" -> latestPerUserType,
    // BPE pair counting: adjacency by position (toks[i], toks[i+1]);
    // rank ties broken by pair text asc, matching TopTermsByCount
    "q127_bpe_pairs" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |p AS (SELECT toks[i] || ' ' || toks[i + 1] AS pair
        |      FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t) e),
        |cnt AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY pair)
        |SELECT pair,
        |       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS INT) AS rnk,
        |       n AS n_occurrences
        |FROM cnt ORDER BY n DESC, pair LIMIT 30""".stripMargin,
    // the MV-served aggregate must equal the straight base-table rollup
    // (the plan-shape assertion — rollup scanned, base not — lives in
    // MvRewriteSpec; the oracle checks the answer, not the path)
    "q128_mv_rewrite" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority""".stripMargin,
    // the MV over the KEYED table, refreshed from the state-delta feed
    // after the second commit, must equal a from-scratch aggregate over
    // the final latest-per-key state — the signed delta merge is exact
    // decimal, so incremental == full bit-for-bit
    "q131_mv_keyed" ->
      s"""SELECT event_type, COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         |FROM ($latestPerUserType) GROUP BY event_type""".stripMargin,
    // avg over BIGINT is exact-integer sums divided in double on both
    // engines — bit-stable; the Spark side is SERVED from the
    // (lang, source) rollup (avg = re-sum ÷ re-count across source
    // groups; MvRewriteSpec asserts the plan)
    "q132_mv_avg" ->
      """SELECT lang, AVG(n_chars) AS avg_chars,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  COUNT(n_chars) AS n_with_len,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,
    // the stream-maintained rollup at rest ≡ a from-scratch aggregate
    // over the final latest-per-key state (the q131 oracle — the
    // maintenance path differs, the answer must not)
    "q133_mv_stream" ->
      s"""SELECT event_type, COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         |FROM ($latestPerUserType) GROUP BY event_type""".stripMargin,
    // served from the SMALLER of two registered lineitem rollups (the
    // cost-ordered selection assertion lives in MvRewriteSpec; the
    // oracle checks the answer, not the path)
    "q134_mv_select" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // min/max maintained through an UPDATING upsert via group-scoped
    // recompute (touched partitions only) must equal the straight
    // extremes over the final latest-per-key state
    "q135_mv_minmax" ->
      s"""SELECT event_type, COUNT(*) AS n_rows,
         |  CAST(MIN(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS min_value,
         |  CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS max_value
         |FROM ($latestPerUserType) GROUP BY event_type""".stripMargin,
    // the star-join rollup (orders ⋈ customer) must serve the same join
    // + aggregate written directly (the join-elision plan assertion
    // lives in JoinedMvSpec; the oracle checks the answer)
    "q136_mv_join" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment""".stripMargin,
    // served from the (year, month) expression-dim rollup — grouping by
    // the month SUBSET re-aggregates across stored years (plan assertion
    // in MvRewriteSpec; the oracle checks the answer)
    "q137_mv_time" ->
      """SELECT CAST(month(o_orderdate) AS INT) AS od_month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders
        |FROM orders WHERE month(o_orderdate) <= 6
        |GROUP BY 1""".stripMargin,
    // served from the ADVISOR-recommended rollup (built to cover a
    // three-query workload; the workload-wide serving assertions live in
    // MvAdvisorSpec — the oracle checks this query's answer)
    "q138_mv_advisor" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    // the append-stale rollup serves rollup ∪ delta-partials WITHOUT a
    // refresh; the private base is orders + an appended copy of itself,
    // so every measure is exactly doubled (the plan-shape assertions —
    // rollup + ONLY the appended file scanned — live in MvRewriteSpec)
    "q139_mv_hybrid" ->
      """SELECT o_orderpriority,
        |  CAST(2 * SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  2 * COUNT(*) AS n_orders
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority""".stripMargin,
    // the two-phase ROLLUP whose base-grain pre-aggregation is SERVED
    // from the lineitem MV (plan assertion in MvRewriteSpec); answers ≡
    // the straight grouping-sets aggregate
    "q140_mv_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |       COALESCE(l_linestatus, 'ALL') AS ls,
         |       COUNT(*) AS n,
         |       ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    // served from the advisor-recommended STAR rollup (one joined
    // recommendation covers the two-query workload; serving assertions
    // in MvAdvisorSpec — the oracle checks this query's answer)
    "q141_mv_advisor_star" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    // the keyed COW rollup plus the commit→files-index'd insert delta,
    // served WITHOUT a refresh, must equal the straight aggregate over
    // the post-insert state (event_id is unique ⇒ that is all events;
    // the plan-shape assertions — rollup + only the delta files scanned,
    // base dir never — live in KeyedMvSpec)
    "q142_mv_keyed_hybrid" ->
      """SELECT event_type, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    // the ONE-PHASE `GROUP BY ROLLUP` (Aggregate over Expand, the shape
    // BI tools emit) served by the Expand rewrite from the lineitem MV —
    // same oracle as the two-phase q140 (plan assertion in MvRewriteSpec)
    "q143_mv_rollup_1phase" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |       COALESCE(l_linestatus, 'ALL') AS ls,
         |       COUNT(*) AS n,
         |       ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    // the coarse rollup refreshed FROM the finer rollup (never the base)
    // after the base doubled — measures exactly 2× the fixture aggregate
    // (the refresh-scans-only-the-finer assertion lives in MvRewriteSpec)
    "q144_mv_coarse_from_finer" ->
      """SELECT o_orderpriority,
        |  CAST(2 * SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  2 * COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // record-level-index point lookup over a stale index: the index only
    // changes which files open — ≡ full merge ∘ key semi-join
    "q145_rli_lookup" ->
      """SELECT user_id, event_type, ts_us, event_id, value FROM (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 AND user_id % 7 = 3""".stripMargin,
    // secondary-index point lookup on a non-key column over a stale
    // index: value→keys→files through the two sidecars, residual value
    // filter — ≡ resolve-latest ∘ value filter
    "q146_secondary_lookup" ->
      """SELECT user_id, event_type, ts_us, event_id, value FROM (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 AND event_id % 997 = 0""".stripMargin,
    // the one-phase GROUP BY ROLLUP over the WHOLE STAR served from the
    // joined rollup (fact scan and join both elided — plan assertion in
    // JoinedMvSpec)
    "q148_mv_star_1phase" ->
      s"""SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
         |       COALESCE(o_orderstatus, 'ALL') AS st,
         |       COUNT(*) AS n,
         |       ${dsum("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)""".stripMargin,
    // index-backed streaming lookup join: each micro-batch point-joins
    // the keyed dim through the RLI (stale-index path, content-
    // idempotent re-upsert) — ≡ the plain events ⋈ customer aggregate
    "q149_stream_lookup_join" ->
      s"""SELECT c_mktsegment, event_type,
         |       COUNT(*) AS n_events, ${dsum("value")} AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment, event_type""".stripMargin,
    // the index advisor's DBA loop closed end-to-end: analyze the probe
    // workload, build the recommended record-level index, and the same
    // declarative query runs index-pruned — same semantics as q147
    "q150_index_advisor" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events WHERE event_id % 9973 = 0""".stripMargin,
    // declarative range pruning: the optimizer serves a literal BETWEEN
    // through the column-stats sidecar on a sort-clustered COW table;
    // the declarative filter is the whole semantics
    "q151_range_prune" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events WHERE event_id BETWEEN 100 AND 499""".stripMargin,
    // metadata-only aggregates: whole-table min/max/count folded from
    // the column-stats sidecar (zero data files opened)
    "q152_stats_agg" ->
      """SELECT min(event_id) AS min_id, max(event_id) AS max_id,
        |       min(user_id) AS min_uid, max(user_id) AS max_uid,
        |       CAST(sum(user_id) AS BIGINT) AS sum_uid, count(*) AS n_rows
        |FROM events""".stripMargin,
    // the table as a live stream source: every version rides the feed
    // tagged with its commit; the slice predicate that produced the two
    // commits reconstructs the tags
    "q153_stream_table_feed" ->
      s"""SELECT event_type,
         |       CASE WHEN event_id % 2 = 0 THEN 'c0' ELSE 'c1' END AS commit_time,
         |       COUNT(*) AS n_events, ${dsum("value")} AS sum_value
         |FROM events GROUP BY event_type, commit_time""".stripMargin,
    // partition-grouped metadata aggregates: the per-partition rollup
    // folded from the sidecar's per-file partition tuples, zero data
    // files opened
    "q154_stats_group_agg" ->
      """SELECT event_type, min(event_id) AS min_id, max(event_id) AS max_id,
        |       max(user_id) AS max_uid, count(*) AS n_rows
        |FROM events GROUP BY event_type""".stripMargin,
    // file-granular indexed delete: the doomed keys' candidate files are
    // rewritten, everything else is untouched — the result is the plain
    // anti-join
    "q155_indexed_delete" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events WHERE event_id % 37 <> 0""".stripMargin,
    // the layout-advisor loop: stats that can't skip → measured cluster
    // recommendation → sort rewrite → the same declarative range prunes
    "q156_layout_advisor" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events WHERE event_id BETWEEN 500 AND 899""".stripMargin,
    // metadata-only partition drop: a whole hive partition retires via
    // directory deletes + a commit record, zero bytes rewritten
    "q157_drop_partition" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events WHERE event_type <> 'click'""".stripMargin,
    // typed (timestamp) range pruning: the declarative filter is the
    // whole semantics, the stats sidecar only changes which files open
    "q158_ts_range_prune" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       epoch_us(o_orderdate) AS od_us
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                      AND TIMESTAMP '1996-12-31 23:59:59'""".stripMargin,
    // merge-on-read range pruning: reconstruct the two commits (c1
    // shifts every 11th user's timestamps past the whole original
    // domain), resolve latest per key scope, then the range filter —
    // the trap being that a c0 version inside the range whose c1 winner
    // left it must NOT appear
    "q159_mor_range_prune" ->
      """WITH ev AS (SELECT * FROM events WHERE event_id % 2 = 0),
        |mm AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        |       FROM ev),
        |u AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |  FROM ev
        |  UNION ALL
        |  SELECT user_id, event_type,
        |         epoch_us(ts) + (SELECT mx - mn + 1000000 FROM mm) AS ts_us,
        |         event_id, value
        |  FROM ev WHERE user_id % 11 = 0),
        |w AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM u)
        |SELECT user_id, event_type, ts_us, event_id, value
        |FROM w, mm WHERE rn = 1
        |  AND ts_us BETWEEN mn + (mx - mn) // 2 AND mx""".stripMargin,
    // declarative MoR range: same reconstruction as q159 (the shifted
    // users' winners sit past mx, so the BETWEEN …mx window excludes
    // them and their superseded in-range versions must not resurrect),
    // probing the narrow top-of-domain slice the key-capped serve fits
    "q170_mor_range_declarative" ->
      """WITH ev AS (SELECT * FROM events WHERE event_id % 2 = 0),
        |mm AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        |       FROM ev),
        |l100 AS (SELECT min(ts_us) AS lo FROM (
        |  SELECT epoch_us(ts) AS ts_us FROM ev
        |  ORDER BY ts_us DESC LIMIT 8)),
        |u AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |  FROM ev
        |  UNION ALL
        |  SELECT user_id, event_type,
        |         epoch_us(ts) + (SELECT mx - mn + 1000000 FROM mm) AS ts_us,
        |         event_id, value
        |  FROM ev WHERE user_id % 11 = 0),
        |w AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM u)
        |SELECT user_id, event_type, ts_us, event_id, value
        |FROM w, mm, l100 WHERE rn = 1
        |  AND ts_us BETWEEN l100.lo AND mx""".stripMargin,
    // partition-composed MoR range: same reconstruction as q170, the
    // partition conjunct narrows candidates and keys; the window
    // anchors at the max original click ts of a NON-shifted user so the
    // result is non-empty at every tier
    "q176_mor_range_partitioned" ->
      """WITH ev AS (SELECT * FROM events WHERE event_id % 2 = 0),
        |mm AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        |       FROM ev),
        |lo AS (SELECT max(epoch_us(ts)) AS v FROM ev
        |       WHERE user_id % 11 <> 0 AND event_type = 'click'),
        |u AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |  FROM ev
        |  UNION ALL
        |  SELECT user_id, event_type,
        |         epoch_us(ts) + (SELECT mx - mn + 1000000 FROM mm) AS ts_us,
        |         event_id, value
        |  FROM ev WHERE user_id % 11 = 0),
        |w AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM u)
        |SELECT user_id, event_type, ts_us, event_id, value
        |FROM w, mm, lo WHERE rn = 1 AND event_type = 'click'
        |  AND ts_us BETWEEN lo.v AND mm.mx""".stripMargin,
    // streamed secondary-index enrichment == the batch join: per-nation
    // event rollup joined to the per-nation customer rollup
    "q160_stream_si_join" ->
      s"""WITH b AS (SELECT user_id % 25 AS nat, count(*) AS n_events
         |           FROM events GROUP BY 1),
         |d AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, count(*) AS n_cust,
         |             ${dsum("c_acctbal")} AS sum_acctbal
         |      FROM customer GROUP BY 1)
         |SELECT b.nat, b.n_events, d.n_cust, d.sum_acctbal
         |FROM b JOIN d USING (nat)""".stripMargin,
    // string (lexicographic) range pruning over the lang-clustered docs
    "q161_string_range_prune" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang >= 'en' AND lang < 'fr'""".stripMargin,
    // top-k pruning: ORDER BY ts DESC LIMIT k served through the stats
    // sidecar; the unique-key tiebreak makes the top-k set deterministic
    // and the residual Sort+Limit make the values the plain query's
    "q162_topk_prune" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events
        |ORDER BY ts_us DESC, event_id DESC LIMIT 500""".stripMargin,
    // null-predicate pruning: the IS NULL filter is the whole
    // semantics (every 7th key's value nulled before the write); the
    // per-file null counts only change which files open
    "q163_null_prune" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |FROM events WHERE event_id % 7 = 0""".stripMargin,
    // star-join fact pruning: the rule only changes which fact files
    // open, so the oracle is the plain join (the fact table holds every
    // order exactly once — disjoint even/odd commits on a unique key;
    // the dim re-upsert is value-identical)
    "q164_join_prune" ->
      """SELECT c.c_name, o.o_orderkey, o.o_totalprice,
        |       epoch_us(o.o_orderdate) AS od_us
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey % 131 = 1""".stripMargin,
    // grouped hybrid range aggregate: per-partition fold of full files
    // plus boundary-file grouped scan — the rewrite only changes which
    // files open, so the oracle is the plain grouped filtered aggregate
    "q168_range_agg_grouped" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id, value
        |            FROM events),
        |mm AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM ev)
        |SELECT event_type, count(*) AS n_rows,
        |       CAST(sum(event_id) AS BIGINT) AS id_sum,
        |       min(value) AS v_min, max(value) AS v_max
        |FROM ev, mm
        |WHERE ts_us BETWEEN mn + (mx - mn) // 8 AND mx - (mx - mn) // 8
        |GROUP BY event_type""".stripMargin,
    // filtered top-k: partition + range conjuncts compose into the
    // stats walk; the residual Filter + Sort + Limit keep the values
    // exactly the plain query's (unique event_id tiebreak pins the set)
    "q169_topk_filtered" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |                   event_id, value FROM events),
        |mm AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM ev)
        |SELECT user_id, event_type, ts_us, event_id, value
        |FROM ev, mm
        |WHERE event_type = 'click' AND ts_us <= mn + 3 * (mx - mn) // 4
        |ORDER BY ts_us DESC, event_id DESC LIMIT 300""".stripMargin,
    // IN-list stats pruning: the rule only changes which files open,
    // so the oracle is the plain IN filter
    "q167_inlist_prune" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE lang IN ('de', 'zh')""".stripMargin,
    // grouped top-k: per-group walks only change which files open; the
    // residual Window + rank filter keep the values exact (unique
    // event_id tiebreak pins every rank)
    "q177_group_topk" ->
      """WITH w AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY epoch_us(ts) DESC,
        |                                     event_id DESC) AS rk
        |  FROM events)
        |SELECT user_id, event_type, ts_us, event_id, value,
        |       CAST(rk AS INT) AS rk
        |FROM w WHERE rk <= 100""".stripMargin,
    // paginated top-k: the walk runs at the combined bound k+m; the
    // residual Sort + limits + Offset slice the page exactly
    "q175_topk_page" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events
        |ORDER BY ts_us DESC, event_id DESC LIMIT 200 OFFSET 200""".stripMargin,
    // IN-composed top-k: the walk's full files are the clustered
    // language runs; the residual Sort + Limit keep the values exact
    // (unique doc_id tiebreak pins the set)
    "q174_topk_inlist" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang IN ('de', 'zh')
        |ORDER BY n_chars DESC, doc_id DESC LIMIT 100""".stripMargin,
    // decimal sum from the sidecar's exact DECIMAL(38,2) partials,
    // narrowed to Spark's Sum result type DECIMAL(22,2); l_quantity is
    // integer-valued so the double→decimal cast is exact on both
    // engines
    "q173_decimal_sum_stats" ->
      """SELECT CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |         AS sum_qty,
        |       CAST(min(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |         AS min_qty,
        |       CAST(max(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |         AS max_qty,
        |       count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    // range-probed star join: the rule only changes which fact files
    // open, so the oracle is the plain join over the window (the fact
    // holds every order exactly once — disjoint %97 commits on a
    // unique key)
    "q172_join_prune_range" ->
      """WITH mm AS (SELECT max(c_acctbal) AS mx FROM customer)
        |SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey, mm
        |WHERE c.c_acctbal BETWEEN mm.mx - 50.0 AND mm.mx""".stripMargin,
    // IN-list hybrid aggregate: single-valued files fold from the
    // sidecar, boundary files scan — the rewrite only changes which
    // files open, so the oracle is the plain filtered aggregate (CAST
    // keeps DuckDB's HUGEINT sum out of the schema compare)
    "q171_inlist_agg_hybrid" ->
      """SELECT count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents WHERE lang IN ('de', 'zh', 'en')""".stripMargin,
    // data-column grouped hybrid: single-valued files fold into their
    // group from the sidecar, boundary files scan and the combine
    // re-folds — only which files open changes, so the oracle is the
    // plain grouped aggregate
    "q180_group_clustered_agg" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang""".stripMargin,
    // DISTINCT over a partition column: answered from the sidecar's
    // per-file partition tuples, zero data files opened
    "q181_distinct_partitions" ->
      "SELECT DISTINCT event_type FROM events",
    // DISTINCT over a clustered data column: the hybrid no-aggregate
    // arm — single-valued files contribute their value, boundaries scan
    "q182_distinct_clustered" ->
      "SELECT DISTINCT lang FROM documents",
    // avg from the stats sidecar: exact sum + count folds, the division
    // evaluated through Spark's own Average expression; integral avgs
    // are exact on both engines (same-sign totals < 2^53 make every
    // double accumulation exact), so the doubles hash-match
    "q183_avg_stats" ->
      """SELECT event_type, avg(event_id) AS avg_id,
        |       avg(user_id) AS avg_uid, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    // MoR live count from the record-level index: the stale-index +
    // delta reconciliation only changes how the count is computed —
    // the answer is the latest-per-(key, partition) cardinality, and
    // the c1 corrections re-land existing (user, type) scopes, so the
    // live set is exactly the c0 half's distinct scopes
    "q184_mor_live_count" ->
      """SELECT count(*) AS n_live FROM (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE event_id % 2 = 0)""".stripMargin,
    // grouped MoR live count from the index's typed partition values:
    // corrections re-land existing scopes, so per-partition liveness is
    // the c0 half's distinct scopes per type
    "q188_mor_group_count" ->
      """SELECT event_type, count(*) AS n_live FROM (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE event_id % 2 = 0)
        |GROUP BY event_type""".stripMargin,
    // hybrid grouped avg: exact sum + count partials on both union
    // sides, the division through Spark's own Average expression —
    // integral avgs are exact on both engines under the same-sign +
    // < 2^53 guard, so the doubles hash-match
    "q189_avg_hybrid" ->
      """WITH mm AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        |            FROM events)
        |SELECT event_type, avg(event_id) AS avg_id, count(*) AS n
        |FROM events, mm
        |WHERE epoch_us(ts) BETWEEN mn + (mx - mn) // 8
        |                       AND mx - (mx - mn) // 8
        |GROUP BY event_type""".stripMargin,
    // count(DISTINCT clustered col) as a values union: single-valued
    // files fold their stored value, boundary files scan — only which
    // files open changes, so the oracle is the plain distinct count
    "q190_distinct_count_clustered" ->
      "SELECT count(DISTINCT lang) AS n_langs FROM documents",
    // MoR resolved aggregates by winner-file classification: pure files
    // fold sidecar stats, mixed files scan winner rows — the answer is
    // the aggregate over the latest-per-(user, type) winners.
    // Reconstruct the fixture's two commits (c1 re-lands the lowest
    // sixteenth of the user range with bumped timestamps) and resolve
    // by (ts desc, event_id desc); integral sums/avgs stay exact on
    // both engines (< 2^53, same sign)
    "q191_mor_resolved_stats" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_id % 2 = 0),
        |b AS (SELECT min(user_id) + (max(user_id) - min(user_id)) // 16 AS cut
        |      FROM base),
        |allv AS (
        |  SELECT user_id, event_type, ts_us, event_id FROM base
        |  UNION ALL
        |  SELECT user_id, event_type, ts_us + 1000000, event_id
        |  FROM base, b WHERE user_id <= b.cut),
        |win AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM allv)
        |SELECT min(ts_us) AS mn_ts, max(ts_us) AS mx_ts,
        |       CAST(sum(event_id) AS BIGINT) AS s_id,
        |       avg(event_id) AS a_id,
        |       count(ts_us) AS n_ts, count(*) AS n_live
        |FROM win WHERE rn = 1""".stripMargin,
    // grouped top-k over a clustered DATA column: only which files open
    // changes (single-valued files walk their language's run, boundary
    // files always kept) — the oracle is the plain window; the unique
    // doc_id tiebreak pins every rank
    "q192_group_topk_clustered" ->
      """WITH w AS (
        |  SELECT doc_id, lang, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC,
        |                                     doc_id DESC) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, CAST(rk AS INT) AS rk
        |FROM w WHERE rk <= 20""".stripMargin,
    // streamed ingest with per-batch stats+index maintenance: the
    // maintained sidecars only change which files open — the answer is
    // the latest-per-(user, type) state under the lookup-OR-range
    // filter (the union arms are disjoint by construction)
    "q193_stream_maintained" ->
      """WITH latest AS (
        |  SELECT user_id, event_type, ts_us, event_id, value FROM (
        |    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                              ORDER BY epoch_us(ts) DESC,
        |                                       event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1),
        |b AS (SELECT min(user_id) AS k,
        |             max(epoch_us(ts)) - (max(epoch_us(ts)) - min(epoch_us(ts))) // 4 AS lo
        |      FROM events)
        |SELECT user_id, event_type, ts_us, event_id, value
        |FROM latest, b WHERE user_id = b.k OR ts_us >= b.lo""".stripMargin,
    // filtered distinct count over a clustered data column: only which
    // files open changes (in-range single-valued files fold their one
    // value, boundary files scan with the residual) — the oracle is
    // the plain filtered distinct count
    "q194_distinct_filtered" ->
      """WITH b AS (SELECT min(n_chars) + (max(n_chars) - min(n_chars)) // 4 AS lo,
        |                  max(n_chars) - (max(n_chars) - min(n_chars)) // 4 AS hi
        |           FROM documents)
        |SELECT count(DISTINCT lang) AS n_langs
        |FROM documents, b WHERE n_chars >= b.lo AND n_chars <= b.hi""".stripMargin,
    // grouped MoR resolved aggregates by winner-file classification:
    // the same reconstruction as q191, grouped per partition
    "q195_mor_group_stats" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_id % 2 = 0),
        |b AS (SELECT min(user_id) + (max(user_id) - min(user_id)) // 16 AS cut
        |      FROM base),
        |allv AS (
        |  SELECT user_id, event_type, ts_us, event_id FROM base
        |  UNION ALL
        |  SELECT user_id, event_type, ts_us + 1000000, event_id
        |  FROM base, b WHERE user_id <= b.cut),
        |win AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM allv)
        |SELECT event_type, min(ts_us) AS mn_ts, max(ts_us) AS mx_ts,
        |       CAST(sum(event_id) AS BIGINT) AS s_id,
        |       avg(event_id) AS a_id, count(*) AS n_live
        |FROM win WHERE rn = 1 GROUP BY event_type""".stripMargin,
    // partition-filtered MoR resolved aggregates: the IN conjunct
    // selects whole partitions' files and winners — same
    // reconstruction as q191 with the filter on the resolved state
    "q196_mor_filtered_stats" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_id % 2 = 0),
        |b AS (SELECT min(user_id) + (max(user_id) - min(user_id)) // 16 AS cut
        |      FROM base),
        |allv AS (
        |  SELECT user_id, event_type, ts_us, event_id FROM base
        |  UNION ALL
        |  SELECT user_id, event_type, ts_us + 1000000, event_id
        |  FROM base, b WHERE user_id <= b.cut),
        |win AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM allv)
        |SELECT min(ts_us) AS mn_ts, max(ts_us) AS mx_ts,
        |       CAST(sum(event_id) AS BIGINT) AS s_id,
        |       avg(event_id) AS a_id, count(*) AS n_live
        |FROM win WHERE rn = 1 AND event_type IN ('click', 'view')""".stripMargin,
    // range-filtered MoR resolved aggregates: the cohort bound on the
    // clustered key composes with the winner-file classification —
    // same reconstruction as q191, the range applied to the resolved
    // state
    "q198_mor_range_stats" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_id % 2 = 0),
        |b AS (SELECT min(user_id) + (max(user_id) - min(user_id)) // 16 AS cut,
        |             min(user_id) + (max(user_id) - min(user_id)) // 32 AS lo
        |      FROM base),
        |allv AS (
        |  SELECT user_id, event_type, ts_us, event_id FROM base
        |  UNION ALL
        |  SELECT user_id, event_type, ts_us + 1000000, event_id
        |  FROM base, b WHERE user_id <= b.cut),
        |win AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM allv)
        |SELECT min(ts_us) AS mn_ts, max(ts_us) AS mx_ts,
        |       CAST(sum(event_id) AS BIGINT) AS s_id,
        |       count(*) AS n_live
        |FROM win, b WHERE rn = 1 AND user_id >= b.lo""".stripMargin,
    // cluster-aware split: q51's connected-component labels with the
    // 80/10/10 split keyed on the representative — leakage-free by
    // construction
    "q197_cluster_split" ->
      s"""WITH RECURSIVE
         |sh AS ($shingleTable),
         |p AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS j
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) q
         |  WHERE j >= 0.5),
         |e AS (SELECT a_id AS src, b_id AS dst FROM p
         |      UNION ALL SELECT b_id, a_id FROM p),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id)
         |SELECT id AS doc_id, MIN(r) AS cluster_rep,
         |       CASE WHEN MIN(r) % 10 < 8 THEN 'train'
         |            WHEN MIN(r) % 10 = 8 THEN 'validation'
         |            ELSE 'test' END AS split
         |FROM reach GROUP BY id""".stripMargin,
    // grouped-rollup advisor: stats + measured cluster only change
    // which files open — the oracle is the plain grouped aggregate
    "q185_rollup_advisor" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang""".stripMargin,
    // partition-cardinality from the sidecar: only which files open
    // changes, so the oracle is the plain distinct count
    "q186_distinct_count" ->
      """SELECT count(DISTINCT event_type) AS n_types, count(*) AS n_rows
        |FROM events""".stripMargin,
    // retention advisor: reconstruct the two commits (c1 shifts the
    // click partition's rows past the whole domain), resolve latest per
    // (key, partition) — vacuum reclaims bytes, never rows
    "q187_vacuum_advisor" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |                   event_id, value
        |            FROM events WHERE event_id % 2 = 0),
        |mm AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM ev),
        |u AS (
        |  SELECT * FROM ev
        |  UNION ALL
        |  SELECT user_id, event_type,
        |         ts_us + (SELECT mx - mn + 1000000 FROM mm) AS ts_us,
        |         event_id, value
        |  FROM ev WHERE event_type = 'click'),
        |w AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM u)
        |SELECT user_id, event_type, ts_us, event_id, value
        |FROM w WHERE rn = 1""".stripMargin,
    // compaction advisor: the layout service only changes file sizing,
    // so the oracle is the plain projection
    "q166_compact_advisor" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer""".stripMargin,
    // hybrid range aggregate: full files fold from the sidecar,
    // boundary files scan — the rewrite only changes which files open,
    // so the oracle is the plain filtered aggregate (CAST keeps
    // DuckDB's HUGEINT sum out of the schema compare)
    "q165_range_agg_hybrid" ->
      """WITH mm AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        |            FROM events)
        |SELECT count(*) AS n_rows, count(value) AS n_vals,
        |       CAST(sum(event_id) AS BIGINT) AS id_sum,
        |       min(value) AS v_min, max(value) AS v_max
        |FROM events, mm
        |WHERE epoch_us(ts) BETWEEN mn + (mx - mn) // 8
        |                       AND mx - (mx - mn) // 8""".stripMargin,
    // point-lookup pushdown: the optimizer swaps the scan onto the
    // record-level index's candidate files; the declarative filter is
    // the whole semantics (COW event_id keys — disjoint commits, no
    // supersede), so the oracle is a plain value filter
    "q147_plan_lookup" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events WHERE event_id % 9973 = 0""".stripMargin,
    // dHash from the closed-form pixels: 2x2 red-channel sums -> 8x8
    // cells, bit (r,c) = cell < right-neighbor; CASTs keep DuckDB's
    // HUGEINT sums out of the schema compare
    "q129_image_phash" ->
      """WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
        |cell AS (
        |  SELECT i.doc_id, r.range AS r, c.range AS c,
        |    SUM((i.doc_id*7 + ((r.range*2 + dr.range)*16 + c.range*2 + dc.range)) % 256) AS s
        |  FROM img i
        |  CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c
        |  CROSS JOIN range(0, 2) dr CROSS JOIN range(0, 2) dc
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN a.s < b.s
        |                  THEN (CAST(1 AS BIGINT) << (a.r*7 + a.c))
        |                  ELSE 0 END) AS BIGINT) AS phash
        |  FROM cell a JOIN cell b
        |    ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c < 7 GROUP BY 1)
        |SELECT doc_id, phash,
        |       COUNT(*) OVER (PARTITION BY phash) AS n_same
        |FROM bits""".stripMargin,
    // brute-force verify of the pigeonhole plan: all pairs within
    // hamming<=1 of the closed-form 56-bit hashes (tau=1 keeps the truth
    // set selective on the gradient fixture; the chunk machinery is exact
    // to tau=3)
    "q130_phash_near" ->
      """WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
        |cell AS (
        |  SELECT i.doc_id, r.range AS r, c.range AS c,
        |    SUM((i.doc_id*7 + ((r.range*2 + dr.range)*16 + c.range*2 + dc.range)) % 256) AS s
        |  FROM img i
        |  CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c
        |  CROSS JOIN range(0, 2) dr CROSS JOIN range(0, 2) dc
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN a.s < b.s
        |                  THEN (CAST(1 AS BIGINT) << (a.r*7 + a.c))
        |                  ELSE 0 END) AS BIGINT) AS phash
        |  FROM cell a JOIN cell b
        |    ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c < 7 GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        |FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 1""".stripMargin,
    "q54_range_window" ->
      // RANGE frame: value-bounded, so ties are included by definition —
      // deterministic with no secondary sort on either engine
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |       OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS rolling_value
        |FROM events""".stripMargin,
    "q52_dataset_split" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 < 8 THEN 'train'
        |       WHEN doc_id % 10 = 8 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q53_contamination" ->
      s"""WITH sh AS ($shingleTable),
         |p AS (
         |  SELECT a_id, b_id, jaccard FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) q
         |  WHERE jaccard >= 0.5),
         |sp AS (
         |  SELECT a_id, b_id, jaccard,
         |    CASE WHEN a_id % 10 < 8 THEN 'train'
         |         WHEN a_id % 10 = 8 THEN 'validation' ELSE 'test' END AS a_split,
         |    CASE WHEN b_id % 10 < 8 THEN 'train'
         |         WHEN b_id % 10 = 8 THEN 'validation' ELSE 'test' END AS b_split
         |  FROM p)
         |SELECT a_id AS train_id, b_id AS eval_id, b_split AS eval_split, jaccard
         |FROM sp WHERE a_split = 'train' AND b_split <> 'train'
         |UNION ALL
         |SELECT b_id, a_id, a_split, jaccard
         |FROM sp WHERE b_split = 'train' AND a_split <> 'train'""".stripMargin,
    "q51_dedup_clusters" -> clusterLabelsSql,
    // the incremental maintenance (standing labels + delta probe +
    // collapsed-graph merge) must answer IDENTICALLY to the full
    // propagation — same recursive CTE as q51
    "q202_incremental_labels" -> clusterLabelsSql,
    "q39_ann_brute" -> annTop10Sql,
    "q40_ann_lsh" -> annTop10Sql,
    "q44_ann_ivf" -> annTop10Sql,
    "q67_ann_pq" -> annTop10Sql,
    "q41_knn_join" ->
      // ids and ranks only: DuckDB's cosine runs in float32, ours in
      // float64 — the fixture's smallest adjacent-rank cosine gap
      // (1.4e-6, measured by Calibrate) exceeds the float32 error
      // (~2e-7), so the rank ORDER is stable even though the cosine
      // VALUES would not hash-match.
      """SELECT a_id, b_id, rnk FROM (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
        |                    b.vec_id) AS INT) AS rnk
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id) t
        |WHERE rnk <= 5""".stripMargin,
    "q46_bm25" -> bm25Sql,
    "q49_profile" -> {
      val cols = Seq("event_id", "user_id", "event_type", "ts_us", "value", "props")
      cols.map { c =>
        val src = if (c == "ts_us") "epoch_us(ts)" else c
        s"""SELECT '$c' AS column_name,
           |  CAST(SUM(CASE WHEN $src IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  COUNT(DISTINCT $src) AS n_distinct
           |FROM events""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    "q106_kmv_distinct" ->
      // KMV exact mode: per-type cardinality < k, so the sketch's answer
      // IS the exact distinct count
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q50_quantiles" ->
      // percentile_disc returns actual elements — no interpolation
      // arithmetic, so the doubles compare bit-for-bit
      """SELECT o_orderpriority,
        |  quantile_disc(o_totalprice, 0.25) AS p25,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.75) AS p75,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q48_range_join" ->
      // the oracle is the plain interval theta-join the binned equality
      // join must reproduce exactly
      """SELECT e.event_id AS err_id, o.event_id AS near_id,
        |       epoch_us(o.ts) - epoch_us(e.ts) AS dt_us
        |FROM events e JOIN events o
        |  ON e.user_id = o.user_id
        | AND o.event_id <> e.event_id
        | AND abs(epoch_us(o.ts) - epoch_us(e.ts)) <= 3600000000
        |WHERE e.event_type = 'error'""".stripMargin,
    "q47_asof_join" ->
      // oracle = DuckDB's NATIVE ASOF JOIN (inclusive, greatest
      // p_ts_us <= ts_us per user) — our window-pass composition must
      // reproduce it row for row
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'click'),
        |p0 AS (SELECT user_id, epoch_us(ts) AS p_ts_us, value AS p_value,
        |              ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
        |                                 ORDER BY event_id DESC) AS rn
        |       FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, p_ts_us, p_value FROM p0 WHERE rn = 1)
        |SELECT c.event_id, c.user_id, c.ts_us, p.p_ts_us, p.p_value
        |FROM c ASOF JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.p_ts_us""".stripMargin,
    "q45_salted_join" ->
      // the oracle is the UNSALTED join: salting must be row-identical
      s"""SELECT l_suppkey AS suppkey, s_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY l_suppkey, s_name""".stripMargin,
    "q55_incremental_read" ->
      // rows whose LAST change landed in commit c1 (odd-id batch): keys
      // whose global latest event is odd; even winners carry commit c0
      // through the rewrite and fall outside the (c0, c1] window
      s"""SELECT user_id, event_type, ts_us, event_id, value
         |FROM ($latestPerUserType) latest
         |WHERE event_id % 2 = 1""".stripMargin,
    "q56_pii_redact" -> {
      val email = Curation.EmailRe
      val phone = Curation.PhoneRe
      val ip = Curation.Ipv4Re
      s"""WITH d AS (
         |  SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 3 = 0
         |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 4 = 0
         |         THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0')
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0
         |         THEN ' from 192.168.' || CAST(doc_id % 200 + 1 AS VARCHAR) || '.77'
         |         ELSE '' END AS txt
         |  FROM documents)
         |SELECT doc_id, n_emails, n_phones, n_ips, redacted,
         |       (n_emails + n_phones + n_ips) > 0 AS has_pii
         |FROM (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(txt, '$email', 0)) AS INT) AS n_emails,
         |    CAST(len(regexp_extract_all(txt, '$phone', 0)) AS INT) AS n_phones,
         |    CAST(len(regexp_extract_all(txt, '$ip', 0)) AS INT) AS n_ips,
         |    regexp_replace(regexp_replace(regexp_replace(txt,
         |        '$email', '<EMAIL>', 'g'),
         |        '$phone', '<PHONE>', 'g'),
         |        '$ip', '<IP>', 'g') AS redacted
         |  FROM d) c""".stripMargin
    },
    // bigram table mirrors TextFunctions.shingles(k=2): <2-token docs
    // fall back to [text] (one trivially-unique "bigram" → ratio 0)
    "q57_repetition" -> repetitionSql,
    "q58_vocabulary" ->
      """SELECT term, COUNT(*) AS n_occurrences,
        |       COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |      FROM documents) t
        |GROUP BY term
        |ORDER BY n_occurrences DESC, term
        |LIMIT 50""".stripMargin,
    "q59_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 10 < (CASE WHEN lang = 'en' THEN 2 ELSE 5 END)""".stripMargin,
    "q60_corpus_report" ->
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |  ${davg("nt")} AS avg_tokens,
         |  ${davg("n_chars")} AS avg_chars,
         |  MAX(n_chars) AS max_chars,
         |  MIN(n_chars) AS min_chars
         |FROM (SELECT lang, source, n_chars,
         |        CAST(len(string_split(text, ' ')) AS INT) AS nt
         |      FROM documents) d
         |GROUP BY lang, source""".stripMargin,
    "q61_compacted_merge" -> latestPerUserType,
    "q62_catalog_sql" -> latestPerUserType,
    "q63_curated_corpus" -> {
      val email = Curation.EmailRe
      val phone = Curation.PhoneRe
      val ip = Curation.Ipv4Re
      s"""WITH q AS ($textQualitySql),
         |r AS ($repetitionSql),
         |l AS ($langIdSql),
         |pii AS (SELECT doc_id,
         |  len(regexp_extract_all(text, '$email', 0)) +
         |  len(regexp_extract_all(text, '$phone', 0)) +
         |  len(regexp_extract_all(text, '$ip', 0)) AS n_pii FROM documents)
         |SELECT d.doc_id, d.lang, q.quality, r.rep_ratio
         |FROM documents d
         |JOIN q ON d.doc_id = q.doc_id
         |JOIN r ON d.doc_id = r.doc_id
         |JOIN l ON d.doc_id = l.doc_id
         |JOIN pii ON d.doc_id = pii.doc_id
         |WHERE q.quality >= 0.5 AND r.rep_ratio <= 0.5
         |  AND l.lang_guess = d.lang AND pii.n_pii = 0""".stripMargin
    },
    "q64_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, MIN(ts_us) AS view_ts FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts_us) AS click_ts
        |      FROM ev e JOIN v ON e.user_id = v.user_id AND e.ts_us >= v.view_ts
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts_us) AS purchase_ts
        |      FROM ev e JOIN c ON e.user_id = c.user_id AND e.ts_us >= c.click_ts
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q65_bucketed_stats" ->
      // the oracle is the plain join+aggregate: bucketing must only change
      // the physical plan (no exchanges), never the result
      s"""SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
         |  ${dsum("o_totalprice")} AS total_spent
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey, c_mktsegment""".stripMargin,
    "q66_top_quality" ->
      s"""WITH q AS ($textQualitySql)
         |SELECT lang, doc_id, rnk FROM (
         |  SELECT d.lang, d.doc_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY d.lang
         |      ORDER BY q.quality DESC, d.doc_id) AS INT) AS rnk
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id) t
         |WHERE rnk <= 3""".stripMargin,
    "q68_shared_spans" ->
      // 8-token sliding windows, distinct per doc (mirrors shingles(k=8)
      // incl. the <8-token [text] fallback); pair = docs sharing a window
      """WITH w AS (
        |  SELECT doc_id, unnest(sp) AS span FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(toks) >= 8
        |           THEN list_distinct(list_transform(range(1, len(toks) - 6),
        |                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
        |                     toks[i+3], toks[i+4], toks[i+5], toks[i+6], toks[i+7])))
        |           ELSE [text] END AS sp
        |    FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        |          FROM documents) b) t)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
        |FROM w a JOIN w b ON a.span = b.span AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id""".stripMargin,
    "q69_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, COUNT(*) AS n,
        |       CAST(COUNT(*) AS DOUBLE) /
        |         CAST(SUM(COUNT(*)) OVER (PARTITION BY from_type) AS DOUBLE) AS share
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type""".stripMargin,
    "q71_stream_rollup" ->
      // stream-at-rest rollup ≡ the one-shot batch aggregate
      s"""SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
         |  COUNT(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q70_freq_terms" ->
      // capacity (256) exceeds the true vocabulary (31 terms), so the
      // Misra-Gries estimates are exact and equal plain counts
      """SELECT term, COUNT(*) AS n_occurrences
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
        |GROUP BY term
        |ORDER BY n_occurrences DESC, term
        |LIMIT 20""".stripMargin,
    "q72_delete_users" ->
      // latest-per-key minus the erased (odd) user ids — deletion must not
      // disturb any surviving row's values
      """SELECT user_id, event_type, ts_us, event_id, value FROM (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1 AND user_id % 2 = 0""".stripMargin,
    "q42_mm_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS media_type,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(doc_id % 640 + 64 AS INT) AS width,
        |  CAST(doc_id % 480 + 48 AS INT) AS height
        |FROM documents""".stripMargin,
    "q73_doc_chunks" ->
      // chunk k covers tokens [k*24, k*24+32): stride 24, size 32, final
      // chunk short; generate_series is inclusive like Spark's sequence
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |e AS (SELECT doc_id, toks,
        |        unnest(range(0, greatest(0, (len(toks) - 32 + 23) // 24) + 1)) AS k
        |      FROM t)
        |SELECT doc_id,
        |  CAST(k AS INT) AS chunk_id,
        |  CAST(k * 24 AS INT) AS chunk_start,
        |  CAST(len(list_slice(toks, k * 24 + 1, k * 24 + 32)) AS INT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, k * 24 + 1, k * 24 + 32), ' ') AS chunk_text
        |FROM e""".stripMargin,
    "q74_domain_mix" ->
      // alpha=0.5 temperature mix, all integer/correctly-rounded steps:
      // w = floor(sqrt(n)), target = floor(budget*w/sum(w)), pick order md5
      """WITH n AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |w AS (SELECT source, CAST(floor(sqrt(n_docs)) AS BIGINT) AS w FROM n),
        |t AS (SELECT source, (200 * w) // (SELECT SUM(w) FROM w) AS target FROM w),
        |r AS (SELECT doc_id, source,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.source, CAST(r.rk AS INT) AS rk
        |FROM r JOIN t USING (source) WHERE rk <= target""".stripMargin,
    "q75_quality_gate" ->
      s"""WITH q AS ($textQualitySql)
         |SELECT doc_id, lang, quality, pr FROM (
         |  SELECT d.doc_id, d.lang, q.quality,
         |    percent_rank() OVER (PARTITION BY d.lang
         |      ORDER BY q.quality, d.doc_id) AS pr
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id) t
         |WHERE pr >= 0.5""".stripMargin,
    "q76_inverted_index" ->
      // postings = first 20 doc ids ascending; n_docs counts all of them
      """WITH p AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents),
        |r AS (SELECT term, doc_id,
        |        ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |      FROM p)
        |SELECT term, COUNT(*) AS n_docs,
        |  string_agg(CASE WHEN rn <= 20 THEN CAST(doc_id AS VARCHAR) END,
        |             ',' ORDER BY doc_id) AS postings
        |FROM r GROUP BY term""".stripMargin,
    "q78_decontaminated" ->
      // train docs minus any train id that near-duplicates (jaccard >= 0.5)
      // a doc in another split — q53's pair set drives the purge
      s"""WITH sh AS ($shingleTable),
         |p AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) q
         |  WHERE jaccard >= 0.5),
         |contam AS (
         |  SELECT a_id AS train_id FROM p
         |  WHERE a_id % 10 < 8 AND b_id % 10 >= 8
         |  UNION ALL
         |  SELECT b_id FROM p
         |  WHERE b_id % 10 < 8 AND a_id % 10 >= 8)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id % 10 < 8
         |  AND doc_id NOT IN (SELECT train_id FROM contam)""".stripMargin,
    "q79_seq_packing" ->
      // contiguous packing per source: doc opens a new pack when its first
      // token would overflow the 256-token context budget
      """SELECT doc_id, source, n_tokens,
        |       CAST((cum - n_tokens) // 256 AS BIGINT) AS pack_id
        |FROM (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
        |           OVER (PARTITION BY source ORDER BY doc_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents) t""".stripMargin,
    "q82_mor_latest" -> latestPerUserType,
    "q83_time_travel" ->
      // the table as of c0: latest per key over the even-id half alone
      """SELECT user_id, event_type, ts_us, event_id, value FROM (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_id % 2 = 0) t WHERE rn = 1""".stripMargin,
    "q81_label_centroids" ->
      // per-(label, dimension) mean through exact decimal(28,6): a float's
      // promoted double never sits on a decimal rounding boundary
      // (boundaries are non-dyadic), so both engines round identically
      """WITH e AS (
        |  SELECT label, embedding,
        |         unnest(range(1, len(embedding) + 1)) AS i
        |  FROM embeddings)
        |SELECT label, CAST(i - 1 AS INT) AS dim,
        |  CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE)
        |    / COUNT(*) AS centroid
        |FROM e GROUP BY label, i""".stripMargin,
    "q80_token_ids" ->
      // top-20 frequency-ranked vocabulary (1-based; rank by count desc,
      // term asc), documents as comma-joined id sequences, OOV -> 0
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (
        |  SELECT doc_id, i, toks[i] AS term
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t) e),
        |cnt AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
        |voc AS (SELECT term,
        |          ROW_NUMBER() OVER (ORDER BY n DESC, term) AS token_id
        |        FROM cnt)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
        |  string_agg(
        |    CAST(COALESCE(CASE WHEN token_id <= 20 THEN token_id END, 0) AS VARCHAR),
        |    ',' ORDER BY i) AS token_ids
        |FROM tok LEFT JOIN voc USING (term)
        |GROUP BY doc_id""".stripMargin,
    "q77_common_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |cnt AS (SELECT term, COUNT(*) AS term_freq FROM tok GROUP BY term)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
        |  CAST(SUM(CAST(term_freq AS DECIMAL(18,4))) AS DOUBLE) / COUNT(term_freq)
        |    AS avg_term_freq
        |FROM tok JOIN cnt USING (term) GROUP BY doc_id""".stripMargin,
    "q84_cooccurrence" ->
      // document-level co-occurrence over the top-30 doc-frequency vocab;
      // PMI's sufficient statistics as exact integer counts
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |df AS (SELECT term, COUNT(*) AS n_docs FROM tok GROUP BY term),
        |voc AS (SELECT term, n_docs FROM (
        |    SELECT term, n_docs,
        |           ROW_NUMBER() OVER (ORDER BY n_docs DESC, term) AS r
        |    FROM df) t WHERE r <= 30),
        |dv AS (SELECT t.doc_id, t.term, v.n_docs
        |       FROM tok t JOIN voc v ON t.term = v.term)
        |SELECT a.term AS term_a, b.term AS term_b,
        |       a.n_docs AS n_a, b.n_docs AS n_b, COUNT(*) AS n_both
        |FROM dv a JOIN dv b
        |  ON a.doc_id = b.doc_id AND a.term < b.term
        |GROUP BY 1, 2, 3, 4""".stripMargin,
    "q85_quality_deciles" ->
      // per-lang ntile(10) on the exact quality score (doc_id tiebreak)
      s"""WITH q AS ($textQualitySql),
         |r AS (
         |  SELECT d.lang, q.quality, d.n_chars,
         |         CAST(ntile(10) OVER (
         |           PARTITION BY d.lang
         |           ORDER BY q.quality, d.doc_id) AS INT) AS decile
         |  FROM q JOIN documents d ON q.doc_id = d.doc_id)
         |SELECT lang, decile, COUNT(*) AS n_docs,
         |       MIN(quality) AS min_quality, MAX(quality) AS max_quality,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM r GROUP BY lang, decile""".stripMargin,
    "q86_group_sample" ->
      // hash-order sample: zero-padded lowercase hex makes lexicographic
      // DESC on the md5 prefix identical to Spark's 52-bit numeric DESC
      """SELECT lang, doc_id, rnk FROM (
        |  SELECT lang, doc_id, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY lang
        |    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) DESC,
        |             doc_id) AS INT) AS rnk
        |  FROM documents) t WHERE rnk <= 20""".stripMargin,
    "q87_oov_stats" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |cnt AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
        |voc AS (SELECT term FROM (
        |    SELECT term, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS r
        |    FROM cnt) t WHERE r <= 20)
        |SELECT t.doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS INT)
        |    AS n_oov,
        |  CAST(COUNT(DISTINCT CASE WHEN v.term IS NULL THEN t.term END) AS INT)
        |    AS n_oov_distinct
        |FROM tok t LEFT JOIN voc v ON t.term = v.term
        |GROUP BY t.doc_id""".stripMargin,
    // clustering rewrites layout only: read-back ≡ the two-commit merge
    "q88_clustered_merge" -> latestPerUserType,
    // z-order rewrites layout only: read-back ≡ the two-commit merge
    "q92_zorder_merge" -> latestPerUserType,
    "q93_stream_attribution" ->
      // streamed interval join ≡ the batch join: time-ordered replay keeps
      // every needed click inside the state-eviction horizon
      """SELECT c.user_id, c.c_ts_us, c.c_id, p.p_ts_us, p.p_id
        |FROM (SELECT user_id, epoch_us(ts) AS c_ts_us, event_id AS c_id
        |      FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id AS p_user, epoch_us(ts) AS p_ts_us,
        |             event_id AS p_id
        |      FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.p_user
        | AND p.p_ts_us >= c.c_ts_us
        | AND p.p_ts_us <= c.c_ts_us + 86400000000""".stripMargin,
    "q94_media_decode" ->
      // REAL PNG/WAV decode on the Spark side; pixel/sample content is a
      // deterministic function of doc_id, so the decoded features are
      // closed-form: PNG and PCM round-trip losslessly and each mean is
      // an integer sum divided by 256 (exact in a double)
      """WITH i AS (SELECT unnest(range(0, 256)) AS i),
        |ia AS (SELECT d.doc_id,
        |         AVG(CAST((d.doc_id*7 + i.i) % 256 AS DOUBLE)) AS mean_r,
        |         AVG(CAST((d.doc_id*13 + i.i*3) % 256 AS DOUBLE)) AS mean_g,
        |         AVG(CAST((d.doc_id*5 + i.i*11) % 256 AS DOUBLE)) AS mean_b
        |       FROM documents d, i WHERE d.doc_id % 3 = 0 GROUP BY d.doc_id),
        |aa AS (SELECT d.doc_id,
        |         AVG(ABS(CAST((d.doc_id*31 + i.i*17) % 65536 - 32768 AS DOUBLE)))
        |           AS mean_abs
        |       FROM documents d, i WHERE d.doc_id % 3 = 1 GROUP BY d.doc_id)
        |SELECT doc_id, 'image/png' AS media_type, 'width' AS feature, 16.0 AS value FROM ia
        |UNION ALL SELECT doc_id, 'image/png', 'height', 16.0 FROM ia
        |UNION ALL SELECT doc_id, 'image/png', 'mean_r', mean_r FROM ia
        |UNION ALL SELECT doc_id, 'image/png', 'mean_g', mean_g FROM ia
        |UNION ALL SELECT doc_id, 'image/png', 'mean_b', mean_b FROM ia
        |UNION ALL SELECT doc_id, 'audio/wav', 'n_samples', 256.0 FROM aa
        |UNION ALL SELECT doc_id, 'audio/wav', 'mean_abs', mean_abs FROM aa""".stripMargin,
    "q95_gif_frames" ->
      // REAL multi-frame decode: every doc carries an animated GIF of
      // (doc_id % 3 + 2) 8×8 grayscale frames; frame f pixel i holds
      // (id·7 + f·11 + i·3) % 256 over an explicit 256-gray palette, so
      // the container round-trips losslessly and each frame mean is an
      // integer sum over 64 pixels (exact in a double)
      """SELECT d.doc_id, f.range AS frame,
        |       AVG(CAST((d.doc_id*7 + f.range*11 + i.range*3) % 256 AS DOUBLE))
        |         AS mean_gray
        |FROM documents d
        |JOIN range(0, 4) f ON f.range < d.doc_id % 3 + 2
        |CROSS JOIN range(0, 64) i
        |GROUP BY d.doc_id, f.range""".stripMargin,
    "q96_para_dedup" ->
      // C4-style segment dedup: non-overlapping 10-word windows; a
      // segment occurrence is a dup if the same text first appeared in a
      // lower-id doc. Both engines key segments by md5
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |p AS (SELECT doc_id,
        |        md5(array_to_string(
        |          list_slice(words, pos*10+1, pos*10+10), ' ')) AS pk
        |      FROM (SELECT doc_id, words,
        |                   unnest(range(0, (len(words)+9)//10)) AS pos
        |            FROM d)),
        |m AS (SELECT pk, min(doc_id) AS first_doc FROM p GROUP BY pk)
        |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_segs,
        |       CAST(sum(CASE WHEN m.first_doc < p.doc_id THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_dup_segs
        |FROM p JOIN m USING (pk) GROUP BY p.doc_id""".stripMargin,
    "q97_edit_dedup" ->
      // character-Levenshtein fuzzy dedup within language; PassJoin
      // segment blocking is invisible in the output (it is an exact
      // candidate superset — pigeonhole on τ+1 segments — and every
      // candidate is re-verified with the true distance). τ=8 is the
      // small-edit noise budget; the fixture's dup pairs sit at ≤4
      // with the nearest non-dup at 26+
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        | AND abs(a.n_chars - b.n_chars) <= 8
        |WHERE levenshtein(a.text, b.text) <= 8""".stripMargin,
    "q98_similar_neighbors" ->
      // thresholded knn join (nprobe=8 < nlist=64 — the sublinear IVF
      // knob, calibrated exact: max symmetric probe rank of a >=0.46
      // pair is 6, margins in graft.Calibrate). Threshold float safety:
      // nearest cosines are 0.459667 / 0.466641, far beyond DuckDB's
      // float32 error; ids and ranks only, like q41.
      """SELECT a_id, b_id, rnk FROM (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
        |                    b.vec_id) AS INT) AS rnk
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.46) t
        |WHERE rnk <= 5""".stripMargin,
    "q99_mp4_meta" ->
      // the Spark side PARSES real ISO-BMFF boxes (brand from ftyp,
      // duration/timescale from mvhd, trak count from moov, total bytes
      // from the walk); the oracle recomputes the same values from the
      // fixture's closed forms (timescale 1000 => ticks = ms; fixed v0
      // box layouts => 148 + 100*tracks + doc_id%50 bytes)
      """SELECT doc_id, 'isom' AS brand,
        |  CAST((doc_id * 37) % 60000 + 1000 AS BIGINT) AS duration_ms,
        |  CAST(doc_id % 3 + 1 AS INT) AS n_tracks,
        |  CAST(148 + (doc_id % 3 + 1) * 100 + doc_id % 50 AS INT) AS n_bytes
        |FROM documents""".stripMargin,
    "q100_shared_runs" ->
      // maximal shared verbatim runs per directed doc pair: windows of 8
      // consecutive words keyed by position; positions of a's windows
      // that appear anywhere in b merge into runs via gaps-and-islands
      // (pos - row_number constant within a run). Docs shorter than 8
      // words contribute their whole text as the single window at pos 0
      // (the Spark shingle contract); the window bound derives from the
      // corpus's own max length, not a fixed cap
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS words
        |           FROM documents),
        |w AS (
        |  SELECT doc_id, pos,
        |         array_to_string(list_slice(words, pos + 1, pos + 8), ' ') AS win
        |  FROM (SELECT doc_id, words,
        |               unnest(range(0, greatest(len(words) - 7, 0))) AS pos
        |        FROM d)
        |  UNION ALL
        |  SELECT doc_id, 0 AS pos, text AS win FROM d WHERE len(words) < 8),
        |sh AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.b_id, a.pos
        |  FROM w a JOIN (SELECT DISTINCT doc_id AS b_id, win FROM w) b
        |    ON a.win = b.win AND a.doc_id <> b.b_id),
        |r AS (
        |  SELECT a_id, b_id, pos,
        |         pos - ROW_NUMBER() OVER (PARTITION BY a_id, b_id ORDER BY pos) AS grp
        |  FROM sh),
        |runs AS (SELECT a_id, b_id, grp, count(*) AS r_len
        |         FROM r GROUP BY a_id, b_id, grp)
        |SELECT a_id, b_id, CAST(count(*) AS BIGINT) AS n_runs,
        |       CAST(max(r_len) + 7 AS BIGINT) AS max_run_tokens
        |FROM runs GROUP BY a_id, b_id""".stripMargin,
    "q101_stream_restart" ->
      // append-sink restart ingest: the table holds every event exactly
      // once only if the restarted query resumed from the checkpoint
      // instead of replaying phase-1 files (a replay would duplicate
      // rows and fail this exact-set comparison)
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |FROM events""".stripMargin,
    "q108_audio_frames" ->
      // REAL WAV decode framed at 64 samples: source sample i of doc id
      // is ((id*31 + i*17) % 65536) - 32768 (16-bit signed), so per-frame
      // mean |amplitude| and peak are exact integer arithmetic
      """SELECT d.doc_id, CAST(f.range AS INT) AS frame,
        |  AVG(CAST(abs(((d.doc_id*31 + (f.range*64 + i.range)*17) % 65536) - 32768) AS DOUBLE)) AS mean_abs,
        |  CAST(MAX(abs(((d.doc_id*31 + (f.range*64 + i.range)*17) % 65536) - 32768)) AS INT) AS peak
        |FROM documents d
        |CROSS JOIN range(0, 4) f CROSS JOIN range(0, 64) i
        |WHERE d.doc_id % 3 = 1
        |GROUP BY 1, 2""".stripMargin,
    "q109_negative_pairs" ->
      // the fixed-hash draw is closed-form; the partner fetch is the
      // same inner join on the drawn id
      """WITH n AS (SELECT COUNT(*) AS n FROM documents),
        |d AS (
        |  SELECT doc_id, CAST(j.range AS INT) AS draw,
        |         (doc_id*2654435761 + j.range*40503) % (SELECT n FROM n) AS raw
        |  FROM documents CROSS JOIN range(1, 5) j),
        |p AS (
        |  SELECT doc_id, draw,
        |         CASE WHEN raw = doc_id THEN (raw + 1) % (SELECT n FROM n)
        |              ELSE raw END AS neg_id
        |  FROM d)
        |SELECT p.doc_id, p.draw, p.neg_id,
        |       CAST(len(t.text) AS INT) AS neg_len
        |FROM p JOIN documents t ON t.doc_id = p.neg_id""".stripMargin,
    "q102_image_resize" ->
      // REAL box-filter resize of the REAL PNG fixture (16×16 → 4×4):
      // output pixel (bx,by) = mean of its 4×4 block; source pixel i
      // (row-major) has r=(id·7+i)%256, g=(id·13+i·3)%256,
      // b=(id·5+i·11)%256, so each mean is an exact integer sum / 16
      """SELECT d.doc_id, CAST(bx.range AS INT) AS bx, CAST(by.range AS INT) AS by,
        |  AVG(CAST((d.doc_id*7 + ((by.range*4+rr.range)*16 + bx.range*4+cc.range)) % 256 AS DOUBLE)) AS mean_r,
        |  AVG(CAST((d.doc_id*13 + ((by.range*4+rr.range)*16 + bx.range*4+cc.range)*3) % 256 AS DOUBLE)) AS mean_g,
        |  AVG(CAST((d.doc_id*5 + ((by.range*4+rr.range)*16 + bx.range*4+cc.range)*11) % 256 AS DOUBLE)) AS mean_b
        |FROM documents d
        |CROSS JOIN range(0, 4) bx CROSS JOIN range(0, 4) by
        |CROSS JOIN range(0, 4) rr CROSS JOIN range(0, 4) cc
        |WHERE d.doc_id % 3 = 0
        |GROUP BY 1, 2, 3""".stripMargin,
    "q103_embed_gram" ->
      // fixed-point gram matrix: q = ⌊100·x⌋ per dimension (float→double
      // widening exact, one IEEE multiply + floor bit-identical across
      // engines), integer pair-product sums — exactly associative, so
      // any partitioning matches this serial SQL bit-for-bit
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS qe
        |  FROM embeddings),
        |pr AS (
        |  SELECT i.range AS i, j.range AS j, qe[i.range + 1] * qe[j.range + 1] AS p
        |  FROM q CROSS JOIN range(0, 64) i CROSS JOIN range(0, 64) j
        |  WHERE j.range >= i.range)
        |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |       CAST(sum(p) AS BIGINT) AS gram
        |FROM pr GROUP BY i, j""".stripMargin,
    "q104_dpp_revenue" ->
      // dynamic partition pruning is pure I/O elision: the pruned
      // partitioned-fact join ≡ this unpartitioned semi-join; revenue
      // through the shared exact-decimal sum
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |WHERE year(o_orderdate) IN (
        |  SELECT DISTINCT year(o_orderdate) FROM orders
        |  WHERE o_totalprice > 499000.0)
        |GROUP BY 1""".stripMargin,
    "q89_restored_merge" ->
      // restore to c0 drops c1's versions: read ≡ time travel to c0
      """SELECT user_id, event_type, ts_us, event_id, value FROM (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_id % 2 = 0) t WHERE rn = 1""".stripMargin,
    "q90_pruned_range" ->
      // stats pruning is pure I/O elision: ≡ full merge + range filter;
      // bounds are integer arithmetic over the events' own min/max
      """WITH b AS (
        |  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        |  FROM events)
        |SELECT user_id, event_type, ts_us, event_id, value FROM (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) t, b
        |WHERE rn = 1
        |  AND ts_us >= mx - (mx - mn) // 20
        |  AND ts_us <= mx""".stripMargin,
    "q91_change_feed" ->
      // c1's versions (latest odd event per key — in-batch precombine)
      // tagged insert/update by whether c0 saw the (user, partition) key
      """WITH c0 AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE event_id % 2 = 0),
        |c1 AS (
        |  SELECT user_id, event_type, ts_us, event_id, value FROM (
        |    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |    FROM events WHERE event_id % 2 = 1) t WHERE rn = 1)
        |SELECT c1.user_id, c1.event_type, c1.ts_us, c1.event_id, c1.value,
        |       CASE WHEN c0.user_id IS NOT NULL THEN 'update' ELSE 'insert' END AS op
        |FROM c1 LEFT JOIN c0
        |  ON c1.user_id = c0.user_id AND c1.event_type = c0.event_type""".stripMargin,
    // Grouped resolved aggregate over a clustered DATA column: the
    // final state = docs with the %31 correction applied plus the two
    // trap docs' CORRECTED rows (rev 1 wins per doc_id; the superseded
    // zy=9999999 and the zx language must leave no trace).
    "q199_mor_group_data" ->
      """WITH fin AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN lang = 'en' AND doc_id % 5 = 0
        |              THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents
        |  UNION ALL SELECT 900000001, 'zy', 7
        |  UNION ALL SELECT 900000002, 'de', 3)
        |SELECT lang, min(n_chars) AS mn_nc, max(n_chars) AS mx_nc,
        |       CAST(sum(n_chars) AS BIGINT) AS s_nc,
        |       count(*) AS n_docs
        |FROM fin GROUP BY lang""".stripMargin,
    // Resolved distinct languages over the reconstructed final state
    // (the same fin CTE as q199, langs only): the live trap rows
    // contribute 'zy' and 'de', the superseded-only 'zx' never appears —
    // the oracle DERIVES the trap arithmetic instead of assuming which
    // languages the corpus generator shipped.
    "q200_mor_distinct" ->
      """WITH fin AS (
        |  SELECT lang FROM documents
        |  UNION ALL SELECT 'zy'
        |  UNION ALL SELECT 'de')
        |SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM fin""".stripMargin,
    // Resolved top-k: the 5 globally-largest values were corrected to
    // -1 (derivable in SQL: the same ORDER BY ... LIMIT 5 the fixture
    // ran), so the top-20 comes from the remaining live maxima.
    "q201_mor_topk" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, value FROM events
        |  WHERE event_id % 2 = 0),
        |t5 AS (SELECT event_id FROM ev
        |       ORDER BY value DESC, event_id DESC LIMIT 5),
        |fin AS (
        |  SELECT event_id, user_id,
        |         CASE WHEN event_id IN (SELECT event_id FROM t5)
        |              THEN -1.0 ELSE value END AS value
        |  FROM ev)
        |SELECT event_id, user_id, value FROM fin
        |ORDER BY value DESC, event_id DESC LIMIT 20""".stripMargin,
    // partition-filtered resolved top-k over the corrected history
    // fixture: same reconstruction as q195 with the partition filter,
    // sort, and limit applied on the resolved state (user_id is unique
    // within a partition, so the limit is deterministic)
    "q203_mor_topk_part" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |         value
        |  FROM events WHERE event_id % 2 = 0),
        |b AS (SELECT min(user_id) + (max(user_id) - min(user_id)) // 16 AS cut
        |      FROM base),
        |allv AS (
        |  SELECT user_id, event_type, ts_us, event_id, value FROM base
        |  UNION ALL
        |  SELECT user_id, event_type, ts_us + 1000000, event_id, value
        |  FROM base, b WHERE user_id <= b.cut),
        |win AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM allv)
        |SELECT user_id, event_type, ts_us, event_id, value
        |FROM win WHERE rn = 1 AND event_type = 'click'
        |ORDER BY user_id ASC LIMIT 20""".stripMargin,
    // filtered resolved distinct: the q199 reconstruction with the
    // range applied on the final state — both trap docs' live rows
    // (n_chars 7 and 3) fall OUTSIDE the bounds, so the filter drops
    // the live 'zy' too
    "q204_mor_distinct_filtered" ->
      """WITH fin AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN lang = 'en' AND doc_id % 5 = 0
        |              THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents
        |  UNION ALL SELECT 900000001, 'zy', 7
        |  UNION ALL SELECT 900000002, 'de', 3)
        |SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM fin WHERE n_chars BETWEEN 200 AND 1000000""".stripMargin,
    // resolved DISTINCT value set: base langs plus the live trap 'zy';
    // the superseded-only 'zx' must be absent
    "q205_mor_distinct_set" ->
      """SELECT DISTINCT lang FROM (
        |  SELECT lang FROM documents
        |  UNION ALL SELECT 'zy') t""".stripMargin,
    // IN-filtered resolved top-k: q199's reconstruction with the lang
    // filter, sort, and limit on the final state (doc_id tiebreak makes
    // the set deterministic)
    "q206_mor_topk_lang" ->
      """WITH fin AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN lang = 'en' AND doc_id % 5 = 0
        |              THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents
        |  UNION ALL SELECT 900000001, 'zy', 7
        |  UNION ALL SELECT 900000002, 'de', 3)
        |SELECT doc_id, lang, n_chars FROM fin
        |WHERE lang IN ('en', 'de')
        |ORDER BY n_chars DESC, doc_id DESC LIMIT 15""".stripMargin,
    // grouped resolved top-k: the per-language leaderboard over the
    // cohort-churned final state (the 'en' re-crawl adds 1000 to every
    // 5th en doc) — the 'zy' row must rank with its LIVE n_chars
    // (7, not the superseded 9999999)
    "q207_mor_group_topk" ->
      """WITH fin AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN lang = 'en' AND doc_id % 5 = 0
        |              THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents
        |  UNION ALL SELECT 900000001, 'zy', 7
        |  UNION ALL SELECT 900000002, 'de', 3),
        |win AS (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY n_chars DESC, doc_id DESC) AS rk
        |  FROM fin)
        |SELECT doc_id, lang, n_chars, CAST(rk AS INT) AS rk
        |FROM win WHERE rk <= 5""".stripMargin,
    // star join over the resolved history fact: the watched keys joined
    // against the reconstructed final state (the %37 corrections plus
    // the explicitly-corrected min watched key, all priced -1)
    "q208_mor_star_join" ->
      """WITH w AS (
        |  SELECT o_orderkey AS wk FROM orders WHERE o_orderkey % 1201 = 1),
        |m AS (SELECT min(wk) AS mk FROM w),
        |fin AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 37 = 0
        |                OR o_orderkey = (SELECT mk FROM m)
        |              THEN -1.0 ELSE o_totalprice END AS o_totalprice
        |  FROM orders)
        |SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
        |FROM fin f JOIN w ON f.o_orderkey = w.wk""".stripMargin,
    // filtered leaderboard: rank per language AMONG docs in the
    // mid-length band (the eligibility filter applies before ranking)
    "q209_group_topk_filtered" ->
      """WITH b AS (SELECT min(n_chars) + (max(n_chars) - min(n_chars)) // 4 AS lo,
        |                  max(n_chars) - (max(n_chars) - min(n_chars)) // 4 AS hi
        |           FROM documents),
        |win AS (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY n_chars DESC, doc_id DESC) AS rk
        |  FROM documents, b WHERE n_chars >= b.lo AND n_chars <= b.hi)
        |SELECT doc_id, lang, n_chars, CAST(rk AS INT) AS rk
        |FROM win WHERE rk <= 10""".stripMargin,
    // filtered grouped resolved top-k: the filter applies to the
    // reconstructed final state before ranking — the live 'zy' row
    // (7 chars) is ineligible so its group vanishes, while the dead
    // 9999999 version is in range and must still never surface
    "q210_mor_group_topk_filtered" ->
      """WITH fin AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN lang = 'en' AND doc_id % 5 = 0
        |              THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents
        |  UNION ALL SELECT 900000001, 'zy', 7
        |  UNION ALL SELECT 900000002, 'de', 3),
        |win AS (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY n_chars DESC, doc_id DESC) AS rk
        |  FROM fin WHERE n_chars >= 200)
        |SELECT doc_id, lang, n_chars, CAST(rk AS INT) AS rk
        |FROM win WHERE rk <= 5""".stripMargin
  )
}
