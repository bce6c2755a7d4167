package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.knnBatch(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. vector-DB core
    "knn_flat_l2" -> (Queries.knnFlatL2 _),
    "knn_flat_ip" -> (Queries.knnFlatIp _),
    "knn_cosine" -> (Queries.knnCosine _),
    "knn_batch" -> (Queries.knnBatch _),
    "knn_batch_ivf" -> (Queries.knnBatchIvf _),
    "knn_join_ivf" -> (Queries.knnJoin _),
    "knn_graph_recall" -> (Queries.knnGraphRecall _),
    "ann_ivf_exact" -> (Queries.annIvfExact _),
    "ann_ivf" -> (Queries.annIvf _),
    "ann_ivf_persisted" -> (Queries.annIvfPersisted _),
    "ann_lsh" -> (Queries.annLsh _),
    "ann_lsh_recall_curve" -> (Queries.annLshRecallCurve _),
    "ann_pq" -> (Queries.annPq _),
    "ann_ivfpq" -> (Queries.annIvfPq _),
    "ann_pq_persisted" -> (Queries.annPqPersisted _),
    "ann_sq8" -> (Queries.annSq8 _),
    "ann_binary" -> (Queries.annBinary _),
    "knn_range" -> (Queries.knnRange _),
    "filtered_knn_eq" -> (Queries.filteredKnnEq _),
    "filtered_ann_ivf" -> (Queries.filteredAnnIvf _),
    "filtered_knn_ne" -> (Queries.filteredKnnNe _),
    "upsert" -> (Queries.upsert _),
    "delete_ids" -> (Queries.deleteIds _),
    "cdc_apply" -> (Queries.cdcApply _),
    "vector_centroids" -> (Queries.vectorCentroids _),
    "vector_centroid_dist" -> (Queries.vectorCentroidDist _),
    "knn_per_label" -> (Queries.knnPerLabel _),
    "knn_classify" -> (Queries.knnClassify _),
    "query_by_id" -> (Queries.queryById _),
    "filter_index_build" -> (Queries.filterIndexBuild _),
    "index_stats" -> (Queries.indexStats _),
    // B. deduplication
    "dedup_exact" -> (Queries.dedupExact _),
    "dedup_minhash" -> (Queries.dedupMinhash _),
    "dedup_simhash" -> (Queries.dedupSimhash _),
    "dedup_ngram_jaccard" -> (Queries.dedupNgramJaccard _),
    "dedup_jaccard_prefix" -> (Queries.dedupJaccardPrefix _),
    "dedup_winnow" -> (Queries.dedupWinnow _),
    "dedup_recall_eval" -> (Queries.dedupRecallEval _),
    "dedup_clusters" -> (Queries.dedupClusters _),
    "dedup_embedding" -> (Queries.dedupEmbedding _),
    "dedup_incremental" -> (Queries.dedupIncremental _),
    // C. text analysis / retrieval
    "text_langid" -> (Queries.textLangid _),
    "text_quality" -> (Queries.textQuality _),
    "text_tokens" -> (Queries.textTokens _),
    "text_fingerprint" -> (Queries.textFingerprint _),
    "text_repetition" -> (Queries.textRepetition _),
    "bm25_topk" -> (Queries.bm25TopK _),
    "hybrid_rrf" -> (Queries.hybridRrf _),
    // C2. corpus preparation
    "corpus_split" -> (Queries.corpusSplit _),
    "corpus_vocab" -> (Queries.corpusVocab _),
    "corpus_clean" -> (Queries.corpusClean _),
    "corpus_sample" -> (Queries.corpusSample _),
    "pack_sequences" -> (Queries.packSequences _),
    "corpus_stats" -> (Queries.corpusStats _),
    "corpus_quantiles" -> (Queries.corpusQuantiles _),
    "corpus_normalize" -> (Queries.corpusNormalize _),
    "corpus_chunk" -> (Queries.corpusChunk _),
    "corpus_decontaminate" -> (Queries.corpusDecontaminate _),
    "corpus_tfidf" -> (Queries.corpusTfidf _),
    "corpus_bigram_lm" -> (Queries.corpusBigramLm _),
    "corpus_lm_score" -> (Queries.corpusLmScore _),
    "corpus_textrank" -> (Queries.corpusTextrank _),
    "corpus_pipeline" -> (Queries.corpusPipeline _),
    // D. multimodal
    "multimodal_meta" -> (Queries.multimodalMeta _),
    "multimodal_frames" -> (Queries.multimodalFrames _),
    "multimodal_embed" -> (Queries.multimodalEmbed _),
    "multimodal_neardup" -> (Queries.multimodalNeardup _),
    // E. analytics / events
    "q1_agg" -> (Queries.q1Agg _),
    "q3_shipping" -> (Queries.q3Shipping _),
    "q5_local" -> (Queries.q5Local _),
    "q6_forecast" -> (Queries.q6Forecast _),
    "q14_promo" -> (Queries.q14Promo _),
    "q18_large" -> (Queries.q18Large _),
    "q4_priority" -> (Queries.q4Priority _),
    "q7_volume" -> (Queries.q7Volume _),
    "q8_share" -> (Queries.q8Share _),
    "q9_profit" -> (Queries.q9Profit _),
    "q13_distribution" -> (Queries.q13Distribution _),
    "q15_top_supplier" -> (Queries.q15TopSupplier _),
    "q17_small_qty" -> (Queries.q17SmallQty _),
    "q19_disjunctive" -> (Queries.q19Disjunctive _),
    "q22_global" -> (Queries.q22Global _),
    "events_salted_join" -> (Queries.eventsSaltedJoin _),
    "events_markov" -> (Queries.eventsMarkov _),
    "q10_returns" -> (Queries.q10Returns _),
    "events_hll" -> (Queries.eventsHll _),
    "events_bloom" -> (Queries.eventsBloom _),
    "events_cms" -> (Queries.eventsCms _),
    "table_profile" -> (Queries.tableProfile _),
    "events_histogram" -> (Queries.eventsHistogram _),
    "events_stratified" -> (Queries.eventsStratified _),
    "events_windowed" -> (Queries.eventsWindowed _),
    "events_windowed_merge" -> (Queries.eventsWindowedMerge _),
    "events_hopping" -> (Queries.eventsHopping _),
    "events_resample" -> (Queries.eventsResample _),
    "layout_zorder" -> (Queries.layoutZorder _),
    "events_topn" -> (Queries.eventsTopN _),
    "events_sessionize" -> (Queries.eventsSessionize _),
    "events_salted_agg" -> (Queries.eventsSaltedAgg _),
    "events_funnel" -> (Queries.eventsFunnel _),
    "events_retention" -> (Queries.eventsRetention _),
    "events_asof" -> (Queries.eventsAsof _),
    "events_session_attr" -> (Queries.eventsSessionAttr _),
    "events_anomaly" -> (Queries.eventsAnomaly _),
    "events_heavy_hitters" -> (Queries.eventsHeavyHitters _),
    "events_scd2" -> (Queries.eventsScd2 _),
    "events_rollup" -> (Queries.eventsRollup _),
    "events_ttest" -> (Queries.eventsTtest _),
    "events_pivot" -> (Queries.eventsPivot _),
    "events_moving_avg" -> (Queries.eventsMovingAvg _),
    "ann_recall_eval" -> (Queries.annRecallEval _),
    "ann_recall_curve" -> (Queries.annRecallCurve _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Oracles.sql.filter { case (k, _) => queries.contains(k) }
}
