package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AsOf, Corpus, Dedup, Events, Graph, Profiling, RangeJoin, Relational, Sampling, Similarity, TextOps}
import graft.multimodal.Multimodal
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory made executable: one entry per
  * implemented operator (SURVEY.md §2 + the training-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent for every SQL-expressible one.
  * Probabilistic operators (MinHash LSH, sign-LSH ANN, SimHash, heuristic
  * language ID) are rows-only here and verified statistically in ScalaTest
  * (recall/precision against their exact counterparts).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03RevenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Map[String, (SparkSession, String) => DataFrame](
      // reference applications, engine path + declarative path
      "wc_maple_juice"    -> (TextOps.wcMapleJuice _),
      "wc_dataframe"      -> (TextOps.wcDataFrame _),
      "wc_maple_juice_agg" -> (TextOps.wcMapleJuiceAggregated _),
      "rwlg_maple_juice"  -> (TextOps.rwlgMapleJuice _),
      "rwlg_dataframe"    -> (TextOps.rwlgDataFrame _),
      // text analysis
      "text_token_stats"  -> (TextOps.tokenStats _),
      "text_chunks"       -> (TextOps.chunkDocuments _),
      "text_bpe_tokens"   -> (TextOps.bpeTokens _),
      "text_bpe_merges"   -> (TextOps.bpeMergeCandidates _),
      "text_quality_score" -> (TextOps.qualityScore _),
      "text_quality_filter" -> (TextOps.qualityQuantileFilter _),
      "text_gopher_rules" -> (TextOps.gopherRules _),
      "text_fingerprint"  -> (TextOps.fingerprint _),
      "text_winnow_fingerprints" -> (TextOps.winnowFingerprints _),
      "dedup_winnow_candidates"  -> (TextOps.winnowCandidates _),
      "text_langid"       -> (TextOps.langId _),
      "text_redact_pii"   -> ((s, d) => TextOps.redactPii(s, d)),
      "text_blocklist_filter" -> (TextOps.blocklistFilter _),
      "text_repetition"   -> (TextOps.repetitionSignals _),
      // corpus provenance / mixture layer
      "text_source_stats"    -> (Corpus.sourceStats _),
      "train_mix_weights"    -> (Corpus.mixWeights _),
      "text_tfidf_top_terms" -> (Corpus.tfidfTopTerms _),
      "text_lm_bits"         -> (Corpus.lmBits _),
      "train_dsir_weights"   -> (Corpus.dsirWeights _),
      "text_nb_quality"      -> (Corpus.nbQuality _),
      "dedup_cross_source"   -> (Corpus.crossSourceOverlap _),
      "text_ccnet_buckets"   -> (Corpus.ccnetBuckets _),
      "text_bm25_topk"       -> (Corpus.bm25TopK _),
      "train_token_budget"   -> (Corpus.tokenBudget _),
      "train_sampling_temperature" -> (Corpus.samplingTemperature _),
      // link-graph analytics
      "graph_pagerank"       -> (Graph.pageRank _),
      "graph_triangles"      -> (Graph.triangleCounts _),
      "orders_basket_rules"  -> (Graph.basketRules _),
      // batch event analytics
      "events_funnel"        -> (Events.eventFunnel _),
      "events_retention"     -> (Events.retentionCohorts _),
      "events_anomaly"       -> (Events.anomalyWindows _),
      "events_transitions"   -> (Events.typeTransitions _),
      // deduplication
      "dedup_exact"          -> (Dedup.exactDedup _),
      "dedup_ngram_jaccard"  -> (Dedup.ngramJaccardPairs _),
      "dedup_clusters"       -> (Dedup.dedupClusters _),
      "dedup_minhash_lsh"    -> ((s, d) => Dedup.minhashLshPairs(s, d)),
      "dedup_simhash"        -> (Dedup.simhashPairs _),
      "dedup_embedding_cosine" -> (Dedup.embeddingPairs _),
      "dedup_keep_list"        -> (Dedup.keepList _),
      "dedup_contamination"    -> (Dedup.contamination _),
      "dedup_contamination_bloom" -> (Dedup.bloomContamination _),
      "dedup_contamination_fuzzy" -> (Dedup.fuzzyContamination _),
      "dedup_contamination_semantic" -> (Dedup.semanticContamination _),
      "dedup_ingest_batch"     -> (Dedup.ingestBatchDedup _),
      "dedup_duplicate_spans"  -> (Dedup.duplicateSpans _),
      "dedup_span_clean"       -> (Dedup.spanCleanedDocs _),
      "dedup_paragraphs"       -> (Dedup.paragraphDedup _),
      "dedup_soft_weights"     -> (Dedup.softDedupWeights _),
      "dedup_keep_best"        -> (Dedup.keepBest _),
      // similarity search
      "ann_brute_topk" -> (Similarity.annBruteTopK _),
      "ann_lsh_topk"   -> (Similarity.annLshTopK _),
      "ann_ivf_topk"   -> (Similarity.annIvfTopK _),
      "ann_pq_topk"    -> (Similarity.annPqTopK _),
      "dedup_semantic" -> (Similarity.semanticDedup _),
      "embed_quantize_int8" -> (Similarity.quantizeStats _),
      "embed_reduce_rp"     -> (Similarity.reduceEmbeddings _),
      "embed_pq_codes"      -> (Similarity.pqCodes _),
      // profiling + merge
      "profile_lineitem" -> (Profiling.profileLineitem _),
      "profile_lineitem_approx" -> (Profiling.profileLineitemApprox _),
      "merge_upsert"     -> (Profiling.mergeUpsert _),
      "audit_integrity"  -> (Profiling.auditIntegrity _),
      "corpus_snapshot_diff" -> (Profiling.snapshotDiff _),
      // dataset curation
      "sample_stratified" -> ((s, d) => Sampling.stratifiedSample(s, d)),
      "train_shards"      -> ((s, d) => Sampling.trainShards(s, d)),
      "train_test_split"  -> (Sampling.trainTestSplit _),
      "train_curriculum_order" -> (Sampling.curriculumOrder _),
      "curation_pipeline" -> ((s, d) => Sampling.curationPipeline(s, d)),
      "pack_sequences"    -> (Sampling.packSequences _),
      // source formats
      "source_jsonl_roundtrip" -> (graft.sources.Writers.jsonlRoundtrip _),
      // multimodal plumbing
      "multimodal_decode_meta" -> (Multimodal.decodeMeta _),
      "multimodal_features"    -> (Multimodal.extractFeatures _),
      "multimodal_resize"      -> (Multimodal.resizePayloads _),
      "multimodal_frame_sample" -> (Multimodal.frameSample _),
      "multimodal_phash_pairs" -> (Multimodal.phashPairs _),
      // as-of + range joins
      "asof_purchase_view" -> (AsOf.purchaseToLastView _),
      "range_join_events"  -> (RangeJoin.errorsNearClicks _),
      // streaming
      "stream_event_windows"    -> (EventStream.runWindowedCountsBatch _),
      "stream_sessionize_batch" -> (EventStream.sessionizeBatchEquivalent _),
      "stream_sessionize_skewres" -> (EventStream.sessionizeSkewResistant _),
      "stream_dedup"            -> (EventStream.streamingDedupBatch _),
      "stream_decontaminate"    -> (EventStream.streamingDecontaminateBatch _),
      "stream_topk_types"       -> (EventStream.runTopKTypesBatch _),
      "stream_funnel"           -> (EventStream.runFunnelUsersBatch _),
      // skew mitigation
      "skew_salted_agg"      -> (graft.core.Skew.saltedAggQuery _),
      "skew_replicated_join" -> (graft.core.Skew.replicatedJoinQuery _),
    )

  def oracleSql: Map[String, String] =
    Relational.oracle ++ Map(
      "wc_maple_juice"   -> TextOps.wcOracle,
      "wc_dataframe"     -> TextOps.wcOracle,
      "wc_maple_juice_agg" -> TextOps.wcOracle,
      "rwlg_maple_juice" -> TextOps.rwlgOracle,
      "rwlg_dataframe"   -> TextOps.rwlgOracle,
      "text_token_stats" -> TextOps.tokenStatsOracle,
      "text_chunks"      -> TextOps.chunkDocumentsOracle,
      "text_bpe_tokens"  -> TextOps.bpeTokensOracle,
      "text_bpe_merges"  -> TextOps.bpeMergeCandidatesOracle,
      "text_quality_score" -> TextOps.qualityScoreOracle,
      "text_quality_filter" -> TextOps.qualityQuantileFilterOracle,
      "text_gopher_rules" -> TextOps.gopherRulesOracle,
      "text_fingerprint" -> TextOps.fingerprintOracle,
      "text_winnow_fingerprints" -> TextOps.winnowFingerprintsOracle,
      "dedup_winnow_candidates"  -> TextOps.winnowCandidatesOracle,
      "text_langid"      -> TextOps.langIdOracle,
      "dedup_simhash"    -> Dedup.simhashPairsOracle,
      "dedup_exact"         -> Dedup.exactDedupOracle,
      "dedup_minhash_lsh"   -> Dedup.minhashLshOracle,
      "dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle,
      "dedup_clusters"      -> Dedup.dedupClustersOracle,
      "dedup_keep_list"     -> Dedup.keepListOracle,
      "text_redact_pii"     -> TextOps.redactPiiOracle,
      "text_repetition"     -> TextOps.repetitionSignalsOracle,
      "text_source_stats"    -> Corpus.sourceStatsOracle,
      "train_mix_weights"    -> Corpus.mixWeightsOracle,
      "text_tfidf_top_terms" -> Corpus.tfidfTopTermsOracle,
      "text_lm_bits"         -> Corpus.lmBitsOracle,
      "train_dsir_weights"   -> Corpus.dsirWeightsOracle,
      "dedup_cross_source"   -> Corpus.crossSourceOverlapOracle,
      "text_ccnet_buckets"   -> Corpus.ccnetBucketsOracle,
      "text_bm25_topk"       -> Corpus.bm25TopKOracle,
      "train_token_budget"   -> Corpus.tokenBudgetOracle,
      "train_sampling_temperature" -> Corpus.samplingTemperatureOracle,
      "graph_pagerank"       -> Graph.pageRankOracle,
      "graph_triangles"      -> Graph.triangleCountsOracle,
      "orders_basket_rules"  -> Graph.basketRulesOracle,
      "events_funnel"        -> Events.eventFunnelOracle,
      "events_retention"     -> Events.retentionCohortsOracle,
      "events_anomaly"       -> Events.anomalyWindowsOracle,
      "events_transitions"   -> Events.typeTransitionsOracle,
      "text_nb_quality"      -> Corpus.nbQualityOracle,
      "text_blocklist_filter" -> TextOps.blocklistFilterOracle,
      "dedup_contamination"  -> Dedup.contaminationOracle,
      "dedup_contamination_bloom" -> Dedup.bloomContaminationOracle,
      "dedup_contamination_fuzzy" -> Dedup.fuzzyContaminationOracle,
      "dedup_contamination_semantic" -> Dedup.semanticContaminationOracle,
      "dedup_ingest_batch"     -> Dedup.ingestBatchDedupOracle,
      "dedup_duplicate_spans" -> Dedup.duplicateSpansOracle,
      "dedup_span_clean"      -> Dedup.spanCleanedDocsOracle,
      "dedup_paragraphs"      -> Dedup.paragraphDedupOracle,
      "dedup_soft_weights"    -> Dedup.softDedupWeightsOracle,
      "dedup_keep_best"       -> Dedup.keepBestOracle,
      "dedup_embedding_cosine" -> Dedup.embeddingPairsOracle,
      "ann_brute_topk" -> Similarity.annBruteTopKOracle,
      "ann_lsh_topk"   -> Similarity.annLshTopKOracle,
      "ann_ivf_topk"   -> Similarity.annIvfTopKOracle,
      "ann_pq_topk"    -> Similarity.annPqTopKOracle,
      "dedup_semantic" -> Similarity.semanticDedupOracle,
      "embed_quantize_int8" -> Similarity.quantizeStatsOracle,
      "embed_reduce_rp"     -> Similarity.reduceEmbeddingsOracle,
      "embed_pq_codes"      -> Similarity.pqCodesOracle,
      "multimodal_features" -> Multimodal.extractFeaturesOracle,
      "profile_lineitem" -> Profiling.profileLineitemOracle,
      "merge_upsert"     -> Profiling.mergeUpsertOracle,
      "audit_integrity"  -> Profiling.auditIntegrityOracle,
      "corpus_snapshot_diff" -> Profiling.snapshotDiffOracle,
      "sample_stratified" -> Sampling.stratifiedSampleOracle,
      "train_shards"      -> Sampling.trainShardsOracle,
      "train_test_split"  -> Sampling.trainTestSplitOracle,
      "train_curriculum_order" -> Sampling.curriculumOrderOracle,
      "curation_pipeline" -> Sampling.curationPipelineOracle,
      "pack_sequences"    -> Sampling.packSequencesOracle,
      "source_jsonl_roundtrip" -> graft.sources.Writers.jsonlRoundtripOracle,
      "multimodal_decode_meta" -> Multimodal.decodeMetaOracle,
      "multimodal_resize"      -> Multimodal.resizePayloadsOracle,
      "multimodal_frame_sample" -> Multimodal.frameSampleOracle,
      "multimodal_phash_pairs" -> Multimodal.phashPairsOracle,
      "asof_purchase_view" -> AsOf.purchaseToLastViewOracle,
      "range_join_events"  -> RangeJoin.errorsNearClicksOracle,
      "stream_event_windows"    -> Relational.oracle("q20_event_windows"),
      "stream_sessionize_batch" -> Relational.oracle("q21_sessionize"),
      "stream_sessionize_skewres" -> Relational.oracle("q21_sessionize"),
      "stream_dedup"            -> EventStream.streamingDedupOracle,
      "stream_topk_types"       -> EventStream.topKTypesOracle,
      "stream_funnel"           -> EventStream.funnelUsersOracle,
      "stream_decontaminate"    -> Dedup.bloomContaminationOracle,
      "skew_salted_agg"         -> graft.core.Skew.saltedAggOracle,
      "skew_replicated_join"    -> graft.core.Skew.replicatedJoinOracle,
    )
}
