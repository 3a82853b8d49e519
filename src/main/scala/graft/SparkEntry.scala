package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
  * exposed as a named query `(SparkSession, sfDir) => DataFrame`, with an
  * equivalent DuckDB SQL oracle where the operator is SQL-expressible.
  * Column names and numeric expression shapes are kept identical on both
  * sides (see graft.functions.Deterministic for the discipline).
  */
object SparkEntry {

  /** Driver-facing decimal → round(double, 6) boundary; see
    * [[graft.functions.Deterministic.doubleBoundary]]. DECIMAL(38,10)
    * parity semantics stay internal (pinned in MedallionSpec). */
  private def dbl(df: DataFrame): DataFrame =
    graft.functions.Deterministic.doubleBoundary(df)

  /** KMV sketch size — shared by the g11 query and its oracle SQL. */
  private val KmvK = 256

  // one lake staging dir per corpus per JVM, shutdown-cleaned (a5
  // overwrites in place on repeated runs instead of leaking /tmp trees)
  private def lakeDir(sfDir: String): String =
    graft.sources.Staging.dir(sfDir, "lake", "graft_lake_")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Medallion.goldMonthlyRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Workload A — financial medallion (SURVEY.md §2.1 S2, §2.4 P1/P5/P9,
    // §2.6 G1-G4)
    "a1_bronze_quotes"       -> ((s, d) => dbl(Medallion.bronze(s, d))),
    "a2_silver_asset_perf"   -> ((s, d) => dbl(Medallion.silverAssetPerf(s, d))),
    "a3_silver_market_trend" -> ((s, d) => dbl(Medallion.silverMarketTrend(s, d))),
    "a4_gold_monthly_rollup" -> ((s, d) => Medallion.goldMonthlyRollup(s, d)),
    "a5_medallion_lake_e2e"  -> ((s, d) => Medallion.lakePipeline(s, d,
      lakeDir(d))),
    // Workload C — incremental load (SURVEY.md §2.5 J1-J4, §2.4 P3/P4/P6/P7,
    // §2.8 U1)
    "c1_changed_rows"        -> ((s, d) => Incremental.changedRows(s, d)),
    "c2_new_rows_leftouter"  -> ((s, d) => Incremental.newRowsLeftOuter(s, d)),
    "c3_new_rows_anti"       -> ((s, d) => Incremental.newRowsAnti(s, d)),
    "c4_upsert"              -> ((s, d) => Incremental.upsert(s, d)),
    "c5_scd2_apply"          -> ((s, d) => Incremental.scd2Apply(s, d)),
    // Workload B — packed-string cleanse (SURVEY.md §2.4 P1/P2/P8,
    // §2.9 F1-F5)
    "b1_listings_cleanse"    -> ((s, d) => Cleanse.listingsCleanse(s, d)),
    // DDL / catalog / sinks (SURVEY.md §2.2 K4-K5, §2.3 D1-D4, §2.1 S4)
    "d1_catalog_roundtrip"   -> ((s, d) => dbl(Ddl.catalogRoundTrip(s, d))),
    "d2_writeto_roundtrip"   -> ((s, d) => dbl(Ddl.writeToRoundTrip(s, d))),
    "d3_ddl_lifecycle"       -> ((s, d) => Ddl.ddlLifecycle(s, d)),
    "d4_bucketed_join"       -> ((s, d) => Ddl.bucketedJoin(s, d)),
    // SQL DDL over the transactional format: CREATE TABLE USING graft,
    // then plain spark.sql SELECT with pushdown + file skipping
    "d5_graft_sql_table"     -> ((s, d) => Ddl.graftSqlTable(s, d)),
    // SQL DML text (MERGE INTO / UPDATE / DELETE FROM) routed to the
    // transactional log by the graft session extension
    "d6_graft_sql_merge"     -> ((s, d) => Ddl.graftSqlMerge(s, d)),
    "d7_graft_sql_update_delete" ->
      ((s, d) => Ddl.graftSqlUpdateDelete(s, d)),
    // SQL maintenance text (OPTIMIZE / VACUUM) via the injected parser
    "d8_graft_sql_maintenance" ->
      ((s, d) => Ddl.graftSqlMaintenance(s, d)),
    // SQL time travel (VERSION AS OF / TIMESTAMP AS OF) + DESCRIBE
    // HISTORY via the parse-time substitution
    "d9_graft_sql_time_travel" ->
      ((s, d) => Ddl.graftSqlTimeTravel(s, d)),
    // CHECK / NOT NULL constraints (ALTER TABLE … ADD CONSTRAINT):
    // write-time enforcement, violating batch rejected whole
    "d10_graft_sql_constraints" ->
      ((s, d) => Ddl.graftSqlConstraints(s, d)),
    // MERGE with WHEN NOT MATCHED BY SOURCE THEN DELETE (SCD close-out:
    // update matched, delete absent, novel source keys ignored — no
    // insert clause)
    "d11_merge_scd_closeout" ->
      ((s, d) => Ddl.graftSqlMergeScd(s, d)),
    // conditional & multi-clause MERGE: ordered WHEN MATCHED AND cond
    // clauses (first-match-wins), column-level UPDATE SET, INSERT *
    "d21_merge_conditional" ->
      ((s, d) => Ddl.graftSqlMergeConditional(s, d)),
    // extra ON conjuncts: key equalities anchor pruning, the extra
    // conjunct gates the match (failed-extra rows insert as dupes)
    "d24_merge_on_extra" ->
      ((s, d) => Ddl.graftSqlMergeOnExtra(s, d)),
    // COPY INTO: idempotent directory ingest (per-file ledger; the
    // second run of the same directory loads zero files/rows)
    "d23_copy_into" ->
      ((s, d) => Ddl.graftSqlCopyInto(s, d)),
    // symlink manifest export: external engines read a consistent
    // snapshot via per-partition manifest files; a post-DELETE
    // auto-refresh is pinned by reading ONLY through the manifest
    "d25_symlink_manifest" ->
      ((s, d) => Ddl.graftSqlSymlinkManifest(s, d)),
    // column DEFAULTs: omitted columns fill from declared constant
    // expressions at write time; supplied values always win
    "d26_column_defaults" ->
      ((s, d) => Ddl.graftSqlColumnDefaults(s, d)),
    // column-level ANALYZE: one-pass KMV ndv + min/max + null counts,
    // log-persisted and pushed to the catalog as CBO statistics
    "d20_analyze_columns" ->
      ((s, d) => Ddl.graftSqlAnalyzeColumns(s, d)),
    // wall-clock snapshot expiry (VACUUM … RETAIN n HOURS / Iceberg
    // expire_snapshots): live snapshot always pinned
    "d12_graft_sql_expire" ->
      ((s, d) => Ddl.graftSqlExpire(s, d)),
    // in-place parquet→graft migration (CONVERT TO DELTA analog): no
    // data rewrite, immediate transactional DML on the converted table
    "d13_graft_sql_convert" ->
      ((s, d) => Ddl.graftSqlConvert(s, d)),
    // named refs (Iceberg tags): VERSION AS OF 'tag' + vacuum pinning
    "d14_graft_sql_tags" ->
      ((s, d) => Ddl.graftSqlTags(s, d)),
    // log-carried TBLPROPERTIES + the delta.appendOnly enforcement
    "d15_tblproperties" ->
      ((s, d) => Ddl.graftSqlProperties(s, d)),
    // SQL INSERT INTO/OVERWRITE routed through the commit log
    "d16_sql_insert" ->
      ((s, d) => Ddl.graftSqlInsert(s, d)),
    // ANALYZE TABLE: rowCount/bytes folded from log metadata, no scan
    "d17_analyze_stats" ->
      ((s, d) => Ddl.graftSqlAnalyze(s, d)),
    // incremental stats refresh: two drift waves past the staleness
    // horizon; the guard folds metadata + merges KMV sketches over new
    // files only — final stats equal a from-scratch ANALYZE
    "d28_stats_refresh" ->
      ((s, d) => Ddl.graftSqlStatsRefresh(s, d)),
    // metadata tables: SHOW PARTITIONS + the files metadata read
    "d18_metadata_tables" ->
      ((s, d) => Ddl.graftMetadataTables(s, d)),
    // managed-table lifecycle: CTAS → log-backed TRUNCATE → INSERT
    "d19_sql_truncate" ->
      ((s, d) => Ddl.graftSqlTruncate(s, d)),
    // CSV scans (SURVEY.md §2.1 S1/S2/S7)
    "s1_csv_roundtrip"       -> ((s, d) => graft.sources.Sources.csvRoundTrip(s, d)),
    "s7_csv_dir_agg"         -> ((s, d) => graft.sources.Sources.csvDirAgg(s, d)),
    "s8_jsonl_roundtrip"     -> ((s, d) => graft.sources.Sources.jsonlRoundTrip(s, d)),
    "s9_orc_roundtrip"       -> ((s, d) => graft.sources.Sources.orcRoundTrip(s, d)),
    // format-by-path scan with delta→parquet degradation (SURVEY.md §2.1 S3),
    // session-factory profile fallback (S5), literal-rows source (S6), and
    // the feature-detected Avro interchange (ref requirements.txt:5,7)
    "s3_format_path_roundtrip" ->
      ((s, d) => graft.sources.Sources.formatPathRoundTrip(s, d)),
    "s5_profile_fallback"    -> ((s, d) => graft.sources.Sources.profileFallback(s, d)),
    "s6_literal_rows"        -> ((s, _) => Incremental.literalRowsPipeline(s)),
    "s10_avro_roundtrip"     -> ((s, d) => graft.sources.Sources.avroRoundTrip(s, d)),
    // Kafka-shaped topic source (ref declares confluent-kafka,
    // mage_demo/requirements.txt:3, but ships no broker): partitioned
    // offset log on parquet with a committed-high-water ledger
    "s11_topic_produce_consume" ->
      ((s, d) => graft.sources.Topic.produceConsume(s, d)),
    // schema-evolving and single-file sinks (SURVEY.md §2.2 K2/K3/K6)
    "k2_merge_schema"        -> ((s, d) => graft.sources.Sinks.mergeSchemaRoundTrip(s, d)),
    "k3_overwrite_schema"    -> ((s, d) => graft.sources.Sinks.overwriteSchemaRoundTrip(s, d)),
    "k6_single_file"         -> ((s, d) => graft.sources.Sinks.singleFileRoundTrip(s, d)),
    // Multi-way star join + multi-dim aggregation (beyond the reference's
    // 2-table joins)
    "j1_star_revenue"        -> ((s, d) => dbl(StarJoin.revenueByNation(s, d))),
    "j3_revenue_rollup"      -> ((s, d) => StarJoin.revenueRollup(s, d)),
    "j4_revenue_pivot"       -> ((s, d) => StarJoin.revenuePivot(s, d)),
    "j8_revenue_cube"        -> ((s, d) => StarJoin.revenueCube(s, d)),
    "j9_window_returns"      -> ((s, d) => Windows.dailyReturns(s, d)),
    "j10_revenue_percentiles" -> ((s, d) => Windows.dailyPercentiles(s, d)),
    "j5_asof_last_view"      -> ((s, d) => AsOf.lastViewBeforeClick(s, d)),
    "j6_session_attach"      -> ((s, d) => Joins.sessionAttach(s, d)),
    "j7_salted_skew_join"    -> ((s, d) => Joins.saltedFlagRollup(s, d)),
    // dynamic partition pruning: the dim-side filter prunes the
    // partitioned fact's dirs at EXECUTION time via a runtime subquery
    "j12_dynamic_partition_pruning" ->
      ((s, d) => Joins.dppFlagRollup(s, d)),
    // star composition: DPP (partitioned fact) + Bloom file skipping
    // (clustered orders) + broadcast dims with parquet pushdown, one plan
    "j13_star_composed" -> ((s, d) => Joins.starComposed(s, d)),
    // storage-partitioned join: both sides hidden-bucketed on custkey,
    // read through the DSv2 graft catalog — the merge join plans with
    // ZERO exchanges (KeyGroupedPartitioning co-partitioning proof)
    "j14_spj_colocated" -> ((s, d) => Joins.spjColocated(s, d)),
    // unkeyed range join via range binning: interval-containment as an
    // equi-join on bin ids + residual filter (vs the nested-loop theta
    // join the oracle runs)
    "j11_binned_range_join"  -> ((s, d) => Joins.errorBurst(s, d)),
    // LLM-pipeline extensions: deduplication (SURVEY.md §7.6)
    "e1_dedup_exact"            -> ((s, d) => Dedup.exact(s, d)),
    // train-vs-eval contamination with BOTH corpora digest-bucketed and
    // read through the SPJ catalog: join AND per-digest count run with
    // zero exchanges — the broadcast-free cross-corpus audit shape
    "e21_contamination_spj" -> ((s, d) => Dedup.contaminationSpj(s, d)),
    "e2_dedup_ngram_jaccard"    -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "e7_dedup_ngram_full"       -> ((s, d) => Dedup.ngramJaccardFull(s, d)),
    "e8_dedup_ppjoin"           -> ((s, d) => Dedup.ppjoin(s, d)),
    "e9_dedup_clusters"         -> ((s, d) => Dedup.dedupClusters(s, d)),
    "e10_dedup_segments"        -> ((s, d) => Dedup.segmentDedup(s, d)),
    "e16_dedup_incremental"     -> ((s, d) => Dedup.incrementalDedup(s, d)),
    // persisted dedup state: digests as a transactional graft table,
    // batches gate on a digest-scan Bloom and append novel digests in
    // one idempotent commit — batch 2 sees batch 1's additions
    "e18_dedup_state_persisted" ->
      ((s, d) => Dedup.dedupStatePersisted(s, d)),
    // O(batch) rolling dedup state: versioned Bloom sidecar (no
    // full-state rebuild per batch) + digest-prefix-partitioned state
    // so the exact probe file-prunes — same replay and oracle as e18
    "e19_dedup_state_scalable" ->
      ((s, d) => DedupState.dedupStateScalable(s, d)),
    // GDPR erasure through the rolling dedup state: prefix-pruned
    // transactional delete + Bloom-sidecar re-mint; erased texts
    // re-admit fresh, untouched verdicts undisturbed
    "e25_dedup_state_erasure" ->
      ((s, d) => DedupState.dedupStateErasure(s, d)),
    // persisted rolling NEAR-dup state: LSH band keys as a graft table
    // with a band-key Bloom sidecar; batch 2's twins of batch 1's novel
    // docs prove the state advanced; verify = signature-est Jaccard on
    // candidate-partition-pruned state rows
    "e20_neardup_state_rolling" ->
      ((s, d) => NearDupState.nearDupStateRolling(s, d)),
    // the staged training-data pipeline composed end-to-end: graft
    // ingest -> exact dedup -> MinHash-LSH near-dup -> quality gate ->
    // mixture sample -> sequence pack, per-stage survivor counts
    // pinned as audit columns
    "e22_training_pipeline"     ->
      ((s, d) => Pipeline.trainingDataPipeline(s, d)),
    // the SAME composition advanced incrementally over arriving bronze
    // commits: per-stage graft state tables (digest set, LSH band
    // index, per-language pack offsets) each ledger-stamped at the
    // absorbed high-water — two waves reproduce the batch answer
    // bit-for-bit, a replayed wave is a per-table ledger no-op
    "e23_training_pipeline_incr" ->
      ((s, d) => Pipeline.trainingDataPipelineIncremental(s, d)),
    // the CURATED incremental pipeline: e23's staged composition plus
    // the eval-contamination gate (g8 broadcast probe shingles) and
    // the per-source frequency cap (g25, incremental form: per-source
    // running admit counts as a state table) — per-wave cost still
    // O(batch)
    "e26_training_pipeline_curated" ->
      ((s, d) => Pipeline.trainingDataPipelineCurated(s, d)),
    "e17_neardup_incremental"   -> ((s, d) => Dedup.incrementalNearDup(s, d)),
    "e3_dedup_minhash_lsh"      -> ((s, d) => Dedup.minhashLsh(s, d)),
    "e4_dedup_simhash"          -> ((s, d) => Dedup.simhash(s, d)),
    "e5_dedup_embedding_cosine" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "e6_dedup_embedding_lsh"    -> ((s, d) => Dedup.embeddingCosineLsh(s, d)),
    "e11_dedup_semantic"        -> ((s, d) => Dedup.semanticDedup(s, d)),
    "e12_dedup_edit_distance"   -> ((s, d) => Dedup.editDistanceDedup(s, d)),
    "e13_dedup_containment"     -> ((s, d) => Dedup.containment(s, d)),
    "e14_dedup_containment_bucketed" ->
      ((s, d) => Dedup.containmentBucketed(s, d)),
    "e15_dedup_substring_spans" ->
      ((s, d) => Dedup.substringSpans(s, d)),
    // the REMOVER half of ExactSubstr: every ≥2-occurrence window keeps
    // its canonical first occurrence (groupBy-min keeper election on
    // the window-hash index), cut everywhere else; per-doc span merge
    // reports exact cut/kept token counts
    "e24_dedup_substring_cut" ->
      ((s, d) => Dedup.substringCut(s, d)),
    // LLM-pipeline extensions: similarity search (SURVEY.md §7.6)
    "f1_knn_bruteforce"      -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "f2_knn_lsh"             -> ((s, d) => Similarity.lshTopK(s, d)),
    "f3_knn_ivf"             -> ((s, d) => Similarity.ivfTopK(s, d)),
    // the persisted-index twin: cells as hive partitions of a graft
    // table, codebook sidecar broadcast, probes = partition pruning
    "f10_knn_ivf_persisted" ->
      ((s, d) => Similarity.ivfIndexedTopK(s, d)),
    "f11_knn_ivf_incremental" ->
      ((s, d) => Similarity.ivfIndexIncrementalTopK(s, d)),
    // erasure-aware index: deleted vectors leave via ONE file-pruned
    // DML commit; answers == a rebuild without them, no torn cells
    "f14_knn_ivf_delete" ->
      ((s, d) => Similarity.ivfIndexDeleteTopK(s, d)),
    // streaming erasure SLA for the index: a topic of deletion
    // requests drained by a checkpointed stream, one ledger-gated
    // deletion-vector commit per micro-batch (kill/resume + full
    // checkpoint-loss redrain both no-op), compaction materializes
    "f15_knn_ivf_erase_stream" ->
      ((s, d) => Similarity.ivfIndexStreamingErasure(s, d)),
    // filtered search: the metadata predicate (same label as the query)
    // applied inside the probed cells, not post-hoc on the ranked answer
    "f12_knn_filtered" ->
      ((s, d) => Similarity.ivfFilteredTopK(s, d)),
    // index maintenance: occupancy audit + threshold-triggered retrain
    // (one Lloyd sweep) after a drifted batch skews the cells
    "f13_knn_ivf_retrain" ->
      ((s, d) => Similarity.ivfRetrainTopK(s, d)),
    "f4_knn_ivf_kmeans"      -> ((s, d) => Similarity.ivfKmeansTopK(s, d)),
    "f5_embedding_quantize"  -> ((s, d) => Similarity.quantizeAudit(s, d)),
    "f8_knn_ivfadc"          -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    // recall@k vs nprobe curve: the IVF quality/cost dial, one row per
    // probed-cell count, monotone to 1.0 at nprobe = nCent
    "f9_knn_recall_curve"    -> ((s, d) => Similarity.ivfRecallCurve(s, d)),
    "f6_knn_quantized"       -> ((s, d) => Similarity.quantizedTopK(s, d)),
    "f7_knn_pq_adc"          -> ((s, d) => Similarity.pqTopK(s, d)),
    // LLM-pipeline extensions: text analysis (SURVEY.md §7.6)
    "g1_token_stats"         -> ((s, d) => TextAnalysis.tokenStats(s, d)),
    "g2_quality_score"       -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "g20_curation_pipeline"  -> ((s, d) => TextAnalysis.curationPipeline(s, d)),
    "g3_lang_id"             -> ((s, d) => TextAnalysis.langId(s, d)),
    "g4_fingerprint"         -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "g5_corpus_stats"        -> ((s, d) => TextAnalysis.corpusStats(s, d)),
    "g13_corpus_stats_sketch" ->
      ((s, d) => TextAnalysis.corpusStatsSketch(s, d, KmvK)),
    "g6_quality_filter"      -> ((s, d) => TextAnalysis.qualityFilter(s, d)),
    "g7_pii_scrub"           -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "g8_contamination"       -> ((s, d) => TextAnalysis.contamination(s, d)),
    // LLM-pipeline extensions: multimodal columns
    "h1_media_metadata"      -> ((s, d) => Multimodal.mediaMetadata(s, d)),
    "h2_media_features"      -> ((s, d) => Multimodal.extractFeatures(s, d)),
    "h3_wav_decode"          -> ((s, d) => Multimodal.wavDecode(s, d)),
    "h4_png_decode"          -> ((s, d) => Multimodal.pngDecode(s, d)),
    "h5_jpeg_decode"         -> ((s, d) => Multimodal.jpegDecode(s, d)),
    "h6_mp4_decode"          -> ((s, d) => Multimodal.mp4Decode(s, d)),
    // Streaming over events (reference declared-but-unbuilt, SURVEY.md
    // §2.10; windowed agg batch+stream share one plan, sessionize in both
    // window-function and flatMapGroupsWithState forms)
    "i1_events_windowed_agg" ->
      ((s, d) => dbl(graft.streaming.Streaming.windowedAggBatch(s, d))),
    "i2_events_windowed_agg_stream" ->
      ((s, d) => dbl(graft.streaming.Streaming.windowedAggStream(s, d))),
    // native session_window aggregation (the declarative sibling of
    // the stateful sessionizer): merged gap windows in ONE shuffle
    "i26_session_window" ->
      ((s, d) => graft.streaming.Streaming.sessionWindowBatch(s, d)),
    "i3_events_sessionize" ->
      ((s, d) => graft.streaming.Streaming.sessionizeBatch(s, d)),
    "i4_events_sessionize_stateful" ->
      ((s, d) => graft.streaming.Streaming.sessionizeStateful(s, d)),
    // stream-static enrichment join + streaming dedup (pipeline ingest
    // shapes beyond the reference's declared-only streaming)
    "i5_events_enrich" ->
      ((s, d) => graft.streaming.Streaming.streamEnrichBatch(s, d)),
    "i6_events_enrich_stream" ->
      ((s, d) => graft.streaming.Streaming.streamEnrich(s, d)),
    "i7_stream_dedup_keys" ->
      ((s, d) => graft.streaming.Streaming.streamDedupKeys(s, d)),
    // the bounded-state twin: dropDuplicatesWithinWatermark evicts each
    // key once the watermark passes; with the finite input inside one
    // window the output equals the exact distinct set (the oracle)
    "i21_stream_dedup_watermark" ->
      ((s, d) => graft.streaming.Streaming.streamDedupKeysBounded(s, d)),
    // stream-stream time-bounded join (click → error funnel)
    "i8_click_error_join" ->
      ((s, d) => graft.streaming.Streaming.clickErrorJoinBatch(s, d)),
    "i9_click_error_join_stream" ->
      ((s, d) => graft.streaming.Streaming.clickErrorJoinStream(s, d)),
    // checkpointed file-sink ingest with kill-and-resume: final aggregate
    // equals the plain batch SQL iff every row landed exactly once
    "i10_restart_exactly_once" ->
      ((s, d) => graft.streaming.Streaming.restartExactlyOnce(s, d)),
    // sliding windows (1h every 30min): each event in exactly 2 windows
    "i11_events_sliding_agg" ->
      ((s, d) => dbl(graft.streaming.Streaming.slidingAggBatch(s, d))),
    "i12_events_sliding_agg_stream" ->
      ((s, d) => dbl(graft.streaming.Streaming.slidingAggStream(s, d))),
    // streaming consume of the Kafka-shaped topic (s11's segment log)
    "i13_topic_consume_stream" ->
      ((s, d) => graft.streaming.Streaming.topicConsumeStream(s, d)),
    // composed ingest: topic → streaming consume → txn append → lake read
    "i14_topic_to_lake_e2e" ->
      ((s, d) => Transactions.topicToLake(s, d)),
    // regex token counting + JSON props extraction
    "g9_token_count_regex" ->
      ((s, d) => TextAnalysis.tokenCountRegex(s, d)),
    "g10_train_val_split" ->
      ((s, d) => TextAnalysis.hashSplit(s, d)),
    "g11_kmv_distinct_tokens" ->
      ((s, d) => TextAnalysis.kmvDistinctTokens(s, d, KmvK)),
    "g12_vocab_topk" ->
      ((s, d) => TextAnalysis.vocabTopK(s, d)),
    // repetition screen, deterministic mixture sampling, sequence packing
    "g14_repetition_stats" ->
      ((s, d) => TextAnalysis.repetitionStats(s, d)),
    "g15_mixture_sample" ->
      ((s, d) => TextAnalysis.mixtureSample(s, d)),
    "g16_sequence_pack" ->
      ((s, d) => TextAnalysis.sequencePack(s, d)),
    // packing with document SPLITTING: every bin but each language's
    // last carries exactly 512 tokens (zero padding waste)
    "g23_sequence_pack_split" ->
      ((s, d) => TextAnalysis.sequencePackSplit(s, d)),
    // token-budgeted quality selection: the quality-ordered prefix per
    // language under a 10k-token budget, with the implied quality bar
    "g24_token_budget_select" ->
      ((s, d) => TextAnalysis.tokenBudgetSelect(s, d)),
    // per-source frequency capping (C4/RefinedWeb host caps): best 10
    // docs per source by quality, via the bounded two-level top-N (no
    // per-source single-task window)
    "g25_source_cap" ->
      ((s, d) => TextAnalysis.sourceCap(s, d)),
    // Count-Min-Sketch token frequency: 4×512 exact counter cells
    // (map-side combined, mergeable), engine-portable bucket hashes;
    // top-20 tokens with exact vs estimated counts
    "g26_cms_token_frequency" ->
      ((s, d) => TextAnalysis.cmsTokenFrequency(s, d)),
    // incrementally maintained CMS: the linear sketch folds signed
    // per-commit CDF deltas (insert/delete/update) bit-identically to
    // a from-scratch rebuild — cells_match_batch pins the linearity,
    // the ledger pins exactly-once; refresh cost = changed docs' tokens
    "g27_cms_incremental" ->
      ((s, d) => TextAnalysis.cmsIncremental(s, d)),
    // corpus drift report: per-commit per-language doc/token deltas
    // from ONE batch CDF read — the dataset-card audit trail; report
    // size O(versions × languages), never a corpus rescan
    "g28_corpus_drift" ->
      ((s, d) => TextAnalysis.corpusDriftReport(s, d)),
    // sliding token windows with overlap (RAG-index / packed-shard prep)
    "g21_chunk_overlap" ->
      ((s, d) => TextAnalysis.chunkOverlap(s, d)),
    // deterministic shard shuffle: hash-sharded pseudo-random global
    // permutation, one exchange + per-shard sort (no total sort)
    "g22_shard_shuffle" ->
      ((s, d) => TextAnalysis.shardShuffle(s, d)),
    // single-pass exact column profiler (null/distinct/range/length stats)
    "g17_column_profile" ->
      ((s, d) => Profile.customerProfile(s, d)),
    // corpus-trained smoothed bigram LM quality score (linear smoothing,
    // engine-portable by construction)
    "g18_bigram_lm_score" ->
      ((s, d) => TextAnalysis.bigramLmScore(s, d)),
    "g19_dsir_importance" ->
      ((s, d) => TextAnalysis.dsirScore(s, d)),
    "j2_json_props" ->
      ((s, d) => SemiStructured.jsonPropsStats(s, d)),
    // Transactional table format (the reference's Delta layer re-expressed
    // as a log-backed parquet protocol — atomic commits, time travel,
    // file-pruned MERGE/DELETE)
    "t1_graftlog_time_travel" -> ((s, d) => Transactions.timeTravelV0(s, d)),
    "t2_graftlog_merge"       -> ((s, d) => Transactions.mergedV1(s, d)),
    "t3_graftlog_delete"      -> ((s, d) => Transactions.afterDelete(s, d)),
    // streaming ingest into the transactional format with kill/replay/
    // resume: the (appId, batchId) ledger makes re-delivered batches
    // no-ops, so the final aggregate matches the batch SQL exactly-once
    "t4_graftlog_stream_sink" -> ((s, d) => Transactions.streamingSink(s, d)),
    // OPTIMIZE-style compaction (pure layout change, identical rows) and
    // CDF-style version diff (insert/update_postimage/delete classes)
    "t5_graftlog_compact"     -> ((s, d) => Transactions.afterCompact(s, d)),
    "t6_graftlog_changes"     -> ((s, d) => Transactions.changeFeed(s, d)),
    // streaming MERGE INTO the transactional table (foreachBatch +
    // idempotent txnMerge; last batch wins per key)
    "t7_graftlog_stream_merge" ->
      ((s, d) => Transactions.streamingMerge(s, d)),
    // commit-log min/max stats prune files on a range read
    "t8_graftlog_data_skipping" ->
      ((s, d) => Transactions.rangeRead(s, d)),
    // checkpoint + vacuum: log truncation must not lose the files that
    // only pre-checkpoint (non-self-contained) appends added
    "t9_graftlog_checkpoint_vacuum" ->
      ((s, d) => Transactions.afterVacuum(s, d)),
    // file skipping driven by Spark's own pushed filters through the
    // GraftFileIndex (format("graft") scan) instead of an explicit API
    "t10_graftlog_fileindex_scan" ->
      ((s, d) => Transactions.indexedRangeRead(s, d)),
    // hive-partitioned table: partition values live in col=val paths;
    // an equality filter prunes at partition granularity in the planner
    "t11_graftlog_partitioned" ->
      ((s, d) => Transactions.partitionedRead(s, d)),
    // GENERATED ALWAYS AS IDENTITY: engine-allocated surrogate keys,
    // dense across commits, log-carried never-reuse high water
    "t31_identity_columns" ->
      ((s, d) => Transactions.identityColumnsRead(s, d)),
    // null-count stats: IS NOT NULL prunes all-null files in the
    // planner (nullCount/numRecords per file, Delta stats parity)
    "t33_null_skipping" ->
      ((s, d) => Transactions.nullSkippingRead(s, d)),
    // stable row ids: log-carried bases, metadata-only backfill, DV
    // stability, materialization through compact (enableRowTracking)
    "t34_row_tracking" ->
      ((s, d) => Transactions.rowTracking(s, d)),
    // row-id preservation THROUGH MERGE: matched-updated rows keep
    // their ids (materialized through the rewrite), inserted rows get
    // fresh monotone ids past the high water — the CDC/incremental-MV
    // identity contract across the one rewrite that mixes both
    "t43_row_tracking_merge" ->
      ((s, d) => Transactions.rowTrackingMerge(s, d)),
    // table-features protocol: introducing commits declare reader/
    // writer features; unknown declarations refuse the table loudly
    "t35_protocol_features" ->
      ((s, d) => Transactions.protocolFeaturesRead(s, d)),
    // CDF keyed by stable row id: lineage without uniqueness
    // assumptions; OPTIMIZE diffs empty by contract
    "t36_rowid_cdf" ->
      ((s, d) => Transactions.rowIdCdf(s, d)),
    // OPTIMIZE WHERE: partition-scoped compaction — one partition's
    // files rewritten to one, everything else untouched
    "t32_optimize_where" ->
      ((s, d) => Transactions.compactWhereRead(s, d)),
    // REORG APPLY (PURGE): rewrite only DV-masked files, drop the
    // vectors; unmasked files carried by reference
    "t30_reorg_purge" ->
      ((s, d) => Transactions.reorgPurgeRead(s, d)),
    // Delta replaceWhere: one partition atomically replaced in one
    // commit; all other partitions' files carried by reference
    "t29_replace_where" ->
      ((s, d) => Transactions.replaceWhereReload(s, d)),
    // OPTIMIZE ZORDER analog: Morton-interleaved layout makes file stats
    // tight on two columns at once; the read filters on the second one
    "t12_graftlog_zorder" ->
      ((s, d) => Transactions.zorderRead(s, d)),
    // streaming read FROM the transactional format: offsets are commit
    // versions, restart resumes exactly-once from the engine offset log
    "t13_graftlog_stream_source" ->
      ((s, d) => Transactions.streamingSource(s, d)),
    // bounded backfill: maxVersionsPerTrigger drains a 5-commit history
    // as 3 bounded micro-batches, rows exactly-once across boundaries
    "i18_bounded_backfill" ->
      ((s, d) => Transactions.boundedBackfill(s, d)),
    // byte-bounded backfill: maxBytesPerTrigger splits the same 5-commit
    // history at a (total-1)-byte cap into exactly 2 bounded batches
    "i20_byte_bounded_backfill" ->
      ((s, d) => Transactions.byteBoundedBackfill(s, d)),
    // startingVersion: the stream is a pure change tail (no initial
    // snapshot); "latest" arms past history and sees only new commits
    "i23_starting_version_tail" ->
      ((s, d) => Transactions.startingVersionTail(s, d)),
    // OPTIMIZE mid-stream is dataChange=false: the resumed stream skips
    // the compact commit silently (no crash, no re-ingest), exactly-once
    "i22_stream_skips_optimize" ->
      ((s, d) => Transactions.optimizeStreamSkip(s, d)),
    // direct streaming sink (writeStream.format("graft")): one txn
    // commit per micro-batch, kill/resume/redrain exactly-once
    "i19_direct_sink" ->
      ((s, d) => Transactions.directSink(s, d)),
    // streaming COPY INTO (Auto-Loader analog): file-discovery stream +
    // per-file COPY ledger; survives kill/restart AND checkpoint loss
    "i27_streaming_copy_into" ->
      ((s, d) => Transactions.streamingCopyInto(s, d)),
    // incremental materialized-view maintenance: per-commit CDF deltas
    // fold into a ledger-stamped delta log; refresh cost = changes,
    // never the fact table; replay is a ledger no-op
    "i28_incremental_agg_view" ->
      ((s, d) => AggView.incrementalAggView(s, d)),
    // the STREAMING twin: the CDF stream (with preimages) delivers, the
    // version-keyed ledger folds — exactly-once survives kill/restart
    // independent of the stream checkpoint
    "i29_agg_view_stream" ->
      ((s, d) => AggView.incrementalAggViewStream(s, d)),
    // e20 under streaming admission: checkpointed file stream feeds the
    // rolling near-dup state; verdicts persist ledger-first so a
    // crash-window re-delivery re-serves them instead of re-probing the
    // already-advanced state; kill/resume between waves + replay pinned
    "i30_neardup_stream_ingest" ->
      ((s, d) => NearDupState.nearDupStreamIngest(s, d)),
    // MV auto-rewrite: a fresh maintained rollup serves the fact-table
    // aggregate from the planner (view scanned, fact skipped); a stale
    // view falls back to the base plan — both decisions pinned
    "d27_mv_auto_rewrite" ->
      ((s, d) => AggView.aggViewAutoRewrite(s, d)),
    // delta-compensated rewrite: a STALE view still serves — the plan
    // folds the view's delta log plus the source's file-bounded CDF
    // tail, current answer at O(changes), never the fact scan
    "d29_mv_compensated_rewrite" ->
      ((s, d) => AggView.aggViewCompensatedRewrite(s, d)),
    // multi-column maintained rollup + rewrite (the reference's gold
    // year x month x ticker shape): two-column group key matched as a
    // SET, the query's own grouping order preserved
    "d30_mv_multicol" ->
      ((s, d) => AggView.aggViewMultiCol(s, d)),
    // the reference's own gold-rollup shape (avg + stddev,
    // financial_dl_etl.py:88-94) auto-rewritten: avg as Average's own
    // exact-decimal sum/count divide over the view, stddev_samp via
    // the maintained second moment — plan scans the view, never the
    // fact table
    "d31_mv_avg_stddev" ->
      ((s, d) => AggView.aggViewGoldRollupRewrite(s, d)),
    // group-column WHERE carried onto the view scan (whole-group
    // predicate = identical answer from per-group delta rows); a
    // row-level WHERE keeps the base plan — both decisions pinned
    "d32_mv_filtered_rewrite" ->
      ((s, d) => AggView.aggViewFilteredRewrite(s, d)),
    // non-group-column WHERE served by a FINER view: the (event_type,
    // ub) rollup answers `WHERE ub = 2 GROUP BY event_type` by
    // bucket-exact filter + re-aggregation, the unfiltered rollup by
    // subset re-aggregation, and a column outside the maintained
    // granularity still refuses — all three plan decisions pinned
    "d33_mv_subset_filter" ->
      ((s, d) => AggView.aggViewSubsetFilterRewrite(s, d)),
    // maintained MIN/MAX (the reference's silver OHLC shape): extrema
    // fold over per-commit candidates while the source is insert-only;
    // the first DELETE poisons them (a removed row may have been the
    // minimum) and the same text falls back — both decisions pinned
    "d34_mv_minmax" ->
      ((s, d) => AggView.aggViewMinMaxRewrite(s, d)),
    // JOIN-MV (eager aggregation): `fact ⋈ dim GROUP BY dim.attr`
    // served from a view maintained at fact-JOIN-KEY granularity —
    // the plan joins the groups-sized view to the dim, never the
    // fact; one un-maintained commit later the same text falls back
    "d35_mv_join_rewrite" ->
      ((s, d) => AggView.aggViewJoinRewrite(s, d)),
    // SNOWFLAKE join-MV: the fact leaf located anywhere in the
    // inner-join tree is swapped for the key-grained view; dim-dim
    // joins and conditions carry verbatim — fact never scanned
    "d36_mv_snowflake" ->
      ((s, d) => AggView.aggViewSnowflakeRewrite(s, d)),
    // the LEFT-OUTER star served: unmatched view keys null-extend into
    // the NULL-dim group with exactly their per-key counts; the
    // dim-preserved direction stays refused
    "d42_mv_outer_star" ->
      ((s, d) => AggView.aggViewOuterStarRewrite(s, d)),
    // the MV SQL lifecycle: CREATE MATERIALIZED VIEW … KEY … AS SELECT
    // derives the rollup from the analyzed plan and registers the
    // rewrite; DROP un-serves; REFRESH folds the missing commits
    "d37_mv_sql_lifecycle" ->
      ((s, d) => AggView.mvSqlLifecycle(s, d)),
    // the STAR-MV SQL lifecycle: CREATE derives the fact + join-key
    // granularity from the analyzed join tree (fact-only definition,
    // dims rejoin at plan time); DROP/stale/REFRESH pins as d37
    "d41_mv_star_sql_lifecycle" ->
      ((s, d) => AggView.mvStarSqlLifecycle(s, d)),
    // UNION-MV: one maintained rollup serves the aggregate over the
    // UNION ALL of its fact sources (per-source ledger app ids); a
    // single stale leg falls the whole union back
    "d38_mv_union" ->
      ((s, d) => AggView.aggViewUnionRewrite(s, d)),
    // DESCRIBE MATERIALIZED VIEW: metadata-only freshness/lag
    // introspection through created → stale → refreshed
    "d39_mv_describe" ->
      ((s, d) => AggView.mvDescribeLifecycle(s, d)),
    // TWO-FACT join-MV (double eager aggregation): fact1 ⋈ fact2 on
    // their view keys served from BOTH views pre-aggregated to key
    // granularity with cross-weighted moment folds; one stale side
    // falls the whole join back
    "d40_mv_two_fact_join" ->
      ((s, d) => AggView.aggViewTwoFactJoin(s, d)),
    // STREAMING union-MV: two channel CDF streams fold into ONE view
    // under per-source ledger app ids; the d38 rewrite serves the
    // stream-maintained view between micro-batches, kill/resume folds
    // exactly the missed versions, full re-drain is a ledger no-op
    "i31_union_view_stream" ->
      ((s, d) => AggView.unionViewStream(s, d)),
    // STREAMING join-MV: fact commits arrive on a CDF stream that
    // folds the join-key-grained view exactly-once; the d35 star
    // serves from view >< dim between micro-batches, one un-drained
    // commit falls back, kill/resume re-serves, re-drain no-ops
    "i32_join_view_stream" ->
      ((s, d) => AggView.joinViewStream(s, d)),
    // streaming TWO-FACT maintenance: both views driven by their own
    // CDF streams (per-channel checkpoints + ledger app ids), the d40
    // cross-weighted rewrite serving between micro-batches
    "i33_two_fact_view_stream" ->
      ((s, d) => AggView.twoFactViewStream(s, d)),
    // the partitioned direct sink: partitionBy through writeStream →
    // one ledger-stamped hive-partitioned commit per micro-batch
    "i24_direct_sink_partitioned" ->
      ((s, d) => Transactions.directSinkPartitioned(s, d)),
    // DataFrameWriter surface: SaveMode overwrite+append through
    // format("graft") are transactional commits
    "t14_graftlog_write_api" ->
      ((s, d) => Transactions.writeApiRoundTrip(s, d)),
    // RESTORE TO VERSION: metadata-only rewind, history intact
    "t15_graftlog_restore" ->
      ((s, d) => Transactions.afterRestore(s, d)),
    // MERGE on a hive-partitioned layout: only touched partitions'
    // files rewritten, result value-identical to the flat merge (t2)
    "t16_graftlog_partitioned_merge" ->
      ((s, d) => Transactions.partitionedMerge(s, d)),
    // merge-on-read DELETE via deletion vectors: zero files rewritten,
    // the read masks (file, row_index) positions from the _dv sidecar
    "t17_graftlog_deletion_vectors" ->
      ((s, d) => Transactions.afterDvDelete(s, d)),
    // Bloom-indexed string point lookup: commit-logged per-file bitmaps
    // prune hash-distributed files where min/max stats cannot
    "t18_graftlog_bloom_skipping" ->
      ((s, d) => Transactions.bloomPointLookup(s, d)),
    // Iceberg-style hidden bucket partitioning: bucket(8, c_custkey)
    // dirs the schema never mentions; plain key probes prune them
    "t19_graftlog_bucket_transform" ->
      ((s, d) => Transactions.bucketTransformProbe(s, d)),
    // GENERATED ALWAYS AS partition column: writers never name it, the
    // ts-range read prunes event_date dirs via the derived predicate
    "t28_generated_columns" ->
      ((s, d) => Transactions.generatedColumnsRead(s, d)),
    // streaming GDPR erasure: delete-request topic → per-batch DV
    // commits → compaction materializes (s11 + t17 + t5 composed)
    "i15_streaming_gdpr_erasure" ->
      ((s, d) => Transactions.streamingErasure(s, d)),
    // streaming change data feed: initial snapshot as inserts, then
    // file-bounded per-commit diffs; checkpointed resume across drains
    "i16_streaming_cdf" -> ((s, d) => Transactions.cdfStream(s, d)),
    // CDC apply downstream: the change feed consumed into a maintained
    // target table (APPLY CHANGES INTO) — idempotent per-version merge
    // + keyed delete, kill/resume between the MERGE and DELETE commits
    "i25_apply_changes" ->
      ((s, d) => Transactions.applyChangesStream(s, d)),
    // streaming CDF over deletion-vector erasure commits (GDPR path):
    // DV commits rewrite no files yet emit `delete` change rows
    "i17_streaming_cdf_erasure" ->
      ((s, d) => Transactions.cdfErasureStream(s, d)),
    // schema evolution: mergeSchema write option + ALTER TABLE ADD
    // COLUMNS; older files backfill the new columns as typed NULLs
    "t20_graftlog_schema_evolution" ->
      ((s, d) => Transactions.schemaEvolution(s, d)),
    // deletion vectors on a hive-partitioned layout: O(matches) erasure
    // on the partitioned table shape, zero data files rewritten
    "t21_graftlog_partitioned_dv" ->
      ((s, d) => Transactions.partitionedDvDelete(s, d)),
    // optimistic concurrency: 6 uncoordinated writers (4 appends + 2
    // deletes) race one table; appends commute, deletes rebase, and
    // every interleaving converges to the same rows in 7 commits
    "t22_graftlog_concurrent_writers" ->
      ((s, d) => Transactions.concurrentWriters(s, d)),
    // zero-copy SHALLOW CLONE: clone of the deleted snapshot evolves
    // independently (insert batch appended to the clone only); the
    // n_copied_files=0 column pins that no data bytes moved
    "t23_graftlog_clone" -> ((s, d) => Transactions.cloneRead(s, d)),
    // DEEP CLONE: physical distributed copy — source destruction
    // (delete-all + vacuum) cannot touch the clone
    "t37_deep_clone" -> ((s, d) => Transactions.deepCloneRead(s, d)),
    // write-path auto-compaction: 8 one-file appends converge to ≤ 4
    // live files via post-commit rewrite-only commits, rows untouched
    "t38_auto_compact" ->
      ((s, d) => Transactions.autoCompactRolling(s, d)),
    // type widening: int32 column → bigint in one metadata-only commit;
    // narrow pages decode under the wide schema beside 64-bit appends
    "t39_type_widening" ->
      ((s, d) => Transactions.typeWidening(s, d)),
    // liquid (incremental) clustering: each OPTIMIZE clusters ONLY the
    // files no previous cluster commit produced — O(new data) per run;
    // both runs' rewritten-file counts pinned at the wave size
    "t42_liquid_clustering" ->
      ((s, d) => Transactions.liquidClustering(s, d)),
    // optimized write: AQE-rebalanced ingest — one right-sized file per
    // partition dir instead of (#tasks × #dirs) slivers; twin control
    // table pins the prevention
    "t40_optimized_write" ->
      ((s, d) => Transactions.optimizedWrite(s, d)),
    // partition-spec evolution: bucket(4)→bucket(8) in one metadata
    // commit; old and new files prune by their own spec in one scan
    "t41_partition_evolution" ->
      ((s, d) => Transactions.partitionEvolution(s, d)),
    // metadata-only RENAME/DROP COLUMN via column mapping: the logical
    // rename is a SQL alias in the oracle; n_meta_files=0 pins that the
    // schema commits moved no data bytes
    "t24_graftlog_column_mapping" ->
      ((s, d) => Transactions.columnMappingRead(s, d)),
    // replay through the COLUMNAR (multi-part parquet) checkpoint: the
    // v10 auto-checkpoint decodes as a distributed parquet scan, with
    // a two-commit tail folded on top
    "t25_columnar_checkpoint" ->
      ((s, d) => Transactions.columnarCheckpointRead(s, d)),
    // four-class CDF: updates emit update_preimage AND update_postimage
    // rows (Delta's full contract), from one pass over the version diff
    "t26_cdf_update_images" ->
      ((s, d) => Transactions.changeFeedWithPreimages(s, d)),
    // batch CDF through the reader option surface: readChangeFeed +
    // startingVersion/endingVersion, rows stamped _commit_version
    "t27_cdf_batch_read" ->
      ((s, d) => Transactions.cdfBatchRead(s, d)),
    // SQL CDF surface: the table_changes TVF over a MERGE + DV-delete
    // history (keys from TBLPROPERTIES, four-class, version-stamped)
    "d22_table_changes" ->
      ((s, d) => Transactions.tableChangesTvf(s, d)),
  )

  /** The IVF oracle shared by f3 (build-per-run) and f10 (persisted
    * index): identical centroids, assignment, probes, and tiebreaks. */
  private val ivfSqlOracle: String =
    """WITH n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |), cents AS (
        |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
        |  FROM n WHERE vec_id < 16
        |), assigned AS (
        |  SELECT vec_id, cent_id, v, norm FROM (
        |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
        |      row_number() OVER (PARTITION BY x.vec_id
        |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
        |          DESC, c.cent_id) AS crank
        |    FROM n x CROSS JOIN cents c)
        |  WHERE crank = 1
        |), probes AS (
        |  SELECT vec_id AS query_id, cent_id, v AS qv, norm AS qnorm
        |  FROM (
        |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
        |      row_number() OVER (PARTITION BY x.vec_id
        |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
        |          DESC, c.cent_id) AS crank
        |    FROM n x CROSS JOIN cents c
        |    WHERE x.vec_id < 10)
        |  WHERE crank <= 4
        |), cand AS (
        |  SELECT p.query_id, a.vec_id,
        |    list_dot_product(p.qv, a.v) / (p.qnorm * a.norm) AS cosine
        |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
        |  WHERE a.vec_id != p.query_id
        |)
        |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
        |FROM (
        |  SELECT query_id, vec_id AS neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        |  FROM cand)
        |WHERE rank <= 5""".stripMargin

  /** Shared oracle fragment: the deterministic incremental batch
    * (mirrors Incremental.incrementalBatch). */
  private val incCte: String =
    """inc AS (
      |  SELECT c_custkey AS inc_custkey, c_name AS inc_name,
      |    c_nationkey AS inc_nationkey,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.5
      |         ELSE c_acctbal END AS inc_acctbal,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'PREMIUM'
      |         ELSE c_mktsegment END AS inc_mktsegment
      |  FROM customer WHERE c_custkey % 2 = 0
      |  UNION ALL
      |  SELECT c_custkey + (SELECT max(c_custkey) FROM customer) + 1,
      |    'NewCustomer#' || CAST(c_custkey AS VARCHAR),
      |    c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 0
      |)""".stripMargin

  private val changedCte: String =
    """changed AS (
      |  SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
      |    inc_mktsegment
      |  FROM customer b JOIN inc ON b.c_custkey = inc.inc_custkey
      |  WHERE b.c_acctbal != inc.inc_acctbal
      |     OR b.c_name != inc.inc_name
      |     OR b.c_mktsegment != inc.inc_mktsegment
      |)""".stripMargin

  /** Hyperplane-LSH signature CTEs shared by the f2/e6 oracles: planes are
    * derived from the corpus exactly like [[graft.operators.Similarity
    * .dataPlanes]] (plane p = v_2p − v_{2p+1}), signatures mirror the
    * native HyperplaneSigs expression (bit j of table t set iff
    * ⟨v, plane_{t,j}⟩ >= 0). */
  private def hyperplaneSigCte(tables: Int, bits: Int): String =
    s"""n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |), planes AS (
       |  SELECT CAST(a.vec_id // 2 AS INTEGER) // $bits AS t,
       |    CAST(a.vec_id // 2 AS INTEGER) % $bits AS j,
       |    list_transform(range(1, len(a.v) + 1), i -> a.v[i] - b.v[i]) AS pl
       |  FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
       |  WHERE a.vec_id % 2 = 0 AND a.vec_id < ${2 * tables * bits}
       |), sigs AS (
       |  SELECT x.vec_id, pl.t,
       |    CAST(sum(CASE WHEN list_dot_product(x.v, pl.pl) >= 0
       |      THEN 1 << pl.j ELSE 0 END) AS INTEGER) AS sig
       |  FROM n x CROSS JOIN planes pl
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = baseOracle ++ Map(
    // catalog round-trips re-surface the silver frames unchanged
    "d1_catalog_roundtrip" -> baseOracle("a2_silver_asset_perf"),
    "d2_writeto_roundtrip" -> baseOracle("a3_silver_market_trend"),
    // the lake pipeline's gold layer is goldMonthlyRollup persisted and
    // read back (bit-exact parquet round-trip at every layer)
    "a5_medallion_lake_e2e" -> baseOracle("a4_gold_monthly_rollup"),
    // CSV text round-trips losslessly (quoting + Java double printing),
    // so the S1 scan must reproduce the parquet table verbatim
    "s1_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "s7_csv_dir_agg" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_bal
        |FROM customer GROUP BY 1""".stripMargin,
    "s8_jsonl_roundtrip" ->
      "SELECT doc_id, lang, text FROM documents",
    "s9_orc_roundtrip" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part""".stripMargin,
    // s3: the delta-requested path scan degrades to the parquet reader
    // over the same files, so the round-trip is verbatim supplier
    "s3_format_path_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    // s5: the profile dispatch must return the same rows whatever format
    // runtime is present; the effective_format literal is computed from
    // the SAME feature detection the query uses, so the oracle pins the
    // degradation decision without hardcoding the environment
    "s5_profile_fallback" -> {
      import graft.sessions.Sessions
      def eff(p: Sessions.Profile): String =
        if (Sessions.formatAvailable(p)) p.name else "parquet"
      s"""SELECT n_nationkey, n_name, n_regionkey, requested_profile,
         |  CASE requested_profile
         |    WHEN 'delta' THEN '${eff(Sessions.DeltaLake)}'
         |    ELSE '${eff(Sessions.IcebergLake)}' END AS effective_format
         |FROM nation CROSS JOIN (VALUES ('delta'), ('iceberg'))
         |  p(requested_profile)""".stripMargin
    },
    // s6: the reference's literal fixture pipeline has a closed-form
    // result — updates applied to the three seed rows plus the one insert
    "s6_literal_rows" ->
      """SELECT * FROM (VALUES
        |  (1, 'Alice', 30, 52000), (2, 'Bob', 29, 65000),
        |  (3, 'Hari', 28, 47000), (4, 'Dave', 40, 70000))
        |  t(id, name, age, salary)""".stripMargin,
    // s10: interchange format feature-detected exactly like the query side
    "s10_avro_roundtrip" -> {
      val fmt = if (graft.sources.Sources.avroAvailable) "avro" else "parquet"
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal, " +
        s"'$fmt' AS interchange_format FROM supplier"
    },
    // s11/i13: the topic's placement rule is pure SQL — partition =
    // md5-hash of the key mod 4, offset = rank within partition ordered
    // by (producer batch = event_id parity, then event_id) — so the
    // oracle re-derives partitioning, offset assignment and the payload
    // checksum from the raw events table. i13 is the streaming consume
    // of the same staged topic, minus the distinct-keys column (distinct
    // aggregation is not available under streaming semantics).
    "s11_topic_produce_consume" ->
      """WITH r AS (
        |  SELECT event_id, ts, CAST(user_id AS VARCHAR) AS key,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      ::UBIGINT % 4 AS INTEGER) AS partition
        |  FROM events
        |), o AS (
        |  SELECT key, event_id, ts, partition,
        |    row_number() OVER (PARTITION BY partition
        |      ORDER BY (event_id % 2), event_id) - 1 AS off
        |  FROM r
        |)
        |SELECT partition, count(*) AS n_records, max(off) AS max_offset,
        |  CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  max(ts) AS max_ts
        |FROM o GROUP BY partition""".stripMargin,
    "i13_topic_consume_stream" ->
      """WITH r AS (
        |  SELECT event_id, CAST(user_id AS VARCHAR) AS key,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      ::UBIGINT % 4 AS INTEGER) AS partition
        |  FROM events
        |), o AS (
        |  SELECT event_id, partition,
        |    row_number() OVER (PARTITION BY partition
        |      ORDER BY (event_id % 2), event_id) - 1 AS off
        |  FROM r
        |)
        |SELECT partition, count(*) AS n_records, max(off) AS max_offset,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum
        |FROM o GROUP BY partition""".stripMargin,
    // i14: the composed topic→stream→txn-append→lake path must land the
    // exact record set the pure streaming consume sees (same oracle)
    "i14_topic_to_lake_e2e" ->
      """WITH r AS (
        |  SELECT event_id, CAST(user_id AS VARCHAR) AS key,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      ::UBIGINT % 4 AS INTEGER) AS partition
        |  FROM events
        |), o AS (
        |  SELECT event_id, partition,
        |    row_number() OVER (PARTITION BY partition
        |      ORDER BY (event_id % 2), event_id) - 1 AS off
        |  FROM r
        |)
        |SELECT partition, count(*) AS n_records, max(off) AS max_offset,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum
        |FROM o GROUP BY partition""".stripMargin,
    // k2: merge-schema overwrite = new data, union schema — old-only
    // columns come back as typed NULLs for every row
    "k2_merge_schema" ->
      """SELECT s_suppkey, s_nationkey, CAST(NULL AS VARCHAR) AS s_name,
        |  CAST(NULL AS DOUBLE) AS s_acctbal FROM supplier""".stripMargin,
    // k3: overwrite-schema replaces the schema wholesale with the new
    // projection
    "k3_overwrite_schema" ->
      "SELECT s_suppkey AS supp_id, upper(s_name) AS supp_name FROM supplier",
    // k6: the single-file contract — the data round-trips AND the layout
    // is one part-file
    "k6_single_file" ->
      "SELECT r_regionkey, r_name, 1 AS n_files FROM region",
    "d4_bucketed_join" ->
      """SELECT o_custkey, count(*) AS n_items,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    // pure-DDL lifecycle: the surviving SHOW TABLES row is a literal
    "d3_ddl_lifecycle" ->
      """SELECT 'graft_ddl_q' AS namespace, 'quotes_part' AS tableName,
        |  FALSE AS isTemporary""".stripMargin,
    // GraftLog: v0 time travel reproduces the seed table untouched; the
    // merged v1 is by-value identical to the relational upsert (c4); the
    // delete version is the anti-filter
    "t1_graftlog_time_travel" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,
    "t2_graftlog_merge" -> baseOracle("c4_upsert"),
    // t16: MERGE on the hive-partitioned layout — layout must not change
    // the answer, so the oracle is the same relational upsert as t2
    "t16_graftlog_partitioned_merge" -> baseOracle("c4_upsert"),
    "t3_graftlog_delete" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 10 != 0""".stripMargin,
    // t17: the DV delete answers like t3, with zero data files rewritten
    // (the merge-on-read contract pinned as a literal column)
    "t17_graftlog_deletion_vectors" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  0 AS n_files_rewritten
        |FROM customer WHERE c_custkey % 10 != 0""".stripMargin,
    // t21: DV delete on the partitioned layout answers like t17 —
    // partitioning must not change the masked result or cost a rewrite
    "t21_graftlog_partitioned_dv" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  0 AS n_files_rewritten
        |FROM customer WHERE c_custkey % 10 != 0""".stripMargin,
    // t22: the six-writer race is order-free by construction — the
    // converged state is seed minus the two deleted slices plus the
    // four key-shifted appended slices, in exactly 7 commits
    "t22_graftlog_concurrent_writers" ->
      """WITH mk AS (SELECT max(c_custkey) + 1 AS m FROM customer)
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  7 AS n_commits
        |FROM customer
        |WHERE c_custkey % 10 != 3 AND c_custkey % 10 != 7
        |UNION ALL
        |SELECT c_custkey + (1 + c_custkey % 4) * mk.m, c_name,
        |  c_nationkey, c_acctbal, c_mktsegment, 7 AS n_commits
        |FROM customer, mk""".stripMargin,
    // t23: the shallow clone = source snapshot after the delete, plus
    // the insert batch (c4's NOT-EXISTS branch) appended to the clone
    // alone; n_copied_files pins the zero-copy contract
    "t37_deep_clone" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  TRUE AS files_copied_positive,
        |  CAST(0 AS BIGINT) AS src_rows_now
        |FROM customer WHERE c_custkey % 10 <> 0""".stripMargin,
    // t39: evens keep their original (int-ranged) ids, odds append
    // beyond int32; widen_files pins the metadata-only widen commit
    "t39_type_widening" ->
      """WITH w AS (
        |  SELECT CAST(event_id AS BIGINT) AS event_id, event_type
        |  FROM events WHERE event_id % 2 = 0
        |  UNION ALL
        |  SELECT event_id + 5000000000, event_type
        |  FROM events WHERE event_id % 2 = 1)
        |SELECT event_type, count(*) AS n, min(event_id) AS min_id,
        |  max(event_id) AS max_id, 0 AS widen_files
        |FROM w GROUP BY 1""".stripMargin,
    // t41: layout-only — the mixed-spec table's rows are events
    // verbatim; n_specs=2 pins both transforms coexist
    "t41_partition_evolution" ->
      """SELECT event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  2 AS n_specs, TRUE AS spec_evolved
        |FROM events GROUP BY 1""".stripMargin,
    // t40: layout-only — the optimized table's rows are events verbatim;
    // the two booleans pin small-file prevention vs the control twin
    "t40_optimized_write" ->
      """SELECT event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  TRUE AS optimized_small, TRUE AS prevention_works
        |FROM events GROUP BY 1""".stripMargin,
    // t38: slices 0..7 of c_custkey % 8 reassemble the whole table —
    // compaction is pure layout, so the row set is customer verbatim
    "t38_auto_compact" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  TRUE AS files_bounded, TRUE AS compacted
        |FROM customer""".stripMargin,
    // t42: both cluster runs rewrote exactly one wave-pair (2 one-file
    // appends), never the already-clustered bulk; rows verbatim
    "t42_liquid_clustering" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(2 AS BIGINT) AS first_run_files,
        |  CAST(2 AS BIGINT) AS second_run_files
        |FROM orders""".stripMargin,
    "t23_graftlog_clone" ->
      s"""WITH $incCte
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         |  0 AS n_copied_files
         |FROM customer WHERE c_custkey % 10 != 0
         |UNION ALL
         |SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |  inc_mktsegment, 0 AS n_copied_files
         |FROM inc
         |WHERE NOT EXISTS
         |  (SELECT 1 FROM customer b WHERE b.c_custkey = inc.inc_custkey)
         |""".stripMargin,
    // i16: the three stream phases re-derived relationally — v0 snapshot
    // as inserts, v1's merge classified like t6, v2's deletes from the
    // post-merge state (CASE on key presence = "update all" semantics)
    "i16_streaming_cdf" ->
      s"""WITH $incCte,
         |merged AS (
         |  SELECT COALESCE(i.inc_custkey, c.c_custkey) AS c_custkey,
         |    CASE WHEN i.inc_custkey IS NOT NULL THEN i.inc_name
         |         ELSE c.c_name END AS c_name,
         |    CASE WHEN i.inc_custkey IS NOT NULL THEN i.inc_nationkey
         |         ELSE c.c_nationkey END AS c_nationkey,
         |    CASE WHEN i.inc_custkey IS NOT NULL THEN i.inc_acctbal
         |         ELSE c.c_acctbal END AS c_acctbal,
         |    CASE WHEN i.inc_custkey IS NOT NULL THEN i.inc_mktsegment
         |         ELSE c.c_mktsegment END AS c_mktsegment
         |  FROM customer c FULL OUTER JOIN inc i
         |    ON c.c_custkey = i.inc_custkey
         |)
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         |  'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
         |FROM customer
         |UNION ALL
         |SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |  inc_mktsegment, 'insert', 1
         |FROM inc
         |WHERE NOT EXISTS
         |  (SELECT 1 FROM customer b WHERE b.c_custkey = inc.inc_custkey)
         |UNION ALL
         |SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |  inc_mktsegment, 'update_postimage', 1
         |FROM customer b JOIN inc ON b.c_custkey = inc.inc_custkey
         |WHERE b.c_acctbal != inc.inc_acctbal
         |   OR b.c_name != inc.inc_name
         |   OR b.c_nationkey != inc.inc_nationkey
         |   OR b.c_mktsegment != inc.inc_mktsegment
         |UNION ALL
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         |  'delete', 2
         |FROM merged WHERE c_custkey % 10 = 0
         |""".stripMargin,
    // i17: anti-join replay of the erasure sequence — v0 snapshot as
    // inserts, v1 = key-batch erasure, v2 = predicate erasure EXCLUDING
    // rows v1 already masked (invisible on both diff sides)
    "i17_streaming_cdf_erasure" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  'delete', 1
        |FROM customer WHERE c_custkey % 10 = 3
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  'delete', 2
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey % 10 <> 3
        |""".stripMargin,
    // t24: rename = alias, drop = projection; the appended batch is the
    // c4 NOT-EXISTS branch under the renamed schema; the trailing DELETE
    // applies to both branches
    "t24_graftlog_column_mapping" ->
      s"""WITH $incCte
         |SELECT c_custkey, c_name AS cust_name, c_nationkey, c_acctbal,
         |  0 AS n_meta_files
         |FROM customer WHERE c_custkey % 7 != 0
         |UNION ALL
         |SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal, 0
         |FROM inc
         |WHERE NOT EXISTS
         |  (SELECT 1 FROM customer b WHERE b.c_custkey = inc.inc_custkey)
         |  AND inc_custkey % 7 != 0
         |""".stripMargin,
    // t25: twelve modulo appends (all rows, across the v10 columnar
    // auto-checkpoint) minus the deleted keys — complete iff the
    // parquet-checkpoint decode reconstructs every appended file
    "t25_columnar_checkpoint" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 7 != 0""".stripMargin,
    // t18: the bloom-pruned point lookup must lose no rows — the oracle
    // is the plain equality with the probe derived the same way
    "t18_graftlog_bloom_skipping" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_name = (SELECT c_name FROM customer
        |                WHERE c_custkey = 42)""".stripMargin,
    // t19: hidden-bucket pruning must lose no rows — plain IN probe
    "t19_graftlog_bucket_transform" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_custkey IN (421, 77, 1204)""".stripMargin,
    // i15: after the erasure stream drains and compaction materializes,
    // exactly the requested keys are gone and no vectors remain
    "i15_streaming_gdpr_erasure" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  0 AS n_dvs_left
        |FROM customer WHERE c_custkey % 7 != 0""".stripMargin,
    "t4_graftlog_stream_sink" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    // t5: compaction is a pure layout change — the oracle is the seed
    "t5_graftlog_compact" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,
    // t6: the CDF classes re-derived from the deterministic batch —
    // inserts are the above-max keys, updates the matched keys whose
    // values actually changed (value-identical merge rewrites are not
    // changes), deletes empty
    "t6_graftlog_changes" ->
      s"""WITH $incCte,
         |ins AS (
         |  SELECT inc_custkey AS c_custkey, inc_name AS c_name,
         |    inc_nationkey AS c_nationkey, inc_acctbal AS c_acctbal,
         |    inc_mktsegment AS c_mktsegment, 'insert' AS _change_type
         |  FROM inc
         |  WHERE NOT EXISTS (SELECT 1 FROM customer b
         |                    WHERE b.c_custkey = inc.inc_custkey)
         |), upd AS (
         |  SELECT inc_custkey AS c_custkey, inc_name AS c_name,
         |    inc_nationkey AS c_nationkey, inc_acctbal AS c_acctbal,
         |    inc_mktsegment AS c_mktsegment,
         |    'update_postimage' AS _change_type
         |  FROM customer b JOIN inc ON b.c_custkey = inc.inc_custkey
         |  WHERE b.c_acctbal != inc.inc_acctbal
         |     OR b.c_name != inc.inc_name
         |     OR b.c_nationkey != inc.inc_nationkey
         |     OR b.c_mktsegment != inc.inc_mktsegment
         |)
         |SELECT * FROM ins UNION ALL SELECT * FROM upd""".stripMargin,
    // t27: the batch-read surface serves the same single-commit diff as
    // t6 with the version stamped on every row
    "t27_cdf_batch_read" ->
      s"""WITH $incCte,
         |ins AS (
         |  SELECT inc_custkey AS c_custkey, inc_name AS c_name,
         |    inc_nationkey AS c_nationkey, inc_acctbal AS c_acctbal,
         |    inc_mktsegment AS c_mktsegment, 'insert' AS _change_type
         |  FROM inc
         |  WHERE NOT EXISTS (SELECT 1 FROM customer b
         |                    WHERE b.c_custkey = inc.inc_custkey)
         |), upd AS (
         |  SELECT inc_custkey AS c_custkey, inc_name AS c_name,
         |    inc_nationkey AS c_nationkey, inc_acctbal AS c_acctbal,
         |    inc_mktsegment AS c_mktsegment,
         |    'update_postimage' AS _change_type
         |  FROM customer b JOIN inc ON b.c_custkey = inc.inc_custkey
         |  WHERE b.c_acctbal != inc.inc_acctbal
         |     OR b.c_name != inc.inc_name
         |     OR b.c_nationkey != inc.inc_nationkey
         |     OR b.c_mktsegment != inc.inc_mktsegment
         |)
         |SELECT *, CAST(1 AS BIGINT) AS _commit_version FROM ins
         |UNION ALL SELECT *, CAST(1 AS BIGINT) AS _commit_version
         |FROM upd""".stripMargin,
    // t26: the same diff with the update PREIMAGES added — old values
    // replayed from the v0 side (customer), new values from the batch,
    // for exactly the value-changed matched keys (join-replay of the
    // two adjacent versions)
    "t26_cdf_update_images" ->
      s"""WITH $incCte,
         |ins AS (
         |  SELECT inc_custkey AS c_custkey, inc_name AS c_name,
         |    inc_nationkey AS c_nationkey, inc_acctbal AS c_acctbal,
         |    inc_mktsegment AS c_mktsegment, 'insert' AS _change_type
         |  FROM inc
         |  WHERE NOT EXISTS (SELECT 1 FROM customer b
         |                    WHERE b.c_custkey = inc.inc_custkey)
         |), changed AS (
         |  SELECT b.c_custkey,
         |    b.c_name AS old_name, b.c_nationkey AS old_nationkey,
         |    b.c_acctbal AS old_acctbal, b.c_mktsegment AS old_mktsegment,
         |    inc_name, inc_nationkey, inc_acctbal, inc_mktsegment
         |  FROM customer b JOIN inc ON b.c_custkey = inc.inc_custkey
         |  WHERE b.c_acctbal != inc.inc_acctbal
         |     OR b.c_name != inc.inc_name
         |     OR b.c_nationkey != inc.inc_nationkey
         |     OR b.c_mktsegment != inc.inc_mktsegment
         |), pre AS (
         |  SELECT c_custkey, old_name AS c_name,
         |    old_nationkey AS c_nationkey, old_acctbal AS c_acctbal,
         |    old_mktsegment AS c_mktsegment,
         |    'update_preimage' AS _change_type
         |  FROM changed
         |), post AS (
         |  SELECT c_custkey, inc_name AS c_name,
         |    inc_nationkey AS c_nationkey, inc_acctbal AS c_acctbal,
         |    inc_mktsegment AS c_mktsegment,
         |    'update_postimage' AS _change_type
         |  FROM changed
         |)
         |SELECT * FROM ins UNION ALL SELECT * FROM pre
         |UNION ALL SELECT * FROM post""".stripMargin,
    // i25: the target equals the source's FINAL state (base updated
    // by the merge, novel keys inserted, %10 keys deleted) — via the
    // change feed alone
    "i25_apply_changes" ->
      s"""WITH $incCte,
         |state1 AS (
         |  SELECT b.c_custkey,
         |    COALESCE(i.inc_name, b.c_name) AS c_name,
         |    COALESCE(i.inc_nationkey, b.c_nationkey) AS c_nationkey,
         |    COALESCE(i.inc_acctbal, b.c_acctbal) AS c_acctbal,
         |    COALESCE(i.inc_mktsegment, b.c_mktsegment) AS c_mktsegment
         |  FROM customer b LEFT JOIN inc i
         |    ON b.c_custkey = i.inc_custkey
         |  UNION ALL
         |  SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |    inc_mktsegment
         |  FROM inc
         |  WHERE NOT EXISTS (SELECT 1 FROM customer b
         |                    WHERE b.c_custkey = inc.inc_custkey)
         |)
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         |FROM state1 WHERE c_custkey % 10 <> 0""".stripMargin,
    // d22: full TVF replay — v0 = every base row as insert; v1 = the
    // merge diff (novel inserts + pre/post images of value-changed
    // matched keys); v2 = the DV delete of %10=0 keys evaluated
    // against the POST-MERGE state (matched keys carry inc values)
    "d22_table_changes" ->
      s"""WITH $incCte,
         |v0 AS (
         |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         |    c_mktsegment, 'insert' AS _change_type,
         |    CAST(0 AS BIGINT) AS _commit_version
         |  FROM customer
         |), ins AS (
         |  SELECT inc_custkey AS c_custkey, inc_name AS c_name,
         |    inc_nationkey AS c_nationkey, inc_acctbal AS c_acctbal,
         |    inc_mktsegment AS c_mktsegment, 'insert' AS _change_type,
         |    CAST(1 AS BIGINT) AS _commit_version
         |  FROM inc
         |  WHERE NOT EXISTS (SELECT 1 FROM customer b
         |                    WHERE b.c_custkey = inc.inc_custkey)
         |), changed AS (
         |  SELECT b.c_custkey,
         |    b.c_name AS old_name, b.c_nationkey AS old_nationkey,
         |    b.c_acctbal AS old_acctbal,
         |    b.c_mktsegment AS old_mktsegment,
         |    inc_name, inc_nationkey, inc_acctbal, inc_mktsegment
         |  FROM customer b JOIN inc ON b.c_custkey = inc.inc_custkey
         |  WHERE b.c_acctbal != inc.inc_acctbal
         |     OR b.c_name != inc.inc_name
         |     OR b.c_nationkey != inc.inc_nationkey
         |     OR b.c_mktsegment != inc.inc_mktsegment
         |), pre AS (
         |  SELECT c_custkey, old_name AS c_name,
         |    old_nationkey AS c_nationkey, old_acctbal AS c_acctbal,
         |    old_mktsegment AS c_mktsegment,
         |    'update_preimage' AS _change_type,
         |    CAST(1 AS BIGINT) AS _commit_version
         |  FROM changed
         |), post AS (
         |  SELECT c_custkey, inc_name AS c_name,
         |    inc_nationkey AS c_nationkey, inc_acctbal AS c_acctbal,
         |    inc_mktsegment AS c_mktsegment,
         |    'update_postimage' AS _change_type,
         |    CAST(1 AS BIGINT) AS _commit_version
         |  FROM changed
         |), state1 AS (
         |  SELECT b.c_custkey,
         |    COALESCE(i.inc_name, b.c_name) AS c_name,
         |    COALESCE(i.inc_nationkey, b.c_nationkey) AS c_nationkey,
         |    COALESCE(i.inc_acctbal, b.c_acctbal) AS c_acctbal,
         |    COALESCE(i.inc_mktsegment, b.c_mktsegment) AS c_mktsegment
         |  FROM customer b LEFT JOIN inc i
         |    ON b.c_custkey = i.inc_custkey
         |  UNION ALL
         |  SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |    inc_mktsegment
         |  FROM inc
         |  WHERE NOT EXISTS (SELECT 1 FROM customer b
         |                    WHERE b.c_custkey = inc.inc_custkey)
         |), del AS (
         |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         |    c_mktsegment, 'delete' AS _change_type,
         |    CAST(2 AS BIGINT) AS _commit_version
         |  FROM state1 WHERE c_custkey % 10 = 0
         |)
         |SELECT * FROM v0 UNION ALL SELECT * FROM ins
         |UNION ALL SELECT * FROM pre UNION ALL SELECT * FROM post
         |UNION ALL SELECT * FROM del""".stripMargin,
    // f7: product quantization — codebooks, per-subspace argmin encoding,
    // and the query distance tables are all IEEE doubles with the
    // identical expression tree (strict-fold dot of the componentwise
    // diff); the ADC total across subspaces is an exact DECIMAL sum, so
    // the ranking is aggregation-order-free and engine-portable
    "f8_knn_ivfadc" -> ivfadcOracle,
    // f9: the whole curve is relational — probe ranks computed once,
    // the grid applied as a crank <= nprobe theta join, recall counted
    // against the exact top-k set (same tiebreaks both engines)
    "f9_knn_recall_curve" ->
      """WITH n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |), cents AS (
        |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
        |  FROM n WHERE vec_id < 16
        |), assigned AS (
        |  SELECT vec_id, cent_id, v, norm FROM (
        |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
        |      row_number() OVER (PARTITION BY x.vec_id
        |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
        |          DESC, c.cent_id) AS crank
        |    FROM n x CROSS JOIN cents c)
        |  WHERE crank = 1
        |), proberanks AS (
        |  SELECT vec_id AS query_id, cent_id, crank, v AS qv, norm AS qnorm
        |  FROM (
        |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
        |      row_number() OVER (PARTITION BY x.vec_id
        |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
        |          DESC, c.cent_id) AS crank
        |    FROM n x CROSS JOIN cents c
        |    WHERE x.vec_id < 10)
        |), grid AS (SELECT unnest([2, 4, 8, 16]) AS nprobe
        |), probes AS (
        |  SELECT g.nprobe, p.query_id, p.cent_id, p.qv, p.qnorm
        |  FROM proberanks p CROSS JOIN grid g WHERE p.crank <= g.nprobe
        |), cand AS (
        |  SELECT p.nprobe, p.query_id, a.vec_id,
        |    list_dot_product(p.qv, a.v) / (p.qnorm * a.norm) AS cosine
        |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
        |  WHERE a.vec_id != p.query_id
        |), ivf AS (
        |  SELECT nprobe, query_id, vec_id AS neighbor_id FROM (
        |    SELECT nprobe, query_id, vec_id,
        |      row_number() OVER (PARTITION BY nprobe, query_id
        |        ORDER BY cosine DESC, vec_id) AS rank
        |    FROM cand)
        |  WHERE rank <= 5
        |), exact AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_dot_product(q.v, c.v) / (q.norm * c.norm)
        |          DESC, c.vec_id) AS rank
        |    FROM n q JOIN n c ON c.vec_id != q.vec_id
        |    WHERE q.vec_id < 10)
        |  WHERE rank <= 5
        |)
        |SELECT i.nprobe, count(*) AS n_hits,
        |  round(CAST(count(*) AS DOUBLE) / 50.0, 6) AS recall
        |FROM ivf i SEMI JOIN exact e
        |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
        |GROUP BY i.nprobe""".stripMargin,
    "f7_knn_pq_adc" ->
      s"""WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), subs AS (
        |  SELECT vec_id, CAST(j AS INTEGER) AS m,
        |    v[(j*16 + 1):(j*16 + 16)] AS sub
        |  FROM n, UNNEST(range(0, 4)) AS u(j)
        |), cb0 AS (
        |  SELECT m, CAST(vec_id AS INTEGER) AS c, sub AS cw
        |  FROM subs WHERE vec_id < 16
        |),
        |${pqLloydCtes(2)},
        |cb AS (SELECT m, c, cw FROM cb2),
        |enc AS (
        |  SELECT vec_id, m, c FROM (
        |    SELECT s.vec_id, s.m, cb.c,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        |        list_dot_product(
        |          list_transform(list_zip(s.sub, cb.cw), z -> z[1] - z[2]),
        |          list_transform(list_zip(s.sub, cb.cw), z -> z[1] - z[2]))
        |          ASC, cb.c ASC) AS r
        |    FROM subs s JOIN cb USING (m))
        |  WHERE r = 1
        |), dts AS (
        |  SELECT s.vec_id AS query_id, s.m, cb.c,
        |    list_dot_product(
        |      list_transform(list_zip(s.sub, cb.cw), z -> z[1] - z[2]),
        |      list_transform(list_zip(s.sub, cb.cw), z -> z[1] - z[2]))
        |      AS dt
        |  FROM subs s JOIN cb USING (m)
        |  WHERE s.vec_id < 10
        |), adc AS (
        |  SELECT d.query_id, e.vec_id,
        |    sum(CAST(d.dt AS DECIMAL(38,10))) AS adc_d2
        |  FROM enc e JOIN dts d ON d.m = e.m AND d.c = e.c
        |  WHERE e.vec_id != d.query_id
        |  GROUP BY d.query_id, e.vec_id
        |), short AS (
        |  SELECT query_id, vec_id, adc_d2 FROM (
        |    SELECT query_id, vec_id, adc_d2,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY adc_d2 ASC, vec_id ASC) AS adc_rank
        |    FROM adc)
        |  WHERE adc_rank <= 50
        |), nn AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM n
        |), refined AS (
        |  SELECT t.query_id, t.vec_id, t.adc_d2,
        |    list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cosine
        |  FROM short t
        |  JOIN nn c ON c.vec_id = t.vec_id
        |  JOIN nn q ON q.vec_id = t.query_id
        |)
        |SELECT query_id, vec_id AS neighbor_id, rank,
        |  round(CAST(adc_d2 AS DOUBLE), 6) AS adc_d2,
        |  round(cosine, 6) AS cosine
        |FROM (
        |  SELECT query_id, vec_id, adc_d2, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
        |  FROM refined)
        |WHERE rank <= 5""".stripMargin,
    // f5: the whole quantize/encode/audit pipeline is IEEE arithmetic on
    // per-dim stats — floor (never round: engines disagree on halves),
    // constant-dim guard, exact decimal error sums
    "f5_embedding_quantize" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS pos, embedding
        |  FROM embeddings
        |), v AS (
        |  SELECT vec_id, pos,
        |    CAST(embedding[CAST(pos AS INTEGER) + 1] AS DOUBLE) AS v
        |  FROM e
        |), stats AS (
        |  SELECT pos, min(v) AS mn, max(v) AS mx,
        |    (max(v) - min(v)) / 255.0 AS scale
        |  FROM v GROUP BY 1
        |), coded AS (
        |  SELECT vec_id,
        |    CAST(CASE WHEN scale = 0.0 THEN 0 ELSE
        |      least(255.0, greatest(0.0, floor((v - mn) / scale)))
        |      END AS INTEGER) AS code,
        |    v, mn, scale
        |  FROM v JOIN stats USING (pos)
        |), scored AS (
        |  SELECT vec_id, code,
        |    CASE WHEN scale = 0.0 THEN 0.0 ELSE
        |      (v - (mn + (code + 0.5) * scale)) *
        |      (v - (mn + (code + 0.5) * scale)) END AS err2
        |  FROM coded
        |)
        |SELECT vec_id, count(*) AS n_dims,
        |  CAST(max(code) AS INTEGER) AS max_code,
        |  CAST(min(code) AS INTEGER) AS min_code,
        |  round(CAST(sum(CAST(err2 AS DECIMAL(38,10))) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 6) AS mse
        |FROM scored GROUP BY 1""".stripMargin,
    // f6: the f1 ranking run on midpoint reconstructions — the quantize
    // CTEs are f5's, the search CTEs f1's
    "f6_knn_quantized" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS pos, embedding
        |  FROM embeddings
        |), vv AS (
        |  SELECT vec_id, pos,
        |    CAST(embedding[CAST(pos AS INTEGER) + 1] AS DOUBLE) AS v
        |  FROM e
        |), stats AS (
        |  SELECT pos, min(v) AS mn, max(v) AS mx,
        |    (max(v) - min(v)) / 255.0 AS scale
        |  FROM vv GROUP BY 1
        |), coded AS (
        |  SELECT vec_id, pos,
        |    CAST(CASE WHEN scale = 0.0 THEN 0 ELSE
        |      least(255.0, greatest(0.0, floor((v - mn) / scale)))
        |      END AS INTEGER) AS code,
        |    mn, scale
        |  FROM vv JOIN stats USING (pos)
        |), vecs AS (
        |  SELECT vec_id,
        |    list(mn + (code + 0.5) * scale ORDER BY pos) AS rv
        |  FROM coded GROUP BY 1
        |), n AS (
        |  SELECT vec_id, rv, sqrt(list_dot_product(rv, rv)) AS norm
        |  FROM vecs
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.rv, c.rv) / (q.norm * c.norm) AS cosine
        |  FROM n q JOIN n c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 10
        |)
        |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
        |FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // t7: final upsert state = per (user_id, event_type) the latest event
    // of the LAST phase that carries the key (phase = event_id % 2; phase
    // 1 landed second so it wins), latest-within-phase by (us, event_id)
    "t7_graftlog_stream_merge" ->
      """SELECT user_id, event_type, event_id AS last_event_id,
        |  value AS last_value
        |FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY event_id % 2 DESC, epoch_us(ts) DESC,
        |               event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,
    // t8: pruning must lose no rows — the oracle is the plain range scan
    "t8_graftlog_data_skipping" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_custkey >= 101 AND c_custkey <= 400""".stripMargin,
    // t9: four appends + delete, then vacuum truncates the append log
    // entries — checkpoint replay must still see every appended slice
    "t9_graftlog_checkpoint_vacuum" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 10 != 0""".stripMargin,
    // t10: planner-driven skipping must lose no rows — the oracle is the
    // plain disjunctive range over the full table
    "t10_graftlog_fileindex_scan" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE (c_custkey >= 701 AND c_custkey <= 900)
        |   OR (c_custkey >= 1101 AND c_custkey <= 1200)""".stripMargin,
    // t11: partition-pruned read must surface exactly the segment's rows,
    // with the path-reconstructed partition column intact
    "t11_graftlog_partitioned" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    // t28: the generated event_date is never written by a producer and
    // never named by the query's filter — the derived-pruned daily
    // aggregate must equal the raw ts-ranged aggregate exactly
    "t28_generated_columns" ->
      """SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY 1""".stripMargin,
    // t31: two identity-allocating commits yield one unbroken stepped
    // sequence — count/distinct/endpoints/grid all follow from the
    // customer row count
    "t31_identity_columns" ->
      """SELECT count(*) AS n_rows, count(*) AS n_ids,
        |  1000 AS min_id, 1000 + 2 * (count(*) - 1) AS max_id,
        |  TRUE AS all_on_grid
        |FROM customer""".stripMargin,
    // t33: the sparse-column IS NOT NULL read returns exactly the
    // populated slice (file pruning is a plan property, spec-pinned)
    "t33_null_skipping" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  'vip:' || c_name AS c_note
        |FROM customer WHERE c_custkey <= 100""".stripMargin,
    // t36: the DV commit's row-id diff is exactly the hidden tenth as
    // deletes (postimage values); the append's is the shifted batch as
    // inserts — ids are engine-internal, so the oracle pins the
    // (key, type, version) triples
    "t36_rowid_cdf" ->
      """SELECT c_custkey, c_name, 'delete' AS _change_type,
        |  3 AS _commit_version
        |FROM customer WHERE c_custkey % 10 = 0
        |UNION ALL
        |SELECT c_custkey + 1000000, c_name, 'insert', 4
        |FROM customer WHERE c_custkey <= 100""".stripMargin,
    // t35: the gate never blocks supported declarations (full surviving
    // row set reads through), and the declared lists are pinned
    "t35_protocol_features" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  'deletionVectors' AS reader_features,
        |  'checkConstraints' AS writer_features,
        |  3 AS n_versions
        |FROM customer WHERE c_custkey % 10 <> 0""".stripMargin,
    // t34: id VALUES are engine-internal, so the oracle pins the
    // cardinal invariants — distinct ids == survivors, all inside the
    // backfill window [0, |customer|), every id compact-stable — plus
    // the surviving row set (DV-deleted tenth hidden)
    "t34_row_tracking" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  (SELECT count(*) FROM customer WHERE c_custkey % 10 <> 0)
        |    AS n_ids,
        |  (SELECT count(*) FROM customer WHERE c_custkey % 10 <> 0)
        |    AS n_in_range,
        |  (SELECT count(*) FROM customer WHERE c_custkey % 10 <> 0)
        |    AS n_stable,
        |  5 AS n_versions
        |FROM customer WHERE c_custkey % 10 <> 0""".stripMargin,
    // t43: the merge replay (matched %3 keys updated, shifted twins
    // inserted); id invariants pinned as booleans/cardinalities —
    // n_stable = every pre-merge row (the whole customer table by then)
    "t43_row_tracking_merge" ->
      """WITH updated AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000.0
        |         ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer),
        |ins AS (
        |  SELECT c_custkey + 10000000 AS c_custkey, c_name, c_nationkey,
        |    c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 3 = 0),
        |final AS (SELECT * FROM updated UNION ALL SELECT * FROM ins)
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  (SELECT count(*) FROM customer) AS n_stable,
        |  TRUE AS fresh_monotone, TRUE AS all_ids_distinct
        |FROM final""".stripMargin,
    // t32: partition-scoped compaction is a pure layout change on one
    // partition — full rows, one BUILDING file, rest carried
    "t32_optimize_where" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  1 AS n_building_files,
        |  TRUE AS only_touched, TRUE AS untouched_carried
        |FROM customer""".stripMargin,
    // t30: REORG purges exactly the erased rows, touches only masked
    // files, carries the rest by reference, and leaves zero vectors
    "t30_reorg_purge" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  TRUE AS only_touched, TRUE AS untouched_carried,
        |  0 AS n_dvs_after
        |FROM customer
        |WHERE NOT (c_custkey % 10 = 0 AND c_custkey <= 300)""".stripMargin,
    // t29: the selective overwrite replaces exactly the BUILDING slice
    // with the recomputed batch (the CASE), touches only that
    // partition's files, and carries every other file by reference
    "t29_replace_where" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_mktsegment = 'BUILDING'
        |       THEN 1000.0 + CAST(c_nationkey AS DOUBLE)
        |       ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment,
        |  TRUE AS only_touched, TRUE AS untouched_carried
        |FROM customer""".stripMargin,
    // t12: the z-ordered layout is a pure layout change — the filtered
    // read must equal the plain predicate over the full table
    "t12_graftlog_zorder" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_acctbal >= 2000 AND c_acctbal <= 4000""".stripMargin,
    // t13: kill/resume streaming read delivers every event exactly once
    // iff the sink aggregate equals the batch SQL over all events
    "t13_graftlog_stream_source" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    // i18: the capped catch-up must deliver every event exactly once
    // (same aggregate as t13) in exactly ceil(5 commits / 2) = 3
    // bounded micro-batches
    "i18_bounded_backfill" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, 3 AS n_batches
        |FROM events GROUP BY 1""".stripMargin,
    // i20: the byte cap at (total - 1) admits the first four commits as
    // batch one and the fifth alone — exactly-once rows, exactly 2
    // bounded batches for any size distribution
    "i20_byte_bounded_backfill" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, 2 AS n_batches
        |FROM events GROUP BY 1""".stripMargin,
    // i23: the sv=1 tail delivers exactly commits 1..2's slices (event
    // ids with id%3 in {1,2}); the "latest" tail first drains nothing,
    // then exactly the post-arm commit
    "i23_starting_version_tail" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  TRUE AS latest_tail_empty, TRUE AS latest_saw_only_new
        |FROM events WHERE event_id % 3 <> 0 GROUP BY 1""".stripMargin,
    // i22: OPTIMIZE between two drains is invisible — every event still
    // delivered exactly once (re-delivering the compacted files would
    // double the v0/v1 counts), the resume produced one data batch (the
    // compact version contributed none), and a fresh full-history drain
    // over the compact-containing range agrees
    "i22_stream_skips_optimize" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, 1 AS n_batches_resume, TRUE AS fresh_ok
        |FROM events GROUP BY 1""".stripMargin,
    // i19: the direct sink relays every event exactly once in exactly
    // two sink commits (one per drained source commit; the redrain
    // adds none)
    "i19_direct_sink" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, 2 AS n_commits
        |FROM events GROUP BY 1""".stripMargin,
    // i28: the incremental fold must equal the full recompute over the
    // source's final state (after append + delete + update) bit-for-bit;
    // applied_incr pins the three data versions, replay_noop the ledger
    "i28_incremental_agg_view" ->
      """WITH final AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, 3 AS applied_incr, TRUE AS replay_noop
        |FROM final GROUP BY 1""".stripMargin,
    // d27: the auto-rewritten aggregate's VALUES are i28's recompute at
    // the maintained state (the stale commit v4 is invisible: the plan
    // reads the view table); used_view/fell_back pin the two plan
    // decisions
    "d27_mv_auto_rewrite" ->
      """WITH final AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, TRUE AS used_view, TRUE AS fell_back
        |FROM final GROUP BY 1""".stripMargin,
    // d30: the two-column maintained fold equals the recompute over
    // the source's final state, served through the view
    "d30_mv_multicol" ->
      """WITH final AS (
        |  SELECT event_id, event_type, user_id % 4 AS ub,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0)
        |SELECT ub, event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, TRUE AS used_view
        |FROM final GROUP BY 1, 2""".stripMargin,
    // d29: the compensated fold must be CURRENT — the recompute
    // INCLUDES the un-maintained %11 append the view never folded
    "d29_mv_compensated_rewrite" ->
      """WITH base AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0),
        |extra AS (
        |  SELECT event_id, event_type, value FROM events
        |  WHERE event_id % 11 = 0),
        |final AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM extra)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, TRUE AS used_view, TRUE AS compensated
        |FROM final GROUP BY 1""".stripMargin,
    // d31: avg/stddev served from the view — avg is the exact-decimal
    // sum/count divide, stddev the exact second moment (the same
    // stddev6 decomposition a4's oracle replays); used_view pins the
    // plan decision
    "d31_mv_avg_stddev" ->
      """WITH final AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0),
        |sums AS (
        |  SELECT event_type, count(*) AS n_events,
        |    sum(CAST(value AS DECIMAL(38,10))) AS s_dec,
        |    sum(CAST(value * value AS DECIMAL(38,10))) AS ss_dec
        |  FROM final GROUP BY 1)
        |SELECT event_type, n_events,
        |  round(CAST(s_dec AS DOUBLE) / n_events, 6) AS average_roi,
        |  CASE WHEN n_events > 1 THEN
        |    round(sqrt(greatest(
        |      (CAST(ss_dec AS DOUBLE)
        |        - CAST(s_dec AS DOUBLE) * CAST(s_dec AS DOUBLE)
        |          / CAST(n_events AS DOUBLE))
        |      / (CAST(n_events AS DOUBLE) - 1.0), 0.0)), 6)
        |  ELSE NULL END AS volatility,
        |  TRUE AS used_view
        |FROM sums""".stripMargin,
    // d32: the filtered fold — WHERE on the group column replayed over
    // the post-lifecycle state (v0 overwrite, v1 append, v2 delete)
    "d32_mv_filtered_rewrite" ->
      """WITH final AS (
        |  SELECT event_id, event_type, value FROM events
        |  WHERE event_id % 7 <> 0)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, TRUE AS used_view, TRUE AS row_fell_back
        |FROM final WHERE event_type IN ('click', 'view')
        |GROUP BY 1""".stripMargin,
    // d33: the (event_type, ub) view answers the ub-filtered dashboard
    // query over the post-lifecycle state (v0 overwrite, v1 append,
    // v2 delete); the three plan pins land as literal booleans
    "d33_mv_subset_filter" ->
      """WITH final AS (
        |  SELECT event_id, event_type, user_id % 4 AS ub, value
        |  FROM events WHERE event_id % 7 <> 0)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, TRUE AS used_view, TRUE AS rollup_used_view,
        |  TRUE AS row_fell_back
        |FROM final WHERE ub = 2
        |GROUP BY 1""".stripMargin,
    // d34: the post-delete recompute (the min/max text falls back to
    // the base plan once removes poison the extrema; while insert-only
    // it served from the view — both pinned as literal booleans)
    "d34_mv_minmax" ->
      """WITH final AS (
        |  SELECT event_id, event_type, value FROM events
        |  WHERE event_id % 7 <> 0)
        |SELECT event_type, count(*) AS n_events,
        |  round(min(value), 6) AS min_value,
        |  round(max(value), 6) AS max_value,
        |  TRUE AS used_view, TRUE AS minmax_fell_back
        |FROM final GROUP BY 1""".stripMargin,
    // d35: the join-MV values are the v3-state recompute of the star
    // aggregate (the stale v4 commit is invisible: the plan reads the
    // view ⋈ dim); avg replays as the exact-decimal sum/count divide
    "d35_mv_join_rewrite" ->
      """WITH final AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0),
        |dim AS (
        |  SELECT DISTINCT user_id AS uid,
        |    'seg_' || CAST(user_id % 5 AS VARCHAR) AS segment
        |  FROM events)
        |SELECT segment, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |    / count(*), 6) AS avg_value,
        |  TRUE AS used_view, TRUE AS fell_back
        |FROM final JOIN dim ON final.user_id = dim.uid
        |GROUP BY 1""".stripMargin,
    // d42: the left-outer star replay — fact at v3 state LEFT JOINed
    // to the partial dim (user buckets %7==0 missing → the 'unmatched'
    // group); both plan pins as literals
    "d42_mv_outer_star" ->
      """WITH final AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0),
        |dim AS (
        |  SELECT DISTINCT user_id AS uid,
        |    'seg_' || CAST(user_id % 5 AS VARCHAR) AS segment
        |  FROM events WHERE user_id % 7 <> 0)
        |SELECT coalesce(segment, 'unmatched') AS segment,
        |  count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |    / count(*), 6) AS avg_value,
        |  TRUE AS used_view, TRUE AS fell_back
        |FROM final LEFT JOIN dim ON final.user_id = dim.uid
        |GROUP BY segment""".stripMargin,
    // d36: the snowflake replay — fact at v3 state through user → city
    // dims to the region rollup; both plan pins as literals
    "d36_mv_snowflake" ->
      """WITH final AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0),
        |du AS (
        |  SELECT DISTINCT user_id AS uid, user_id % 7 AS city_id
        |  FROM events),
        |dc AS (
        |  SELECT cid, 'r' || CAST(cid % 3 AS VARCHAR) AS region
        |  FROM (SELECT unnest(range(0, 7)) AS cid))
        |SELECT region, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  TRUE AS used_view, TRUE AS fell_back
        |FROM final
        |JOIN du ON final.user_id = du.uid
        |JOIN dc ON du.city_id = dc.cid
        |GROUP BY 1""".stripMargin,
    // d40: fact1 = %3==0 slice with delete(%7)+update(%5) churn,
    // fact2 = %3==1 slice (qty = 2*value) with delete(%11); the join
    // values are both facts' maintained (pre-v3-append) states — the
    // stale append is invisible to the view plan; avg replays as the
    // exact sum/count divide, both plan pins as literals
    "d40_mv_two_fact_join" ->
      """WITH f1 AS (
        |  SELECT user_id,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events
        |  WHERE event_id % 3 = 0 AND event_id % 7 <> 0),
        |f2 AS (
        |  SELECT user_id AS uid2, value * 2 AS qty
        |  FROM events
        |  WHERE event_id % 3 = 1 AND event_id % 11 <> 0)
        |SELECT user_id, count(*) AS n_pairs,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  round(CAST(sum(CAST(qty AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_qty,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |    / count(*), 6) AS avg_value,
        |  TRUE AS used_view, TRUE AS fell_back
        |FROM f1 JOIN f2 ON f1.user_id = f2.uid2
        |GROUP BY 1""".stripMargin,
    // d37: the served values are the post-REFRESH state (all events +
    // the duplicated %13 append); the four lifecycle pins as literals
    "d37_mv_sql_lifecycle" ->
      """WITH final AS (
        |  SELECT event_type, value FROM events
        |  UNION ALL
        |  SELECT event_type, value FROM events WHERE event_id % 13 = 0)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  TRUE AS used_view, TRUE AS drop_fell_back,
        |  TRUE AS stale_fell_back, 1 AS versions_applied
        |FROM final GROUP BY 1""".stripMargin,
    // d41: the star-MV lifecycle — served values are the post-REFRESH
    // fact state (all events + the %13 append) through the user→segment
    // dim; the four lifecycle pins as literals
    "d41_mv_star_sql_lifecycle" ->
      """WITH final AS (
        |  SELECT user_id, value FROM events
        |  UNION ALL
        |  SELECT user_id, value FROM events WHERE event_id % 13 = 0),
        |dim AS (
        |  SELECT DISTINCT user_id AS uid,
        |    'seg_' || CAST(user_id % 5 AS VARCHAR) AS segment
        |  FROM events)
        |SELECT segment, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  TRUE AS used_view, TRUE AS drop_fell_back,
        |  TRUE AS stale_fell_back, 1 AS versions_applied
        |FROM final JOIN dim ON final.user_id = dim.uid
        |GROUP BY 1""".stripMargin,
    // d38: the union replay — channel A (even ids) runs seed/append/
    // delete, channel B (odd ids) seed/append; the union aggregate at
    // both channels' maintained state; both plan pins as literals
    "d38_mv_union" ->
      """WITH a AS (
        |  SELECT event_type, value FROM events
        |  WHERE event_id % 2 = 0 AND event_id % 7 <> 0),
        |b AS (
        |  SELECT event_type, value FROM events
        |  WHERE event_id % 2 = 1),
        |final AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  TRUE AS used_view, TRUE AS fell_back
        |FROM final GROUP BY 1""".stripMargin,
    // d39: three metadata-only describes — created fresh, stale 1
    // behind after the un-refreshed commit, fresh again post-REFRESH
    "d39_mv_describe" ->
      """SELECT 'event_type' AS group_cols, 'value' AS value_col,
        |  'event_id' AS key, FALSE AS compensate,
        |  TRUE AS is_fresh, CAST(0 AS BIGINT) AS versions_behind,
        |  'created' AS stage
        |UNION ALL SELECT 'event_type', 'value', 'event_id', FALSE,
        |  FALSE, 1, 'stale'
        |UNION ALL SELECT 'event_type', 'value', 'event_id', FALSE,
        |  TRUE, 0, 'refreshed'""".stripMargin,
    // i32: the final fact state (all events, %9 deleted, %5 updated)
    // through the user->segment dim; all five stream/serve pins as
    // literals
    "i32_join_view_stream" ->
      """WITH final AS (
        |  SELECT user_id,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 9 <> 0),
        |dim AS (
        |  SELECT DISTINCT user_id AS uid,
        |    'seg_' || CAST(user_id % 5 AS VARCHAR) AS segment
        |  FROM events)
        |SELECT segment, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  TRUE AS served_mid, TRUE AS fell_back, TRUE AS served_after,
        |  TRUE AS replay_noop, TRUE AS served_equals_base
        |FROM final JOIN dim ON final.user_id = dim.uid
        |GROUP BY 1""".stripMargin,
    // i33: both facts' final streamed states (fact1 = %3==0 slice with
    // the delete(%7)+update(%5) churn, fact2 = %3==1 slice qty=2·value
    // with delete(%11)) joined on the user key; all five stream/serve
    // pins as literals
    "i33_two_fact_view_stream" ->
      """WITH f1 AS (
        |  SELECT user_id,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 3 = 0 AND event_id % 7 <> 0),
        |f2 AS (
        |  SELECT user_id AS uid2, value * 2 AS qty
        |  FROM events WHERE event_id % 3 = 1 AND event_id % 11 <> 0)
        |SELECT user_id, count(*) AS n_pairs,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  round(CAST(sum(CAST(qty AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_qty,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |    / count(*), 6) AS avg_value,
        |  TRUE AS served_mid, TRUE AS fell_back, TRUE AS served_after,
        |  TRUE AS replay_noop, TRUE AS served_equals_base
        |FROM f1 JOIN f2 ON f1.user_id = f2.uid2
        |GROUP BY 1""".stripMargin,
    // i31: the stream-maintained union view equals the recompute over
    // both channels' final states (d38's corpus); four pins as
    // literals
    "i31_union_view_stream" ->
      """WITH a AS (
        |  SELECT event_type, value FROM events
        |  WHERE event_id % 2 = 0 AND event_id % 7 <> 0),
        |b AS (
        |  SELECT event_type, value FROM events
        |  WHERE event_id % 2 = 1),
        |final AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value,
        |  TRUE AS served_mid, TRUE AS fell_back,
        |  TRUE AS served_after, TRUE AS replay_noop
        |FROM final GROUP BY 1""".stripMargin,
    // i29: the stream-maintained fold equals the recompute over the
    // source's final state; 4 versions folded (snapshot, append,
    // delete, update), pure replay is a ledger no-op
    "i29_agg_view_stream" ->
      """WITH final AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 7 <> 0)
        |SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, 4 AS maintained_versions, TRUE AS replay_noop
        |FROM final GROUP BY 1""".stripMargin,
    // i27: three waves × 4 files at a 2-file admission cap = 6 ingest
    // commits + the seed; the checkpoint-loss redrain must be a ledger
    // no-op; the landed union aggregates like one batch COPY
    "i27_streaming_copy_into" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, 7 AS n_commits, TRUE AS redelivery_noop
        |FROM events GROUP BY 1""".stripMargin,
    // i24: same exactly-once aggregate through the PARTITIONED sink;
    // n_dirs pins the physical event_type=… layout
    "i24_direct_sink_partitioned" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value, 2 AS n_commits,
        |  CAST((SELECT count(DISTINCT event_type) FROM events)
        |    AS INTEGER) AS n_dirs
        |FROM events GROUP BY 1""".stripMargin,
    // t14: overwrite(evens) + append(odds) through the writer API must
    // reassemble the full table
    "t14_graftlog_write_api" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,
    // d5: the catalog-registered graft table answers plain SQL exactly
    "d5_graft_sql_table" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey BETWEEN 201 AND 500""".stripMargin,
    // d6: SQL MERGE INTO must equal the relational upsert exactly
    "d6_graft_sql_merge" -> baseOracle("c4_upsert"),
    // d7: SQL UPDATE (absolute assignment on one segment) + DELETE
    // (modulo predicate) — plain CASE/filter over the seed table
    "d7_graft_sql_update_delete" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_mktsegment = 'BUILDING'
        |       THEN 100.0 + CAST(c_nationkey AS DOUBLE)
        |       ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer WHERE c_custkey % 10 != 0""".stripMargin,
    // d8: OPTIMIZE to 2 files + VACUUM must keep every row and land the
    // pinned layout
    "d8_graft_sql_maintenance" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  2 AS n_files
        |FROM customer""".stripMargin,
    // t20: the union schema reads back with typed-NULL backfill — even
    // keys predate c_nationkey (NULL), everyone predates c_flag (NULL)
    "t20_graftlog_schema_evolution" ->
      """SELECT c_custkey, c_name, c_acctbal,
        |  CASE WHEN c_custkey % 2 = 1 THEN c_nationkey END AS c_nationkey,
        |  CAST(NULL AS VARCHAR) AS c_flag
        |FROM customer""".stripMargin,
    // d9: VERSION AS OF 0 must surface exactly the even-key overwrite;
    // the TIMESTAMP AS OF probe sees the full table; 2 commits total
    "d9_graft_sql_time_travel" ->
      """SELECT c_custkey, c_name, c_acctbal,
        |  (SELECT count(*) FROM customer) AS latest_rows,
        |  CAST(2 AS BIGINT) AS n_commits
        |FROM customer WHERE c_custkey % 2 = 0""".stripMargin,
    // d10: the violating batch never lands (n_rejected=1); the valid
    // append is the NOT-EXISTS insert slice passing both constraints
    "d10_graft_sql_constraints" ->
      s"""WITH $incCte
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         |  2 AS n_constraints, 1 AS n_rejected
         |FROM customer
         |UNION ALL
         |SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |  inc_mktsegment, 2, 1
         |FROM inc
         |WHERE NOT EXISTS
         |  (SELECT 1 FROM customer b WHERE b.c_custkey = inc.inc_custkey)
         |  AND inc_acctbal >= -1000.0 AND inc_name IS NOT NULL
         |""".stripMargin,
    // d11: final state after UPDATE-matched + DELETE-unmatched-by-source
    // (no insert clause): exactly the snapshot rows whose key existed —
    // %3==0 keys closed, novel (+10M) keys ignored
    "d11_merge_scd_closeout" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 3 <> 0""".stripMargin,
    // d20: per-column replay — KMV ndv (same md5-slice + kth-min
    // formula as g13), min/max as canonical strings, null counts
    "d20_analyze_columns" ->
      """WITH r AS (SELECT count(*) AS row_count FROM customer),
        |k AS (SELECT 256 AS k),
        |hk AS (
        |  SELECT col_name, hv,
        |    row_number() OVER (PARTITION BY col_name ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY col_name) AS nd
        |  FROM (
        |    SELECT DISTINCT col_name,
        |      CAST(('0x' || substr(md5(sval), 1, 15))::UBIGINT AS BIGINT)
        |        AS hv
        |    FROM (
        |      SELECT 'c_custkey' AS col_name,
        |        CAST(c_custkey AS VARCHAR) AS sval FROM customer
        |      UNION ALL
        |      SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR)
        |      FROM customer
        |      UNION ALL
        |      SELECT 'c_mktsegment', c_mktsegment FROM customer)
        |    WHERE sval IS NOT NULL)
        |), est AS (
        |  SELECT col_name,
        |    CASE WHEN max(nd) < (SELECT k FROM k)
        |      THEN CAST(max(nd) AS DOUBLE)
        |      ELSE round(((SELECT k FROM k) - 1) * pow(2.0, 60)
        |        / CAST(max(CASE WHEN rn = (SELECT k FROM k)
        |                        THEN hv END) AS DOUBLE), 6)
        |      END AS ndv_est
        |  FROM hk GROUP BY 1
        |), mm AS (
        |  SELECT 'c_custkey' AS col_name,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_v,
        |    CAST(max(c_custkey) AS VARCHAR) AS max_v,
        |    count(*) - count(c_custkey) AS null_count
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_nationkey', CAST(min(c_nationkey) AS VARCHAR),
        |    CAST(max(c_nationkey) AS VARCHAR),
        |    count(*) - count(c_nationkey)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', min(c_mktsegment), max(c_mktsegment),
        |    count(*) - count(c_mktsegment)
        |  FROM customer
        |)
        |SELECT mm.col_name, est.ndv_est, mm.min_v, mm.max_v,
        |  CAST(mm.null_count AS BIGINT) AS null_count,
        |  (SELECT row_count FROM r) AS row_count
        |FROM mm JOIN est USING (col_name)""".stripMargin,
    // d28: the incrementally-refreshed stats must equal a from-scratch
    // ANALYZE of the final (triple-domain) table — KMV union over
    // disjoint inputs IS the KMV of the union, min/max/nullCount fold
    // exactly from per-file metadata
    "d28_stats_refresh" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_acctbal, c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 20000000, c_acctbal, c_mktsegment
        |  FROM customer),
        |r AS (SELECT count(*) AS row_count FROM cust),
        |k AS (SELECT 256 AS k),
        |hk AS (
        |  SELECT col_name, hv,
        |    row_number() OVER (PARTITION BY col_name ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY col_name) AS nd
        |  FROM (
        |    SELECT DISTINCT col_name,
        |      CAST(('0x' || substr(md5(sval), 1, 15))::UBIGINT AS BIGINT)
        |        AS hv
        |    FROM (
        |      SELECT 'c_custkey' AS col_name,
        |        CAST(c_custkey AS VARCHAR) AS sval FROM cust
        |      UNION ALL
        |      SELECT 'c_acctbal', CAST(c_acctbal AS VARCHAR) FROM cust
        |      UNION ALL
        |      SELECT 'c_mktsegment', c_mktsegment FROM cust)
        |    WHERE sval IS NOT NULL)
        |), est AS (
        |  SELECT col_name,
        |    CASE WHEN max(nd) < (SELECT k FROM k)
        |      THEN CAST(max(nd) AS DOUBLE)
        |      ELSE round(((SELECT k FROM k) - 1) * pow(2.0, 60)
        |        / CAST(max(CASE WHEN rn = (SELECT k FROM k)
        |                        THEN hv END) AS DOUBLE), 6)
        |      END AS ndv_est
        |  FROM hk GROUP BY 1
        |), mm AS (
        |  SELECT 'c_custkey' AS col_name,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_v,
        |    CAST(max(c_custkey) AS VARCHAR) AS max_v,
        |    count(*) - count(c_custkey) AS null_count
        |  FROM cust
        |  UNION ALL
        |  SELECT 'c_acctbal', CAST(min(c_acctbal) AS VARCHAR),
        |    CAST(max(c_acctbal) AS VARCHAR),
        |    count(*) - count(c_acctbal)
        |  FROM cust
        |  UNION ALL
        |  SELECT 'c_mktsegment', min(c_mktsegment), max(c_mktsegment),
        |    count(*) - count(c_mktsegment)
        |  FROM cust
        |)
        |SELECT mm.col_name, est.ndv_est, mm.min_v, mm.max_v,
        |  CAST(mm.null_count AS BIGINT) AS null_count,
        |  (SELECT row_count FROM r) AS row_count
        |FROM mm JOIN est USING (col_name)""".stripMargin,
    // d23: COPY INTO loaded the even keys exactly once — the full
    // customer set with the no-op second run pinned at 0/0
    "d23_copy_into" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal,
        |  c_mktsegment,
        |  CAST(0 AS BIGINT) AS second_run_files,
        |  CAST(0 AS BIGINT) AS second_run_rows
        |FROM customer""".stripMargin,
    // d26: defaults re-derived as literals — the omitted-both feed gets
    // both fills, the acctbal-carrying feed keeps its own values
    "d26_column_defaults" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        |UNION ALL
        |SELECT c_custkey + 1000000, c_name, CAST(0.0 AS DOUBLE),
        |  'UNSPECIFIED'
        |FROM customer WHERE c_custkey % 10 = 0
        |UNION ALL
        |SELECT c_custkey + 2000000, c_name, c_acctbal, 'UNSPECIFIED'
        |FROM customer WHERE c_custkey % 10 = 3""".stripMargin,
    // d25: the manifest-routed read must equal the post-DELETE table;
    // manifest_per_partition pins one manifest file per segment dir
    "d25_symlink_manifest" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE),
        |    6) AS total_acctbal,
        |  TRUE AS manifest_per_partition
        |FROM customer WHERE c_custkey % 10 <> 0 GROUP BY 1""".stripMargin,
    // d24: full-ON replay — BUILDING key-matches updated; source rows
    // whose target counterpart fails the extra conjunct inserted as
    // legal duplicate keys (Delta's NOT MATCHED definition)
    "d24_merge_on_extra" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_custkey % 4 = 0 AND c_mktsegment = 'BUILDING'
        |       THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey,
        |  c_acctbal + 100.0 AS c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_custkey % 4 = 0 AND c_mktsegment <> 'BUILDING'""".stripMargin,
    // d21: replay of the clause cascade — matched EXPIRED keys
    // (%3<>0 AND %7=0) deleted FIRST (clause order), matched changed
    // balances (%3<>0 AND %5=0) updated to the bumped value, the
    // target's own segment kept (column-level SET touches c_acctbal
    // only), novel keys inserted verbatim
    "d21_merge_conditional" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_custkey % 3 <> 0 AND c_custkey % 5 = 0
        |       THEN c_acctbal + 500.0 ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer
        |WHERE NOT (c_custkey % 3 <> 0 AND c_custkey % 7 = 0)
        |UNION ALL
        |SELECT c_custkey + 10000000 AS c_custkey, c_name, c_nationkey,
        |  c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 100 = 2""".stripMargin,
    // d12: expiry is metadata-only — the live rows survive intact and
    // exactly one version remains addressable
    "d12_graft_sql_expire" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  1 AS n_versions
        |FROM customer""".stripMargin,
    // d13: convert preserves every row byte-for-byte (v0), then the
    // first transactional DELETE lands as v1
    "d13_graft_sql_convert" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  2 AS n_versions
        |FROM customer WHERE c_custkey % 7 <> 0""".stripMargin,
    // d14: the tagged v0 snapshot (even keys) survives a RETAIN 1
    // vacuum and resolves via VERSION AS OF 'baseline'; exactly the
    // live v2 + pinned v0 remain addressable
    "d14_graft_sql_tags" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  (SELECT count(*) FROM customer) AS latest_rows,
        |  2 AS n_versions
        |FROM customer WHERE c_custkey % 2 = 0""".stripMargin,
    // d16: OVERWRITE replaced the full set with keys <= 500, the last
    // INSERT appended (500, 600]; v1 (full customer set) stays
    // time-travelable — proof every statement landed as a commit
    "d16_sql_insert" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  (SELECT count(*) FROM customer) AS v1_rows,
        |  4 AS n_versions
        |FROM customer WHERE c_custkey <= 600""".stripMargin,
    // d19: TRUNCATE landed as a commit (v0 stays time-travelable with
    // the full row count) and the refill INSERT routed through the log
    "d19_sql_truncate" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  (SELECT count(*) FROM customer) AS v0_rows,
        |  3 AS n_versions
        |FROM customer WHERE c_custkey <= 500""".stripMargin,
    // d18: the metadata surface agrees exactly with the data —
    // partition specs = distinct segment values, metadata row sum =
    // table count, every logged size positive
    "d18_metadata_tables" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  CAST((SELECT count(DISTINCT c_mktsegment) FROM customer)
        |    AS INTEGER) AS n_partitions,
        |  (SELECT count(*) FROM customer) AS meta_rows,
        |  TRUE AS sizes_ok
        |FROM customer""".stripMargin,
    // d17: the log-folded rowCount equals the VISIBLE count after the
    // DV delete (physical minus masked positions), both as the command
    // result and as the stored property
    "d17_analyze_stats" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  (SELECT count(*) FROM customer WHERE c_custkey % 10 <> 0)
        |    AS stat_rows,
        |  (SELECT count(*) FROM customer WHERE c_custkey % 10 <> 0)
        |    AS stat_rows_prop,
        |  TRUE AS bytes_positive
        |FROM customer WHERE c_custkey % 10 <> 0""".stripMargin,
    // d15: the appendOnly-blocked delete removed nothing; after UNSET
    // the same predicate lands (v0 write, v1 set, v2 unset, v3 delete);
    // one property ('team') survives the unset
    "d15_tblproperties" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  1 AS n_props, 4 AS n_versions
        |FROM customer WHERE c_custkey % 10 <> 0""".stripMargin,
    // t15: restore rewinds the live set to v0 — the read is the seed
    "t15_graftlog_restore" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,
    // e13: the directional normalizer over the same distinct-shingle
    // sets as e7's oracle; both directions when both clear the threshold
    "e13_dedup_containment" ->
      """WITH docs AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3
        |)
        |SELECT doc_in, doc_out, round(containment, 6) AS containment FROM (
        |  SELECT a.doc_id AS doc_in, b.doc_id AS doc_out,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    CAST(len(a.sh) AS DOUBLE) AS containment
        |  FROM docs a JOIN docs b ON a.doc_id != b.doc_id
        |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
        |WHERE containment >= 0.5""".stripMargin,
    // e14: the bucketed twin replays the identical hash-domain pipeline —
    // the size-partition CASE and per-bucket overlap-bound CASE come from
    // the same Scala generators the Spark plan uses, so candidate
    // generation is collision-for-collision exact
    "e14_dedup_containment_bucketed" ->
      s"""WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), win AS (
        |  SELECT doc_id, list_transform(range(1, len(toks)-1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS w
        |  FROM base WHERE len(toks) >= 3
        |), hu AS (
        |  SELECT doc_id, list_transform(w,
        |    s -> ('0x' || substr(md5(s), 1, 16))::UBIGINT) AS u
        |  FROM win
        |), parts AS (
        |  SELECT doc_id, hsh, sz, part,
        |    ${Dedup.containKSql("part", 0.5)} AS k
        |  FROM (
        |    SELECT doc_id, hsh, sz, ${Dedup.containPartSql("sz")} AS part
        |    FROM (
        |      SELECT doc_id,
        |        list_sort(list_distinct(list_transform(u, x ->
        |          CAST(CASE WHEN x >= '9223372036854775808'::HUGEINT
        |            THEN x::HUGEINT - '18446744073709551616'::HUGEINT
        |            ELSE x::HUGEINT END AS BIGINT)))) AS hsh,
        |        CAST(len(list_distinct(u)) AS INTEGER) AS sz
        |      FROM hu))
        |), sidx AS (
        |  SELECT doc_id, part, k,
        |    unnest(list_slice(hsh, 1, sz - k + 1)) AS hs
        |  FROM parts
        |), lidx AS (
        |  SELECT doc_id, part, sz, CAST(i AS INTEGER) - 1 AS pos,
        |    hsh[CAST(i AS INTEGER)] AS hs
        |  FROM parts, UNNEST(range(1, len(hsh) + 1)) AS u(i)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_lo, y.doc_id AS doc_hi
        |  FROM sidx x JOIN lidx y ON x.hs = y.hs
        |    AND (x.part < y.part
        |         OR (x.part = y.part AND x.doc_id < y.doc_id))
        |    AND y.pos <= y.sz - x.k
        |), v AS (
        |  SELECT c.doc_lo, c.doc_hi,
        |    len(list_intersect(a.hsh, b.hsh)) AS inter,
        |    a.sz AS n_lo, b.sz AS n_hi
        |  FROM cand c JOIN parts a ON a.doc_id = c.doc_lo
        |              JOIN parts b ON b.doc_id = c.doc_hi
        |), both_dirs AS (
        |  SELECT doc_lo AS doc_in, doc_hi AS doc_out,
        |    CAST(inter AS DOUBLE) / CAST(n_lo AS DOUBLE) AS containment
        |  FROM v
        |  UNION ALL
        |  SELECT doc_hi, doc_lo,
        |    CAST(inter AS DOUBLE) / CAST(n_hi AS DOUBLE)
        |  FROM v)
        |SELECT doc_in, doc_out, round(containment, 6) AS containment
        |FROM both_dirs WHERE containment >= 0.5""".stripMargin,
    // e15: occurrence windows (positions kept), cross-doc repeated
    // hashes, span merge + coverage as pure integer list arithmetic —
    // replayed step for step
    "e15_dedup_substring_spans" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n_toks
        |  FROM base WHERE len(toks) >= 8
        |), wins AS (
        |  SELECT doc_id, n_toks, CAST(j AS INTEGER) - 1 AS pos,
        |    CAST(('0x' || substr(md5(array_to_string(
        |      toks[CAST(j AS INTEGER):CAST(j AS INTEGER) + 7], ' ')),
        |      1, 15))::UBIGINT AS BIGINT) AS h
        |  FROM d, UNNEST(range(1, n_toks - 8 + 2)) AS u(j)
        |), dup AS (
        |  SELECT h FROM wins GROUP BY h
        |  HAVING count(DISTINCT doc_id) >= 2
        |), agg AS (
        |  SELECT w.doc_id, w.n_toks, count(*) AS n_dup_windows,
        |    list_sort(list(w.pos)) AS ps
        |  FROM wins w JOIN dup USING (h)
        |  GROUP BY 1, 2
        |), fin AS (
        |  SELECT doc_id, n_toks, n_dup_windows,
        |    list_transform(range(2, len(ps) + 1),
        |      i -> ps[CAST(i AS INTEGER)] - ps[CAST(i AS INTEGER) - 1])
        |      AS diffs
        |  FROM agg
        |)
        |SELECT doc_id, n_toks, n_dup_windows,
        |  CAST(len(list_filter(diffs, x -> x > 8)) + 1 AS INTEGER)
        |    AS n_dup_spans,
        |  CAST(coalesce(list_aggregate(
        |    list_transform(diffs, x -> least(x, 8)), 'sum'), 0) + 8
        |    AS BIGINT) AS dup_tokens,
        |  round(CAST(coalesce(list_aggregate(
        |    list_transform(diffs, x -> least(x, 8)), 'sum'), 0) + 8
        |    AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS dup_fraction
        |FROM fin""".stripMargin,
    // e24: the cut replay — keeper = min packed (doc_id, pos) per
    // ≥2-occurrence window hash; every other occurrence merges into
    // per-doc spans by the e15 gap fold
    "e24_dedup_substring_cut" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n_toks
        |  FROM base WHERE len(toks) >= 8
        |), wins AS (
        |  SELECT doc_id, n_toks, CAST(j AS INTEGER) - 1 AS pos,
        |    doc_id * 1048576 + CAST(j AS INTEGER) - 1 AS okey,
        |    CAST(('0x' || substr(md5(array_to_string(
        |      toks[CAST(j AS INTEGER):CAST(j AS INTEGER) + 7], ' ')),
        |      1, 15))::UBIGINT AS BIGINT) AS h
        |  FROM d, UNNEST(range(1, n_toks - 8 + 2)) AS u(j)
        |), keepers AS (
        |  SELECT h, min(okey) AS keep_key FROM wins GROUP BY h
        |  HAVING count(*) >= 2
        |), agg AS (
        |  SELECT w.doc_id, w.n_toks, count(*) AS n_cut_windows,
        |    list_sort(list(w.pos)) AS ps
        |  FROM wins w JOIN keepers USING (h)
        |  WHERE w.okey <> keepers.keep_key
        |  GROUP BY 1, 2
        |), fin AS (
        |  SELECT doc_id, n_toks, n_cut_windows,
        |    list_transform(range(2, len(ps) + 1),
        |      i -> ps[CAST(i AS INTEGER)] - ps[CAST(i AS INTEGER) - 1])
        |      AS diffs
        |  FROM agg
        |)
        |SELECT doc_id, n_toks, n_cut_windows,
        |  CAST(coalesce(list_aggregate(
        |    list_transform(diffs, x -> least(x, 8)), 'sum'), 0) + 8
        |    AS BIGINT) AS cut_tokens,
        |  CAST(n_toks - (coalesce(list_aggregate(
        |    list_transform(diffs, x -> least(x, 8)), 'sum'), 0) + 8)
        |    AS BIGINT) AS kept_tokens,
        |  round(CAST(coalesce(list_aggregate(
        |    list_transform(diffs, x -> least(x, 8)), 'sum'), 0) + 8
        |    AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS cut_fraction
        |FROM fin""".stripMargin,
  )

  /** f4's Lloyd sweeps unrolled as CTEs: assignment (crank=1 vs c_i) →
    * per-dimension mean with EXACT decimal sums (mirrors
    * Deterministic.sumExact — a double sum would be partition-order
    * dependent on the Spark side) → re-assembled centroid vector c_{i+1}. */
  private def lloydCtes(iters: Int): String =
    (0 until iters).map { i =>
      s"""a$i AS (
         |  SELECT cent_id, v FROM (
         |    SELECT x.vec_id, c.cent_id, x.v,
         |      row_number() OVER (PARTITION BY x.vec_id
         |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
         |          DESC, c.cent_id) AS crank
         |    FROM n x CROSS JOIN c$i c)
         |  WHERE crank = 1
         |), e$i AS (
         |  SELECT cent_id, v, unnest(range(0, len(v))) AS pos FROM a$i
         |), s$i AS (
         |  SELECT cent_id, pos,
         |    CAST(sum(CAST(v[pos + 1] AS DECIMAL(38,10))) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE) AS m
         |  FROM e$i GROUP BY 1, 2
         |), c${i + 1} AS (
         |  SELECT cent_id, cv, sqrt(list_dot_product(cv, cv)) AS cnorm
         |  FROM (SELECT cent_id, array_agg(m ORDER BY pos) AS cv
         |        FROM s$i GROUP BY 1)
         |)""".stripMargin
    }.mkString(",\n")

  /** f7's per-subspace Lloyd unroll: assignment under cb`i` (same
    * strict-fold squared distance as the Spark side), per-(m, c, pos)
    * exact-decimal mean, reassembled as cb`i+1`. */
  /** f8 oracle: the f3 cell machinery + the f7 PQ machinery composed on
    * residuals — `subs` here carries RESIDUAL subvectors (so
    * [[pqLloydCtes]] trains the residual codebooks verbatim), ADC tables
    * are per probed cell, and the ADC join is cell-confined. */
  private val ivfadcOracle: String =
    s"""WITH n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |), cents AS (
      |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      |  FROM n WHERE vec_id < 16
      |), asg AS (
      |  SELECT vec_id, cent_id,
      |    list_transform(list_zip(v, cv), z -> z[1] - z[2]) AS rv
      |  FROM (
      |    SELECT x.vec_id, c.cent_id, x.v, c.cv,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
      |          DESC, c.cent_id) AS crank
      |    FROM n x CROSS JOIN cents c)
      |  WHERE crank = 1
      |), subs AS (
      |  SELECT vec_id, cent_id, CAST(j AS INTEGER) AS m,
      |    rv[(j*16 + 1):(j*16 + 16)] AS sub
      |  FROM asg, UNNEST(range(0, 4)) AS u(j)
      |), cb0 AS (
      |  SELECT m, CAST(vec_id AS INTEGER) AS c, sub AS cw
      |  FROM subs WHERE vec_id < 16
      |),
      |${pqLloydCtes(2)},
      |cb AS (SELECT m, c, cw FROM cb2),
      |enc AS (
      |  SELECT vec_id, cent_id, m, c FROM (
      |    SELECT s.vec_id, s.cent_id, s.m, cb.c,
      |      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
      |        list_dot_product(
      |          list_transform(list_zip(s.sub, cb.cw), z -> z[1] - z[2]),
      |          list_transform(list_zip(s.sub, cb.cw), z -> z[1] - z[2]))
      |          ASC, cb.c ASC) AS r
      |    FROM subs s JOIN cb USING (m))
      |  WHERE r = 1
      |), probes AS (
      |  SELECT vec_id AS query_id, cent_id,
      |    list_transform(list_zip(v, cv), z -> z[1] - z[2]) AS rv
      |  FROM (
      |    SELECT x.vec_id, c.cent_id, x.v, c.cv,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
      |          DESC, c.cent_id) AS crank
      |    FROM n x CROSS JOIN cents c
      |    WHERE x.vec_id < 10)
      |  WHERE crank <= 4
      |), qsubs AS (
      |  SELECT query_id, cent_id, CAST(j AS INTEGER) AS m,
      |    rv[(j*16 + 1):(j*16 + 16)] AS sub
      |  FROM probes, UNNEST(range(0, 4)) AS u(j)
      |), dts AS (
      |  SELECT q.query_id, q.cent_id, q.m, cb.c,
      |    list_dot_product(
      |      list_transform(list_zip(q.sub, cb.cw), z -> z[1] - z[2]),
      |      list_transform(list_zip(q.sub, cb.cw), z -> z[1] - z[2]))
      |      AS dt
      |  FROM qsubs q JOIN cb USING (m)
      |), adc AS (
      |  SELECT d.query_id, e.vec_id,
      |    sum(CAST(d.dt AS DECIMAL(38,10))) AS adc_d2
      |  FROM enc e JOIN dts d
      |    ON d.cent_id = e.cent_id AND d.m = e.m AND d.c = e.c
      |  WHERE e.vec_id != d.query_id
      |  GROUP BY 1, 2
      |), short AS (
      |  SELECT query_id, vec_id, adc_d2 FROM (
      |    SELECT query_id, vec_id, adc_d2,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY adc_d2 ASC, vec_id ASC) AS adc_rank
      |    FROM adc)
      |  WHERE adc_rank <= 50
      |), refined AS (
      |  SELECT t.query_id, t.vec_id, t.adc_d2,
      |    list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cosine
      |  FROM short t
      |  JOIN n c ON c.vec_id = t.vec_id
      |  JOIN n q ON q.vec_id = t.query_id
      |)
      |SELECT query_id, vec_id AS neighbor_id, rank,
      |  round(CAST(adc_d2 AS DOUBLE), 6) AS adc_d2,
      |  round(cosine, 6) AS cosine
      |FROM (
      |  SELECT query_id, vec_id, adc_d2, cosine,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
      |  FROM refined)
      |WHERE rank <= 5""".stripMargin

  private def pqLloydCtes(iters: Int): String =
    (0 until iters).map { i =>
      s"""pa$i AS (
         |  SELECT m, c, sub FROM (
         |    SELECT s.vec_id, s.m, cb.c, s.sub,
         |      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
         |        list_dot_product(
         |          list_transform(list_zip(s.sub, cb.cw), z -> z[1] - z[2]),
         |          list_transform(list_zip(s.sub, cb.cw), z -> z[1] - z[2]))
         |          ASC, cb.c ASC) AS r
         |    FROM subs s JOIN cb$i cb USING (m))
         |  WHERE r = 1
         |), px$i AS (
         |  SELECT m, c, unnest(range(0, len(sub))) AS pos, sub FROM pa$i
         |), ps$i AS (
         |  SELECT m, c, pos,
         |    CAST(sum(CAST(sub[pos + 1] AS DECIMAL(38,10))) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE) AS mean
         |  FROM px$i GROUP BY 1, 2, 3
         |), cb${i + 1} AS (
         |  SELECT m, c, array_agg(mean ORDER BY pos) AS cw
         |  FROM ps$i GROUP BY 1, 2
         |)""".stripMargin
    }.mkString(",\n")

  /** Shared e2/e7 oracle: exact all-pairs n-gram Jaccard over doc_id <
    * bound, with the bound surfaced in the result like the Spark side. */
  private def ngramJaccardOracle(bound: Long, lit: String): String =
    s"""WITH docs AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
       |        FROM documents WHERE doc_id < $bound)
       |  WHERE len(toks) >= 3
       |)
       |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard,
       |  CAST($lit AS BIGINT) AS max_doc_id FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
       |         AS DOUBLE) AS jaccard
       |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
       |WHERE jaccard >= 0.1""".stripMargin

  private val windowedAggOracle: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
      |  event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
      |    AS total_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  // sliding 1h/30min: every event belongs to exactly two windows — the
  // 30-min bucket's hour window and the one starting 30 min earlier
  private val slidingAggOracle: String =
    """WITH w AS (
      |  SELECT event_type, value,
      |    unnest([time_bucket(INTERVAL '30 minutes', ts),
      |            time_bucket(INTERVAL '30 minutes', ts)
      |              - INTERVAL 30 MINUTE]) AS window_start
      |  FROM events
      |)
      |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
      |  event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
      |    AS total_value
      |FROM w GROUP BY 1, 2, 3""".stripMargin

  private val sessionizeOracle: String =
    """WITH t AS (
      |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
      |), o AS (
      |  SELECT user_id, event_id, ts, us,
      |    CASE WHEN lag(us) OVER w IS NULL
      |              OR us - lag(us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, ts, us,
      |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o
      |)
      |SELECT user_id, CAST(sid AS INTEGER) AS session_id,
      |  count(*) AS n_events, min(ts) AS session_start,
      |  max(ts) AS session_end, max(us) - min(us) AS duration_us
      |FROM s GROUP BY 1, 2""".stripMargin

  private val clickErrorOracle: String =
    """SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
      |  epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
      |FROM events c JOIN events e
      |  ON c.user_id = e.user_id
      | AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR
      |WHERE c.event_type = 'click' AND e.event_type = 'error'""".stripMargin

  private val enrichOracle: String =
    """SELECT c_mktsegment AS segment, event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
      |    AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2""".stripMargin

  /** e3's full pair-producing SQL, shared verbatim by the e9
    * connected-components oracle (which wraps it as a subquery). */
  private val minhashPairsOracle: String =
    """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
        |  FROM base WHERE len(toks) >= 3
        |), hs AS (
        |  SELECT doc_id, list_transform(shingles,
        |    s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT % 2147483647
        |         AS BIGINT)) AS h
        |  FROM sh
        |), sigs AS (
        |  SELECT doc_id, list_transform(range(0, 64), i ->
        |    list_aggregate(list_transform(h,
        |      x -> ((2*i + 1) * x + i + 1) % 2147483647), 'min')) AS sig
        |  FROM hs
        |), banded AS (
        |  SELECT doc_id, band,
        |    sig[band*4 + 1] AS s0, sig[band*4 + 2] AS s1,
        |    sig[band*4 + 3] AS s2, sig[band*4 + 4] AS s3
        |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) bs
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM banded x JOIN banded y
        |    ON x.band = y.band AND x.s0 = y.s0 AND x.s1 = y.s1
        |    AND x.s2 = y.s2 AND x.s3 = y.s3 AND x.doc_id < y.doc_id
        |), dsh AS (
        |  SELECT doc_id, list_distinct(shingles) AS sh FROM sh
        |)
        |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
        |  SELECT c.doc_a, c.doc_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
        |         AS DOUBLE) AS jaccard
        |  FROM cand c JOIN dsh a ON a.doc_id = c.doc_a
        |              JOIN dsh b ON b.doc_id = c.doc_b)
        |WHERE jaccard >= 0.2""".stripMargin

  /** e17's oracle: the e3 sketch replicated asymmetrically — candidates
    * from batch×corpus band collisions only, verified exactly, one
    * verdict row per batch doc. */
  private val incrementalNearDupOracle: String =
    """WITH base AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      |  FROM base WHERE len(toks) >= 3
      |), hs AS (
      |  SELECT doc_id, list_transform(shingles,
      |    s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT % 2147483647
      |         AS BIGINT)) AS h
      |  FROM sh
      |), sigs AS (
      |  SELECT doc_id, list_transform(range(0, 64), i ->
      |    list_aggregate(list_transform(h,
      |      x -> ((2*i + 1) * x + i + 1) % 2147483647), 'min')) AS sig
      |  FROM hs
      |), banded AS (
      |  SELECT doc_id, band,
      |    sig[band*4 + 1] AS s0, sig[band*4 + 2] AS s1,
      |    sig[band*4 + 3] AS s2, sig[band*4 + 4] AS s3
      |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) bs
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_b, y.doc_id AS doc_c
      |  FROM banded x JOIN banded y
      |    ON x.band = y.band AND x.s0 = y.s0 AND x.s1 = y.s1
      |    AND x.s2 = y.s2 AND x.s3 = y.s3
      |  WHERE x.doc_id >= 350 AND y.doc_id < 350
      |), dsh AS (
      |  SELECT doc_id, list_distinct(shingles) AS sh FROM sh
      |), verified AS (
      |  SELECT doc_b, jaccard FROM (
      |    SELECT c.doc_b,
      |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
      |           AS DOUBLE) AS jaccard
      |    FROM cand c JOIN dsh a ON a.doc_id = c.doc_b
      |                JOIN dsh b ON b.doc_id = c.doc_c)
      |  WHERE jaccard >= 0.2
      |), agg AS (
      |  SELECT doc_b AS doc_id, count(*) AS n_near_dups,
      |    round(max(jaccard), 6) AS best_jaccard
      |  FROM verified GROUP BY 1
      |)
      |SELECT d.doc_id, coalesce(a.n_near_dups, 0) AS n_near_dups,
      |  a.best_jaccard, (a.doc_id IS NOT NULL) AS is_near_dup
      |FROM (SELECT doc_id FROM documents WHERE doc_id >= 350) d
      |LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin

  private val baseOracle: Map[String, String] = Map(
    "e17_neardup_incremental" -> incrementalNearDupOracle,
    "i1_events_windowed_agg"        -> windowedAggOracle,
    "i2_events_windowed_agg_stream" -> windowedAggOracle,
    "i11_events_sliding_agg"        -> slidingAggOracle,
    "i12_events_sliding_agg_stream" -> slidingAggOracle,
    "i3_events_sessionize"          -> sessionizeOracle,
    // i26: session_window semantics — gap-equal successor starts a NEW
    // session (>=), session_end = last event + gap
    "i26_session_window" ->
      """WITH t AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us, value
        |  FROM events
        |), o AS (
        |  SELECT user_id, event_id, ts, us, value,
        |    CASE WHEN lag(us) OVER w IS NULL
        |              OR us - lag(us) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS is_start
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts, us, value,
        |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "i4_events_sessionize_stateful" -> sessionizeOracle,
    "i5_events_enrich"              -> enrichOracle,
    "i6_events_enrich_stream"       -> enrichOracle,
    "i7_stream_dedup_keys" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    // i21: the whole finite backfill sits inside the 10-day watermark
    // window, so no state evicts mid-stream and nothing re-emits: the
    // watermark-bounded dedup equals the batch distinct over the window
    "i21_stream_dedup_watermark" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "i8_click_error_join"        -> clickErrorOracle,
    "i9_click_error_join_stream" -> clickErrorOracle,
    "i10_restart_exactly_once" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    "g9_token_count_regex" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(string_split(lower(text), ' ')) AS INTEGER)
        |    AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS INTEGER)
        |    AS n_bpe_tokens,
        |  CASE WHEN len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) > 0
        |    THEN round(CAST(n_chars AS DOUBLE) /
        |      CAST(len(regexp_extract_all(text,
        |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS DOUBLE), 6)
        |    ELSE NULL END AS chars_per_token
        |FROM documents""".stripMargin,
    "j2_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(json_extract_string(props, '$.k')) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |      AS DOUBLE) /
        |    CAST(count(json_extract_string(props, '$.k')) AS DOUBLE), 6)
        |    AS avg_k
        |FROM events GROUP BY 1""".stripMargin,
    "a1_bronze_quotes" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_shipdate AS DATE) AS trade_date,
        |  l_returnflag AS ticker, 'GRAFT' AS exchange,
        |  round(CAST(CAST(l_extendedprice AS DECIMAL(38,10)) AS DOUBLE), 6)
        |    AS price,
        |  round(CAST(CAST(l_quantity AS DECIMAL(38,10)) AS DOUBLE), 6)
        |    AS qty,
        |  round(CAST(CAST(l_discount AS DECIMAL(38,10)) AS DOUBLE), 6)
        |    AS discount,
        |  round(CAST(CAST(l_tax AS DECIMAL(38,10)) AS DOUBLE), 6) AS tax
        |FROM lineitem""".stripMargin,
    "a2_silver_asset_perf" ->
      """SELECT trade_date, ticker,
        |  round(CAST(CAST(max(price) AS DECIMAL(38,10)) AS DOUBLE), 6)
        |    AS high_price,
        |  round(CAST(CAST(min(price) AS DECIMAL(38,10)) AS DOUBLE), 6)
        |    AS low_price,
        |  round(CAST(CAST(arg_min(price, seq) AS DECIMAL(38,10))
        |        AS DOUBLE), 6) AS open_price,
        |  round(CAST(CAST(arg_max(price, seq) AS DECIMAL(38,10))
        |        AS DOUBLE), 6) AS close_price,
        |  round(CAST(sum(CAST(qty AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_volume,
        |  count(*) AS n_trades,
        |  TRUE AS is_active, 1 AS version,
        |  trade_date AS valid_from, DATE '2099-01-01' AS valid_to
        |FROM (SELECT CAST(l_shipdate AS DATE) AS trade_date,
        |        l_returnflag AS ticker, l_extendedprice AS price,
        |        l_quantity AS qty,
        |        l_orderkey*10 + l_linenumber AS seq
        |      FROM lineitem)
        |GROUP BY trade_date, ticker""".stripMargin,
    "a3_silver_market_trend" ->
      """SELECT trade_date, ticker,
        |  round(CAST(sum(CAST(qty AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_volume,
        |  round(CAST(sum(CAST(revenue AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_revenue,
        |  round(CAST(sum(CAST(price AS DECIMAL(38,10))) AS DOUBLE)
        |        / count(*), 6) AS avg_price,
        |  round(CAST(CAST(max(price) AS DECIMAL(38,10)) AS DOUBLE), 6)
        |    AS high_price,
        |  round(CAST(CAST(min(price) AS DECIMAL(38,10)) AS DOUBLE), 6)
        |    AS low_price,
        |  TRUE AS is_active, 1 AS version,
        |  trade_date AS valid_from, DATE '2099-01-01' AS valid_to
        |FROM (SELECT CAST(l_shipdate AS DATE) AS trade_date,
        |        l_returnflag AS ticker, l_extendedprice AS price,
        |        l_quantity AS qty,
        |        l_extendedprice * (1.0 - l_discount) AS revenue
        |      FROM lineitem)
        |GROUP BY trade_date, ticker""".stripMargin,
    "a4_gold_monthly_rollup" ->
      """WITH silver AS (
        |  SELECT CAST(l_shipdate AS DATE) AS trade_date,
        |    l_returnflag AS ticker,
        |    CAST(CAST(arg_max(l_extendedprice, l_orderkey*10 + l_linenumber)
        |         AS DECIMAL(38,10)) AS DOUBLE) AS close
        |  FROM lineitem
        |  GROUP BY 1, 2
        |), sums AS (
        |  SELECT CAST(year(trade_date) AS INTEGER) AS year,
        |    CAST(month(trade_date) AS INTEGER) AS month, ticker,
        |    sum(CAST(close AS DECIMAL(38,10))) AS s_dec,
        |    sum(CAST(close * close AS DECIMAL(38,10))) AS ss_dec,
        |    count(*) AS n_days
        |  FROM silver GROUP BY 1, 2, 3
        |)
        |SELECT year, month, ticker,
        |  round(CAST(s_dec AS DOUBLE) / n_days, 6) AS average_roi,
        |  CASE WHEN n_days > 1 THEN
        |    round(sqrt(greatest(
        |      (CAST(ss_dec AS DOUBLE)
        |        - CAST(s_dec AS DOUBLE) * CAST(s_dec AS DOUBLE)
        |          / CAST(n_days AS DOUBLE))
        |      / (CAST(n_days AS DOUBLE) - 1.0), 0.0)), 6)
        |  ELSE NULL END AS volatility,
        |  n_days
        |FROM sums""".stripMargin,
    "c1_changed_rows" ->
      s"""WITH $incCte, $changedCte
         |SELECT * FROM changed""".stripMargin,
    "c2_new_rows_leftouter" ->
      s"""WITH $incCte
         |SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |  inc_mktsegment
         |FROM inc LEFT OUTER JOIN customer b
         |  ON inc.inc_custkey = b.c_custkey
         |WHERE b.c_custkey IS NULL""".stripMargin,
    "c3_new_rows_anti" ->
      s"""WITH $incCte
         |SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |  inc_mktsegment
         |FROM inc
         |WHERE NOT EXISTS
         |  (SELECT 1 FROM customer b WHERE b.c_custkey = inc.inc_custkey)
         |""".stripMargin,
    "c4_upsert" ->
      s"""WITH $incCte, $changedCte,
         |upd AS (
         |  SELECT b.c_custkey,
         |    coalesce(c.inc_name, b.c_name) AS c_name,
         |    coalesce(c.inc_nationkey, b.c_nationkey) AS c_nationkey,
         |    coalesce(c.inc_acctbal, b.c_acctbal) AS c_acctbal,
         |    coalesce(c.inc_mktsegment, b.c_mktsegment) AS c_mktsegment
         |  FROM customer b LEFT OUTER JOIN changed c
         |    ON b.c_custkey = c.inc_custkey
         |)
         |SELECT * FROM upd
         |UNION ALL
         |SELECT inc_custkey, inc_name, inc_nationkey, inc_acctbal,
         |  inc_mktsegment
         |FROM inc
         |WHERE NOT EXISTS
         |  (SELECT 1 FROM customer b WHERE b.c_custkey = inc.inc_custkey)
         |""".stripMargin,
    "c5_scd2_apply" ->
      s"""WITH $incCte, $changedCte,
         |base AS (
         |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         |    TRUE AS is_active, 1 AS version,
         |    DATE '2024-01-01' AS valid_from, DATE '2099-01-01' AS valid_to
         |  FROM customer
         |)
         |SELECT * FROM base
         |WHERE c_custkey NOT IN (SELECT inc_custkey FROM changed)
         |UNION ALL
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         |  FALSE, version, valid_from, DATE '2024-06-01'
         |FROM base
         |WHERE c_custkey IN (SELECT inc_custkey FROM changed)
         |UNION ALL
         |SELECT b.c_custkey, c.inc_name, c.inc_nationkey, c.inc_acctbal,
         |  c.inc_mktsegment, TRUE, b.version + 1, DATE '2024-06-01',
         |  DATE '2099-01-01'
         |FROM base b JOIN changed c ON b.c_custkey = c.inc_custkey
         |""".stripMargin,
    "b1_listings_cleanse" ->
      """SELECT doc_id, lang, n_chars,
        |  trim(parts[1]) AS description,
        |  CASE WHEN parts[2] LIKE 's%'
        |    THEN trim(regexp_replace(parts[2], '^s', '')) ELSE NULL
        |  END AS rating,
        |  CASE WHEN parts[2] LIKE 's%' THEN trim(parts[3])
        |    ELSE trim(parts[2]) END AS reviews,
        |  CASE WHEN parts[2] LIKE 's%' THEN trim(parts[4])
        |    ELSE trim(parts[3]) END AS bedrooms,
        |  CASE WHEN parts[2] LIKE 's%' THEN trim(parts[5])
        |    ELSE trim(parts[4]) END AS beds
        |FROM (SELECT doc_id, lang, n_chars,
        |        string_split(text, ' ') AS parts
        |      FROM documents)""".stripMargin,
    "j1_star_revenue" ->
      """SELECT r.r_name AS region, n.n_name AS nation,
        |  round(CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
        |      AS DECIMAL(38,10))) AS DOUBLE), 6) AS total_revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem l
        |JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n   ON c.c_nationkey = n.n_nationkey
        |JOIN region r   ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "j3_revenue_rollup" ->
      """SELECT r_name AS region, n_name AS nation,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(38,10))) AS DOUBLE), 6) AS total_revenue,
        |  count(*) AS n_lineitems,
        |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    // j8: CUBE = rollup + the nation-only supergroup; GROUPING() bit
    // encoding is identical in both engines
    "j8_revenue_cube" ->
      """SELECT r_name AS region, n_name AS nation,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(38,10))) AS DOUBLE), 6) AS total_revenue,
        |  count(*) AS n_lineitems,
        |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)""".stripMargin,
    // j9: daily closes are decimal-exact (arg_max over the unique seq
    // key), window arithmetic repeats the same double expression shapes
    "j9_window_returns" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS trade_date,
        |    l_returnflag AS ticker,
        |    arg_max(CAST(l_extendedprice AS DECIMAL(38,10)),
        |      l_orderkey * 10 + l_linenumber) AS close_dec,
        |    sum(CAST(l_quantity AS DECIMAL(38,10))) AS vol_dec
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT trade_date, ticker,
        |  round(CAST(close_dec AS DOUBLE), 6) AS close,
        |  round(CAST(close_dec AS DOUBLE)
        |    / CAST(lag(close_dec, 1) OVER w AS DOUBLE) - 1.0, 6)
        |    AS daily_return,
        |  round(CAST(sum(close_dec) OVER w7 AS DOUBLE)
        |    / (count(*) OVER w7), 6) AS ma7_close,
        |  CAST(row_number() OVER w AS INTEGER) AS day_idx,
        |  CAST(rank() OVER (PARTITION BY ticker
        |    ORDER BY vol_dec DESC, trade_date ASC) AS INTEGER) AS vol_rank
        |FROM daily
        |WINDOW w AS (PARTITION BY ticker ORDER BY trade_date),
        |  w7 AS (PARTITION BY ticker ORDER BY trade_date
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    // j10: Spark `percentile` and DuckDB `quantile_cont` share the exact
    // (n-1)·p linear-interpolation definition; inputs are decimal-exact
    // daily sums cast to double on both sides
    "j10_revenue_percentiles" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS trade_date,
        |    l_returnflag AS ticker,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(38,10))) AS DOUBLE) AS rev_d
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT ticker, count(*) AS n_days,
        |  round(quantile_cont(rev_d, 0.5), 6) AS p50_revenue,
        |  round(quantile_cont(rev_d, 0.9), 6) AS p90_revenue,
        |  round(min(rev_d), 6) AS min_revenue,
        |  round(max(rev_d), 6) AS max_revenue
        |FROM daily GROUP BY 1""".stripMargin,
    "j4_revenue_pivot" ->
      """SELECT n_name AS nation,
        |  round(CAST(sum(CASE WHEN r_name = 'AFRICA'
        |    THEN CAST(rev AS DECIMAL(38,10)) END) AS DOUBLE), 6)
        |    AS "AFRICA",
        |  round(CAST(sum(CASE WHEN r_name = 'AMERICA'
        |    THEN CAST(rev AS DECIMAL(38,10)) END) AS DOUBLE), 6)
        |    AS "AMERICA",
        |  round(CAST(sum(CASE WHEN r_name = 'ASIA'
        |    THEN CAST(rev AS DECIMAL(38,10)) END) AS DOUBLE), 6)
        |    AS "ASIA",
        |  round(CAST(sum(CASE WHEN r_name = 'EUROPE'
        |    THEN CAST(rev AS DECIMAL(38,10)) END) AS DOUBLE), 6)
        |    AS "EUROPE",
        |  round(CAST(sum(CASE WHEN r_name = 'MIDDLE EAST'
        |    THEN CAST(rev AS DECIMAL(38,10)) END) AS DOUBLE), 6)
        |    AS "MIDDLE EAST"
        |FROM (SELECT n_name, r_name,
        |        l_extendedprice * (1.0 - l_discount) AS rev
        |      FROM lineitem
        |      JOIN orders   ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation   ON c_nationkey = n_nationkey
        |      JOIN region   ON n_regionkey = r_regionkey)
        |GROUP BY 1""".stripMargin,
    // g11: the KMV sketch is a pure function of the distinct hash set, so
    // DuckDB reproduces the k minima (window rank) and the estimate
    // formula exactly — an approximate algorithm with an exact oracle.
    // k is interpolated from KmvK so the Spark query and the oracle can
    // never disagree on the sketch size.
    "g11_kmv_distinct_tokens" ->
      s"""WITH toks AS (
         |  SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents
         |), h AS (
         |  SELECT DISTINCT lang,
         |    CAST(('0x' || substr(md5(tok), 1, 15))::UBIGINT AS BIGINT) AS hv
         |  FROM toks
         |), r AS (
         |  SELECT lang, hv,
         |    row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS nd
         |  FROM h
         |)
         |SELECT lang, CAST(max(nd) AS BIGINT) AS exact_distinct,
         |  round(CASE WHEN max(nd) < $KmvK THEN CAST(max(nd) AS DOUBLE)
         |    ELSE ($KmvK - 1) * pow(2.0, 60)
         |         / CAST(max(CASE WHEN rn = $KmvK THEN hv END) AS DOUBLE)
         |    END, 6) AS kmv_estimate
         |FROM r GROUP BY lang""".stripMargin,
    // j5: the as-of composition mirrors exactly — running max over a
    // named struct; struct comparison is lexicographic in both engines
    "j5_asof_last_view" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type = 'view' AS is_view
        |  FROM events WHERE event_type IN ('view', 'click')
        |), m AS (
        |  SELECT user_id, event_id, us, is_view,
        |    max(CASE WHEN is_view
        |        THEN struct_pack(us := us, event_id := event_id) END) OVER
        |      (PARTITION BY user_id ORDER BY us, event_id
        |       ROWS UNBOUNDED PRECEDING) AS lv
        |  FROM t
        |)
        |SELECT user_id, event_id AS click_id,
        |  lv.event_id AS view_id, us - lv.us AS gap_us
        |FROM m WHERE NOT is_view""".stripMargin,
    "g12_vocab_topk" ->
      """SELECT token, n_occurrences, rank FROM (
        |  SELECT token, n_occurrences,
        |    CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
        |      AS INTEGER) AS rank
        |  FROM (SELECT tok AS token, count(*) AS n_occurrences
        |        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
        |              FROM documents)
        |        GROUP BY 1))
        |WHERE rank <= 100""".stripMargin,
    // j6: the oracle derives each event's session id DIRECTLY via window
    // functions — a different algorithm than the Spark side's
    // sessions-aggregate + range join, so agreement is strong evidence
    "j6_session_attach" ->
      """WITH t AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
        |), o AS (
        |  SELECT user_id, event_id, ts, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |              OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_start
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id, event_id,
        |  CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
        |FROM o""".stripMargin,
    "g10_train_val_split" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 AS BIGINT)
        |    AS bucket,
        |  CASE WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 < 10
        |    THEN 'val' ELSE 'train' END AS split
        |FROM documents""".stripMargin,
    "e1_dedup_exact" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    // e16: batch-vs-corpus verdicts — the Bloom prefilter is exact-ified
    // by the verification probe, so a plain left join IS the oracle
    // e18: state replay — batch 1 dups against the corpus digest set,
    // batch 2 against corpus ∪ batch 1's digests (the advanced state)
    // e21: the bucketed layout + SPJ plan are COST-only — the oracle is
    // the plain digest join with per-digest pair counts
    "e21_contamination_spj" ->
      """WITH m AS (SELECT max(doc_id) AS mx FROM documents),
        |train AS (
        |  SELECT sha256(text) AS h FROM documents, m
        |  WHERE doc_id < mx * 7 // 10),
        |ev AS (
        |  SELECT sha256(text) AS h FROM documents, m
        |  WHERE doc_id >= mx * 6 // 10)
        |SELECT train.h AS content_hash, count(*) AS n_pairs
        |FROM train JOIN ev ON train.h = ev.h
        |GROUP BY 1""".stripMargin,
    "e18_dedup_state_persisted" ->
      """WITH corpus AS (
        |  SELECT DISTINCT sha256(text) AS h
        |  FROM documents WHERE doc_id < 300),
        |b1 AS (
        |  SELECT doc_id, sha256(text) AS h
        |  FROM documents WHERE doc_id >= 300 AND doc_id < 450
        |  UNION ALL
        |  SELECT doc_id + 2000, sha256(text)
        |  FROM documents WHERE doc_id < 300 AND doc_id % 9 = 0),
        |state1 AS (
        |  SELECT h FROM corpus UNION SELECT h FROM b1),
        |b2 AS (
        |  SELECT doc_id, sha256(text) AS h
        |  FROM documents WHERE doc_id >= 450
        |  UNION ALL
        |  SELECT doc_id + 3000, sha256(text)
        |  FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 450 AND doc_id % 5 = 0)
        |SELECT CAST(0 AS BIGINT) AS batch_id, b1.doc_id,
        |  (c.h IS NOT NULL) AS is_duplicate
        |FROM b1 LEFT JOIN corpus c ON b1.h = c.h
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), b2.doc_id, (s1.h IS NOT NULL)
        |FROM b2 LEFT JOIN state1 s1 ON b2.h = s1.h""".stripMargin,
    // e19: identical replay semantics to e18 — the sidecar/partition
    // machinery changes the COST shape, never the verdicts
    "e19_dedup_state_scalable" ->
      """WITH corpus AS (
        |  SELECT DISTINCT sha256(text) AS h
        |  FROM documents WHERE doc_id < 300),
        |b1 AS (
        |  SELECT doc_id, sha256(text) AS h
        |  FROM documents WHERE doc_id >= 300 AND doc_id < 450
        |  UNION ALL
        |  SELECT doc_id + 2000, sha256(text)
        |  FROM documents WHERE doc_id < 300 AND doc_id % 9 = 0),
        |state1 AS (
        |  SELECT h FROM corpus UNION SELECT h FROM b1),
        |b2 AS (
        |  SELECT doc_id, sha256(text) AS h
        |  FROM documents WHERE doc_id >= 450
        |  UNION ALL
        |  SELECT doc_id + 3000, sha256(text)
        |  FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 450 AND doc_id % 5 = 0)
        |SELECT CAST(0 AS BIGINT) AS batch_id, b1.doc_id,
        |  (c.h IS NOT NULL) AS is_duplicate
        |FROM b1 LEFT JOIN corpus c ON b1.h = c.h
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), b2.doc_id, (s1.h IS NOT NULL)
        |FROM b2 LEFT JOIN state1 s1 ON b2.h = s1.h""".stripMargin,
    // e25: e19's membership algebra with an erasure between the
    // batches — state2 = (corpus ∪ batch1) \ erased, so re-submitted
    // erased texts admit fresh while untouched verdicts hold
    "e25_dedup_state_erasure" ->
      """WITH corpus AS (
        |  SELECT DISTINCT sha256(text) AS h
        |  FROM documents WHERE doc_id < 300),
        |b1 AS (
        |  SELECT doc_id, sha256(text) AS h
        |  FROM documents WHERE doc_id >= 300 AND doc_id < 450
        |  UNION ALL
        |  SELECT doc_id + 2000, sha256(text)
        |  FROM documents WHERE doc_id < 300 AND doc_id % 9 = 0),
        |erased AS (
        |  SELECT DISTINCT sha256(text) AS h
        |  FROM documents WHERE doc_id < 300 AND doc_id % 9 = 0),
        |state2 AS (
        |  SELECT h FROM (
        |    SELECT h FROM corpus UNION SELECT h FROM b1) s
        |  WHERE h NOT IN (SELECT h FROM erased)),
        |b2 AS (
        |  SELECT doc_id, sha256(text) AS h
        |  FROM documents WHERE doc_id >= 450
        |  UNION ALL
        |  SELECT doc_id + 5000, sha256(text)
        |  FROM documents WHERE doc_id < 300 AND doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id + 6000, sha256(text)
        |  FROM documents WHERE doc_id < 300 AND doc_id % 9 = 1
        |  UNION ALL
        |  SELECT doc_id + 7000, sha256(text)
        |  FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 450 AND doc_id % 5 = 0)
        |SELECT CAST(0 AS BIGINT) AS batch_id, b1.doc_id,
        |  (c.h IS NOT NULL) AS is_duplicate
        |FROM b1 LEFT JOIN corpus c ON b1.h = c.h
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), b2.doc_id, (s2.h IS NOT NULL)
        |FROM b2 LEFT JOIN state2 s2 ON b2.h = s2.h""".stripMargin,
    // e20: full MinHash/band replay with phased state membership —
    // phase-2 state = seed + batch-1 docs NOT flagged near-dup (the
    // kept-representative rule); verify = sig-estimated Jaccard >= 0.5
    // on band-colliding pairs only
    // e22: the full staged replay — inject twins, sha256 winners,
    // MinHash 64/16x4 band candidates + sig-estimate verify (the e20
    // idioms), g20's quality score, g15's content-hash mixture, g16's
    // prefix-sum pack — with every stage's survivor count re-derived
    "e22_training_pipeline" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, lang, source, text FROM documents
        |  WHERE doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000, lang, source,
        |    text || ' pipeline near twin suffix' FROM documents
        |  WHERE doc_id % 7 = 0
        |), winners AS (
        |  SELECT sha256(text) AS h, min(doc_id) AS keep_id
        |  FROM base GROUP BY 1
        |), exact_kept AS (
        |  SELECT b.* FROM base b JOIN winners w
        |    ON sha256(b.text) = w.h AND b.doc_id = w.keep_id
        |), tk AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM exact_kept
        |), sh AS (
        |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    AS shingles
        |  FROM tk WHERE len(toks) >= 3
        |), hs AS (
        |  SELECT doc_id, list_transform(shingles,
        |    s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT
        |         % 2147483647 AS BIGINT)) AS h
        |  FROM sh
        |), sigs AS (
        |  SELECT doc_id, list_transform(range(0, 64), i ->
        |    list_aggregate(list_transform(h,
        |      x -> ((2*i + 1) * x + i + 1) % 2147483647), 'min')) AS sig
        |  FROM hs
        |), banded AS (
        |  SELECT doc_id, band,
        |    sig[band*4 + 1] AS s0, sig[band*4 + 2] AS s1,
        |    sig[band*4 + 3] AS s2, sig[band*4 + 4] AS s3
        |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) bs
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM banded x JOIN banded y ON x.band = y.band
        |    AND x.s0 = y.s0 AND x.s1 = y.s1
        |    AND x.s2 = y.s2 AND x.s3 = y.s3
        |  WHERE x.doc_id < y.doc_id
        |), drops AS (
        |  SELECT DISTINCT c.doc_b AS doc_id
        |  FROM cand c
        |  JOIN sigs a ON a.doc_id = c.doc_a
        |  JOIN sigs b ON b.doc_id = c.doc_b
        |  WHERE CAST(len(list_filter(range(1, 65),
        |    i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64 >= 0.5
        |), near_kept AS (
        |  SELECT e.* FROM exact_kept e
        |  WHERE e.doc_id NOT IN (SELECT doc_id FROM drops)
        |), q AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |      AS INTEGER) AS sum_len,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['the','a','and','of','to'], x))) AS INTEGER)
        |      AS cnt_en,
        |    text
        |  FROM (SELECT *, string_split(lower(text), ' ') AS toks
        |        FROM near_kept)
        |), gated AS (
        |  SELECT *,
        |    round(0.5 * (CAST(cnt_en AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |      + 0.2 * greatest(1.0 - abs(CAST(sum_len AS DOUBLE)
        |          / CAST(n_tokens AS DOUBLE) - 5.0) / 10.0, 0.0), 6)
        |      AS quality_score
        |  FROM q
        |), qual_kept AS (
        |  SELECT * FROM gated WHERE quality_score >= 0.4
        |), sampled AS (
        |  SELECT doc_id, lang, n_tokens FROM qual_kept
        |  WHERE ('0x' || substr(md5(text), 1, 8))::UBIGINT % 1000 <
        |    (CASE lang WHEN 'en' THEN 1000 WHEN 'zh' THEN 750
        |      WHEN 'de' THEN 500 WHEN 'es' THEN 500 WHEN 'fr' THEN 250
        |      ELSE 0 END)
        |), p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS prefix_tokens
        |  FROM sampled
        |)
        |SELECT lang, CAST(prefix_tokens // 512 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |  (SELECT count(*) FROM base) AS n_ingested,
        |  (SELECT count(*) FROM exact_kept) AS n_after_exact,
        |  (SELECT count(*) FROM near_kept) AS n_after_neardup,
        |  (SELECT count(*) FROM qual_kept) AS n_after_quality,
        |  (SELECT count(*) FROM sampled) AS n_after_sample
        |FROM p GROUP BY 1, 2""".stripMargin,
    // e23: the incremental composition must equal the batch replay on
    // the union corpus exactly; n_batches/replay_noop pin the two-wave
    // advance and the ledger no-op
    "e23_training_pipeline_incr" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, lang, source, text FROM documents
        |  WHERE doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000, lang, source,
        |    text || ' pipeline near twin suffix' FROM documents
        |  WHERE doc_id % 7 = 0
        |), winners AS (
        |  SELECT sha256(text) AS h, min(doc_id) AS keep_id
        |  FROM base GROUP BY 1
        |), exact_kept AS (
        |  SELECT b.* FROM base b JOIN winners w
        |    ON sha256(b.text) = w.h AND b.doc_id = w.keep_id
        |), tk AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM exact_kept
        |), sh AS (
        |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    AS shingles
        |  FROM tk WHERE len(toks) >= 3
        |), hs AS (
        |  SELECT doc_id, list_transform(shingles,
        |    s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT
        |         % 2147483647 AS BIGINT)) AS h
        |  FROM sh
        |), sigs AS (
        |  SELECT doc_id, list_transform(range(0, 64), i ->
        |    list_aggregate(list_transform(h,
        |      x -> ((2*i + 1) * x + i + 1) % 2147483647), 'min')) AS sig
        |  FROM hs
        |), banded AS (
        |  SELECT doc_id, band,
        |    sig[band*4 + 1] AS s0, sig[band*4 + 2] AS s1,
        |    sig[band*4 + 3] AS s2, sig[band*4 + 4] AS s3
        |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) bs
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM banded x JOIN banded y ON x.band = y.band
        |    AND x.s0 = y.s0 AND x.s1 = y.s1
        |    AND x.s2 = y.s2 AND x.s3 = y.s3
        |  WHERE x.doc_id < y.doc_id
        |), drops AS (
        |  SELECT DISTINCT c.doc_b AS doc_id
        |  FROM cand c
        |  JOIN sigs a ON a.doc_id = c.doc_a
        |  JOIN sigs b ON b.doc_id = c.doc_b
        |  WHERE CAST(len(list_filter(range(1, 65),
        |    i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64 >= 0.5
        |), near_kept AS (
        |  SELECT e.* FROM exact_kept e
        |  WHERE e.doc_id NOT IN (SELECT doc_id FROM drops)
        |), q AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |      AS INTEGER) AS sum_len,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['the','a','and','of','to'], x))) AS INTEGER)
        |      AS cnt_en,
        |    text
        |  FROM (SELECT *, string_split(lower(text), ' ') AS toks
        |        FROM near_kept)
        |), gated AS (
        |  SELECT *,
        |    round(0.5 * (CAST(cnt_en AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |      + 0.2 * greatest(1.0 - abs(CAST(sum_len AS DOUBLE)
        |          / CAST(n_tokens AS DOUBLE) - 5.0) / 10.0, 0.0), 6)
        |      AS quality_score
        |  FROM q
        |), qual_kept AS (
        |  SELECT * FROM gated WHERE quality_score >= 0.4
        |), sampled AS (
        |  SELECT doc_id, lang, n_tokens FROM qual_kept
        |  WHERE ('0x' || substr(md5(text), 1, 8))::UBIGINT % 1000 <
        |    (CASE lang WHEN 'en' THEN 1000 WHEN 'zh' THEN 750
        |      WHEN 'de' THEN 500 WHEN 'es' THEN 500 WHEN 'fr' THEN 250
        |      ELSE 0 END)
        |), p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS prefix_tokens
        |  FROM sampled
        |)
        |SELECT lang, CAST(prefix_tokens // 512 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |  (SELECT count(*) FROM base) AS n_ingested,
        |  (SELECT count(*) FROM exact_kept) AS n_after_exact,
        |  (SELECT count(*) FROM near_kept) AS n_after_neardup,
        |  (SELECT count(*) FROM qual_kept) AS n_after_quality,
        |  (SELECT count(*) FROM sampled) AS n_after_sample,
        |  2 AS n_batches, TRUE AS replay_noop
        |FROM p GROUP BY 1, 2""".stripMargin,
    // e26: the curated replay — e23's chain with the g8 contamination
    // gate after near-dup (probes = doc 0's five smallest 3-gram
    // shingles) and the g25 source cap (smallest-6-by-doc_id per
    // source ≡ the incremental running admit count under monotone ids)
    // after the mixture sample
    "e26_training_pipeline_curated" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, lang, source, text FROM documents
        |  WHERE doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000, lang, source,
        |    text || ' pipeline near twin suffix' FROM documents
        |  WHERE doc_id % 7 = 0
        |), winners AS (
        |  SELECT sha256(text) AS h, min(doc_id) AS keep_id
        |  FROM base GROUP BY 1
        |), exact_kept AS (
        |  SELECT b.* FROM base b JOIN winners w
        |    ON sha256(b.text) = w.h AND b.doc_id = w.keep_id
        |), tk AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM exact_kept
        |), sh AS (
        |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    AS shingles
        |  FROM tk WHERE len(toks) >= 3
        |), hs AS (
        |  SELECT doc_id, list_transform(shingles,
        |    s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT
        |         % 2147483647 AS BIGINT)) AS h
        |  FROM sh
        |), sigs AS (
        |  SELECT doc_id, list_transform(range(0, 64), i ->
        |    list_aggregate(list_transform(h,
        |      x -> ((2*i + 1) * x + i + 1) % 2147483647), 'min')) AS sig
        |  FROM hs
        |), banded AS (
        |  SELECT doc_id, band,
        |    sig[band*4 + 1] AS s0, sig[band*4 + 2] AS s1,
        |    sig[band*4 + 3] AS s2, sig[band*4 + 4] AS s3
        |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) bs
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM banded x JOIN banded y ON x.band = y.band
        |    AND x.s0 = y.s0 AND x.s1 = y.s1
        |    AND x.s2 = y.s2 AND x.s3 = y.s3
        |  WHERE x.doc_id < y.doc_id
        |), drops AS (
        |  SELECT DISTINCT c.doc_b AS doc_id
        |  FROM cand c
        |  JOIN sigs a ON a.doc_id = c.doc_a
        |  JOIN sigs b ON b.doc_id = c.doc_b
        |  WHERE CAST(len(list_filter(range(1, 65),
        |    i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64 >= 0.5
        |), near_kept AS (
        |  SELECT e.* FROM exact_kept e
        |  WHERE e.doc_id NOT IN (SELECT doc_id FROM drops)
        |), probes AS (
        |  SELECT DISTINCT sh_el AS probe
        |  FROM (SELECT unnest(list_distinct(list_transform(
        |          range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
        |          AS sh_el
        |        FROM (SELECT string_split(lower(text), ' ') AS toks
        |              FROM documents WHERE doc_id = 0))
        |  ORDER BY 1 LIMIT 5
        |), contam_kept AS (
        |  SELECT n.* FROM near_kept n
        |  WHERE NOT EXISTS (SELECT 1 FROM probes p
        |    WHERE contains(' ' || lower(n.text) || ' ',
        |      ' ' || p.probe || ' '))
        |), q AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |      AS INTEGER) AS sum_len,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['the','a','and','of','to'], x))) AS INTEGER)
        |      AS cnt_en,
        |    text
        |  FROM (SELECT *, string_split(lower(text), ' ') AS toks
        |        FROM contam_kept)
        |), gated AS (
        |  SELECT *,
        |    round(0.5 * (CAST(cnt_en AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |      + 0.2 * greatest(1.0 - abs(CAST(sum_len AS DOUBLE)
        |          / CAST(n_tokens AS DOUBLE) - 5.0) / 10.0, 0.0), 6)
        |      AS quality_score
        |  FROM q
        |), qual_kept AS (
        |  SELECT * FROM gated WHERE quality_score >= 0.4
        |), sampled AS (
        |  SELECT doc_id, lang, source, n_tokens FROM qual_kept
        |  WHERE ('0x' || substr(md5(text), 1, 8))::UBIGINT % 1000 <
        |    (CASE lang WHEN 'en' THEN 1000 WHEN 'zh' THEN 750
        |      WHEN 'de' THEN 500 WHEN 'es' THEN 500 WHEN 'fr' THEN 250
        |      ELSE 0 END)
        |), capped AS (
        |  SELECT doc_id, lang, n_tokens FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY doc_id ASC) AS rr
        |    FROM sampled) WHERE rr <= 6
        |), p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS prefix_tokens
        |  FROM capped
        |)
        |SELECT lang, CAST(prefix_tokens // 512 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |  (SELECT count(*) FROM base) AS n_ingested,
        |  (SELECT count(*) FROM exact_kept) AS n_after_exact,
        |  (SELECT count(*) FROM near_kept) AS n_after_neardup,
        |  (SELECT count(*) FROM contam_kept) AS n_after_contam,
        |  (SELECT count(*) FROM qual_kept) AS n_after_quality,
        |  (SELECT count(*) FROM sampled) AS n_after_sample,
        |  (SELECT count(*) FROM capped) AS n_after_cap,
        |  2 AS n_batches, TRUE AS replay_noop
        |FROM p GROUP BY 1, 2""".stripMargin,
    "e20_neardup_state_rolling" ->
      """WITH univ AS (
        |  SELECT doc_id, text, 0 AS tag FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id, text, 1 FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 450
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, 1 FROM documents
        |  WHERE doc_id < 300 AND doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id, text, 2 FROM documents WHERE doc_id >= 450
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, 2 FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 450 AND doc_id % 5 = 0
        |), base AS (
        |  SELECT doc_id, tag, string_split(lower(text), ' ') AS toks
        |  FROM univ
        |), sh AS (
        |  SELECT doc_id, tag, list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    AS shingles
        |  FROM base WHERE len(toks) >= 3
        |), hs AS (
        |  SELECT doc_id, tag, list_transform(shingles,
        |    s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT
        |         % 2147483647 AS BIGINT)) AS h
        |  FROM sh
        |), sigs AS (
        |  SELECT doc_id, tag, list_transform(range(0, 64), i ->
        |    list_aggregate(list_transform(h,
        |      x -> ((2*i + 1) * x + i + 1) % 2147483647), 'min')) AS sig
        |  FROM hs
        |), banded AS (
        |  SELECT doc_id, tag, band,
        |    sig[band*4 + 1] AS s0, sig[band*4 + 2] AS s1,
        |    sig[band*4 + 3] AS s2, sig[band*4 + 4] AS s3
        |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) bs
        |), est1 AS (
        |  SELECT c.doc_b, c.doc_c,
        |    CAST(len(list_filter(range(1, 65),
        |      i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64 AS est
        |  FROM (SELECT DISTINCT x.doc_id AS doc_b, y.doc_id AS doc_c
        |        FROM banded x JOIN banded y ON x.band = y.band
        |          AND x.s0 = y.s0 AND x.s1 = y.s1
        |          AND x.s2 = y.s2 AND x.s3 = y.s3
        |        WHERE x.tag = 1 AND y.tag = 0) c
        |  JOIN sigs a ON a.doc_id = c.doc_b
        |  JOIN sigs b ON b.doc_id = c.doc_c
        |), ver1 AS (
        |  SELECT doc_b, count(DISTINCT doc_c) AS n, max(est) AS m
        |  FROM est1 WHERE est >= 0.5 GROUP BY 1
        |), est2 AS (
        |  SELECT c.doc_b, c.doc_c,
        |    CAST(len(list_filter(range(1, 65),
        |      i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64 AS est
        |  FROM (SELECT DISTINCT x.doc_id AS doc_b, y.doc_id AS doc_c
        |        FROM banded x JOIN banded y ON x.band = y.band
        |          AND x.s0 = y.s0 AND x.s1 = y.s1
        |          AND x.s2 = y.s2 AND x.s3 = y.s3
        |        WHERE x.tag = 2 AND (y.tag = 0 OR (y.tag = 1
        |          AND y.doc_id NOT IN (SELECT doc_b FROM ver1)))) c
        |  JOIN sigs a ON a.doc_id = c.doc_b
        |  JOIN sigs b ON b.doc_id = c.doc_c
        |), ver2 AS (
        |  SELECT doc_b, count(DISTINCT doc_c) AS n, max(est) AS m
        |  FROM est2 WHERE est >= 0.5 GROUP BY 1
        |)
        |SELECT CAST(0 AS BIGINT) AS batch_id, u.doc_id,
        |  coalesce(v.n, 0) AS n_near_dups, round(v.m, 6) AS best_sim,
        |  (v.doc_b IS NOT NULL) AS is_near_dup
        |FROM univ u LEFT JOIN ver1 v ON v.doc_b = u.doc_id
        |WHERE u.tag = 1
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), u.doc_id, coalesce(v.n, 0),
        |  round(v.m, 6), (v.doc_b IS NOT NULL)
        |FROM univ u LEFT JOIN ver2 v ON v.doc_b = u.doc_id
        |WHERE u.tag = 2""".stripMargin,
    // i30: the streamed transport must reproduce e20's verdicts exactly
    // — identical replay SQL, plus the replay-no-op pin
    "i30_neardup_stream_ingest" ->
      """WITH univ AS (
        |  SELECT doc_id, text, 0 AS tag FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id, text, 1 FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 450
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, 1 FROM documents
        |  WHERE doc_id < 300 AND doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id, text, 2 FROM documents WHERE doc_id >= 450
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, 2 FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 450 AND doc_id % 5 = 0
        |), base AS (
        |  SELECT doc_id, tag, string_split(lower(text), ' ') AS toks
        |  FROM univ
        |), sh AS (
        |  SELECT doc_id, tag, list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    AS shingles
        |  FROM base WHERE len(toks) >= 3
        |), hs AS (
        |  SELECT doc_id, tag, list_transform(shingles,
        |    s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT
        |         % 2147483647 AS BIGINT)) AS h
        |  FROM sh
        |), sigs AS (
        |  SELECT doc_id, tag, list_transform(range(0, 64), i ->
        |    list_aggregate(list_transform(h,
        |      x -> ((2*i + 1) * x + i + 1) % 2147483647), 'min')) AS sig
        |  FROM hs
        |), banded AS (
        |  SELECT doc_id, tag, band,
        |    sig[band*4 + 1] AS s0, sig[band*4 + 2] AS s1,
        |    sig[band*4 + 3] AS s2, sig[band*4 + 4] AS s3
        |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) bs
        |), est1 AS (
        |  SELECT c.doc_b, c.doc_c,
        |    CAST(len(list_filter(range(1, 65),
        |      i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64 AS est
        |  FROM (SELECT DISTINCT x.doc_id AS doc_b, y.doc_id AS doc_c
        |        FROM banded x JOIN banded y ON x.band = y.band
        |          AND x.s0 = y.s0 AND x.s1 = y.s1
        |          AND x.s2 = y.s2 AND x.s3 = y.s3
        |        WHERE x.tag = 1 AND y.tag = 0) c
        |  JOIN sigs a ON a.doc_id = c.doc_b
        |  JOIN sigs b ON b.doc_id = c.doc_c
        |), ver1 AS (
        |  SELECT doc_b, count(DISTINCT doc_c) AS n, max(est) AS m
        |  FROM est1 WHERE est >= 0.5 GROUP BY 1
        |), est2 AS (
        |  SELECT c.doc_b, c.doc_c,
        |    CAST(len(list_filter(range(1, 65),
        |      i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64 AS est
        |  FROM (SELECT DISTINCT x.doc_id AS doc_b, y.doc_id AS doc_c
        |        FROM banded x JOIN banded y ON x.band = y.band
        |          AND x.s0 = y.s0 AND x.s1 = y.s1
        |          AND x.s2 = y.s2 AND x.s3 = y.s3
        |        WHERE x.tag = 2 AND (y.tag = 0 OR (y.tag = 1
        |          AND y.doc_id NOT IN (SELECT doc_b FROM ver1)))) c
        |  JOIN sigs a ON a.doc_id = c.doc_b
        |  JOIN sigs b ON b.doc_id = c.doc_c
        |), ver2 AS (
        |  SELECT doc_b, count(DISTINCT doc_c) AS n, max(est) AS m
        |  FROM est2 WHERE est >= 0.5 GROUP BY 1
        |)
        |SELECT CAST(0 AS BIGINT) AS batch_id, u.doc_id,
        |  coalesce(v.n, 0) AS n_near_dups, round(v.m, 6) AS best_sim,
        |  (v.doc_b IS NOT NULL) AS is_near_dup, TRUE AS replay_noop
        |FROM univ u LEFT JOIN ver1 v ON v.doc_b = u.doc_id
        |WHERE u.tag = 1
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), u.doc_id, coalesce(v.n, 0),
        |  round(v.m, 6), (v.doc_b IS NOT NULL), TRUE
        |FROM univ u LEFT JOIN ver2 v ON v.doc_b = u.doc_id
        |WHERE u.tag = 2""".stripMargin,
    "e16_dedup_incremental" ->
      """WITH corpus AS (
        |  SELECT DISTINCT sha256(text) AS h
        |  FROM documents WHERE doc_id < 350),
        |batch AS (
        |  SELECT doc_id, sha256(text) AS h
        |  FROM documents WHERE doc_id >= 350
        |  UNION ALL
        |  SELECT doc_id + 1000, sha256(text)
        |  FROM documents WHERE doc_id < 350 AND doc_id % 7 = 0)
        |SELECT b.doc_id, (c.h IS NOT NULL) AS is_duplicate
        |FROM batch b LEFT JOIN corpus c ON b.h = c.h""".stripMargin,
    // e10: CCNet-style segment dedup — the oracle re-derives the fixed
    // 20-token segmentation, ranks every distinct segment's occurrences
    // by (doc_id, chunk_idx), and reassembles each document from its
    // rank-1 segments in original order. string_agg skips the NULLs the
    // CASE emits, mirroring collect_list's null-dropping.
    "e10_dedup_segments" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), chunks AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |    array_to_string(t[(i*20 + 1):(i*20 + 20)], ' ') AS chunk
        |  FROM toks, UNNEST(range(0, ((len(t) - 1) // 20) + 1)) AS u(i)
        |), ranked AS (
        |  SELECT doc_id, chunk_idx, chunk,
        |    row_number() OVER (PARTITION BY md5(chunk)
        |      ORDER BY doc_id, chunk_idx) AS rn
        |  FROM chunks
        |)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
        |    ORDER BY chunk_idx), '') AS kept_text
        |FROM ranked GROUP BY doc_id""".stripMargin,
    // g14: per-doc n-gram occurrence lists (NOT distinct) rebuilt
    // relationally; top-bigram count scans distinct×occurrences inside
    // list lambdas exactly like the Spark HOF form
    "g14_repetition_stats" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1]) AS g2,
        |    list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
        |  FROM t
        |), s AS (
        |  SELECT doc_id,
        |    CAST(len(g2) AS INTEGER) AS n_bigrams,
        |    CASE WHEN len(g2) > 0 THEN
        |      CAST(list_max(list_transform(list_distinct(g2),
        |        d -> len(list_filter(g2, x -> x = d)))) AS INTEGER)
        |      ELSE 0 END AS top_bigram_count,
        |    CAST(len(g3) AS INTEGER) AS n_trigrams,
        |    CAST(len(g3) - len(list_distinct(g3)) AS INTEGER)
        |      AS dup_trigram_count
        |  FROM g
        |), f AS (
        |  SELECT doc_id, n_bigrams, top_bigram_count, n_trigrams,
        |    dup_trigram_count,
        |    CASE WHEN n_bigrams > 0 THEN round(
        |      CAST(top_bigram_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE),
        |      6) ELSE 0.0 END AS top_bigram_frac,
        |    CASE WHEN n_trigrams > 0 THEN round(
        |      CAST(dup_trigram_count AS DOUBLE) /
        |      CAST(n_trigrams AS DOUBLE), 6) ELSE 0.0 END AS dup_trigram_frac
        |  FROM s
        |)
        |SELECT *, top_bigram_frac > 0.2 OR dup_trigram_frac > 0.3
        |  AS repetitive
        |FROM f""".stripMargin,
    "g15_mixture_sample" ->
      """WITH d AS (
        |  SELECT lang, source,
        |    CAST(CASE lang WHEN 'en' THEN 1000 WHEN 'zh' THEN 750
        |      WHEN 'de' THEN 500 WHEN 'es' THEN 500 WHEN 'fr' THEN 250
        |      ELSE 0 END AS INTEGER) AS target_permille,
        |    ('0x' || substr(md5(text), 1, 8))::UBIGINT % 1000 AS bucket
        |  FROM documents
        |)
        |SELECT lang, source, target_permille, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN bucket < target_permille THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_kept,
        |  round(CAST(sum(CASE WHEN bucket < target_permille THEN 1 ELSE 0
        |    END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS kept_frac
        |FROM d GROUP BY 1, 2, 3""".stripMargin,
    // g22: both md5 slices reproduce bit-exactly in DuckDB, so the
    // full permutation (shard, pos) is oracle-checkable
    "g22_shard_shuffle" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(lower(text), ' ')) AS INTEGER)
        |      AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 16 AS shard,
        |    ('0x' || substr(md5('p' || CAST(doc_id AS VARCHAR)), 1, 15))
        |      ::BIGINT AS sort_key
        |  FROM documents
        |)
        |SELECT doc_id, CAST(shard AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY sort_key, doc_id) AS INTEGER) AS pos,
        |  n_tokens
        |FROM d""".stripMargin,
    // g21: the start grid 0, 48, 96, … < max(n-16, 1) and 64-token
    // slices reproduce exactly in DuckDB (same split, same slicing)
    "g21_chunk_overlap" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks,
        |    len(string_split(lower(text), ' ')) AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(start // 48 AS INTEGER) AS chunk_idx,
        |  CAST(start AS INTEGER) AS start,
        |  CAST(len(list_slice(toks, start + 1, start + 64)) AS INTEGER)
        |    AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, start + 1, start + 64), ' ')
        |    AS chunk_text
        |FROM d, unnest(range(0, greatest(n - 16, 1), 48)) AS t(start)
        |WHERE n >= 1""".stripMargin,
    "g16_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(lower(text), ' ')) AS INTEGER)
        |      AS n_tokens
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS prefix_tokens
        |  FROM t
        |)
        |SELECT lang, CAST(prefix_tokens // 512 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY 1, 2""".stripMargin,
    // g24: the same quality-ordered prefix selection — the score is
    // rounded to 6 in BOTH engines BEFORE ordering, ties by doc_id, so
    // the selected set replays exactly
    "g24_token_budget_select" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |      AS INTEGER) AS sum_len,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['the','a','and','of','to'], x))) AS INTEGER)
        |      AS cnt_en
        |  FROM (SELECT doc_id, lang, string_split(lower(text), ' ')
        |          AS toks FROM documents)
        |), s AS (
        |  SELECT doc_id, lang, n_tokens,
        |    round(0.5 * (CAST(cnt_en AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |      + 0.2 * greatest(1.0 - abs(CAST(sum_len AS DOUBLE)
        |          / CAST(n_tokens AS DOUBLE) - 5.0) / 10.0, 0.0), 6)
        |      AS quality_score
        |  FROM c
        |), r AS (
        |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang
        |    ORDER BY quality_score DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS running_tokens
        |  FROM s
        |)
        |SELECT lang, count(*) AS n_available,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_available,
        |  CAST(sum(CASE WHEN running_tokens <= 10000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_selected,
        |  CAST(sum(CASE WHEN running_tokens <= 10000 THEN n_tokens
        |    ELSE 0 END) AS BIGINT) AS tokens_selected,
        |  round(min(CASE WHEN running_tokens <= 10000
        |    THEN quality_score END), 6) AS quality_bar
        |FROM r GROUP BY 1""".stripMargin,
    // g25: the per-source cap is salt-invariant, so the oracle is the
    // PLAIN per-source quality window the two-level form replaces
    "g25_source_cap" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(len(list_filter(toks, t ->
        |      list_contains(['the','a','and','of','to'], t))) AS INTEGER)
        |      AS n_stop,
        |    CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |      AS INTEGER) AS sum_len
        |  FROM (SELECT doc_id, source, string_split(lower(text), ' ')
        |          AS toks FROM documents)
        |), s AS (
        |  SELECT source, doc_id,
        |    round(0.5 * (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |      + 0.2 * greatest(1.0 - abs(CAST(sum_len AS DOUBLE)
        |          / CAST(n_tokens AS DOUBLE) - 5.0) / 10.0, 0.0), 6)
        |      AS quality_score
        |  FROM c
        |), r AS (
        |  SELECT source, doc_id, quality_score,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY quality_score DESC, doc_id ASC) AS INTEGER)
        |      AS src_rank,
        |    count(*) OVER (PARTITION BY source) AS n_source_docs
        |  FROM s
        |)
        |SELECT source, doc_id, quality_score, src_rank, n_source_docs
        |FROM r WHERE src_rank <= 10""".stripMargin,
    // g26: DuckDB rebuilds every CMS cell from the same md5-slice
    // bucket hashes, so the compare pins the exact estimates (and the
    // exact collision overestimates) — not just the >= floor
    "g26_cms_token_frequency" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents
        |), rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |cells AS (
        |  SELECT r, CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
        |      token), 1, 15))::UBIGINT % 512 AS BIGINT) AS b,
        |    count(*) AS c
        |  FROM toks CROSS JOIN rows_
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT token, count(*) AS exact_count FROM toks GROUP BY 1
        |  ORDER BY exact_count DESC, token LIMIT 20
        |), probes AS (
        |  SELECT t.token, t.exact_count, rows_.r,
        |    CAST(('0x' || substr(md5(CAST(rows_.r AS VARCHAR) || ':' ||
        |      t.token), 1, 15))::UBIGINT % 512 AS BIGINT) AS b
        |  FROM top t CROSS JOIN rows_
        |)
        |SELECT p.token, p.exact_count, min(c.c) AS cms_estimate,
        |  min(c.c) - p.exact_count AS overestimate
        |FROM probes p JOIN cells c ON p.r = c.r AND p.b = c.b
        |GROUP BY 1, 2""".stripMargin,
    // g27: the maintained sketch answers exactly like a fresh build
    // over the post-lifecycle corpus (v0 seed, v1 append, v2 delete,
    // v3 text update) — the oracle replays that state and the same
    // CMS machinery; the three pins land as literals
    "g27_cms_incremental" ->
      """WITH final AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' extra' ELSE text
        |      END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |), toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM final
        |), rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |cells AS (
        |  SELECT r, CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
        |      token), 1, 15))::UBIGINT % 512 AS BIGINT) AS b,
        |    count(*) AS c
        |  FROM toks CROSS JOIN rows_
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT token, count(*) AS exact_count FROM toks GROUP BY 1
        |  ORDER BY exact_count DESC, token LIMIT 20
        |), probes AS (
        |  SELECT t.token, t.exact_count, rows_.r,
        |    CAST(('0x' || substr(md5(CAST(rows_.r AS VARCHAR) || ':' ||
        |      t.token), 1, 15))::UBIGINT % 512 AS BIGINT) AS b
        |  FROM top t CROSS JOIN rows_
        |)
        |SELECT p.token, p.exact_count, min(c.c) AS cms_estimate,
        |  min(c.c) - p.exact_count AS overestimate,
        |  3 AS applied_incr, TRUE AS replay_noop,
        |  TRUE AS cells_match_batch
        |FROM probes p JOIN cells c ON p.r = c.r AND p.b = c.b
        |GROUP BY 1, 2""".stripMargin,
    // g28: the drift replay — v0 seed inserts (%3<>2), v1 append
    // inserts (%3=2), v2 deletes (%7=0 of everything), v3 updates
    // (%11=0 survivors: one remove at n tokens + one add at n+1 — the
    // ' extra' suffix is exactly one token)
    "g28_corpus_drift" ->
      """WITH toked AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n
        |  FROM documents),
        |v0 AS (
        |  SELECT 0 AS version, lang, count(*) AS docs_added,
        |    0 AS docs_removed, sum(n) AS tokens_added,
        |    0 AS tokens_removed
        |  FROM toked WHERE doc_id % 3 <> 2 GROUP BY 2),
        |v1 AS (
        |  SELECT 1, lang, count(*), 0, sum(n), 0
        |  FROM toked WHERE doc_id % 3 = 2 GROUP BY 2),
        |v2 AS (
        |  SELECT 2, lang, 0, count(*), 0, sum(n)
        |  FROM toked WHERE doc_id % 7 = 0 GROUP BY 2),
        |v3 AS (
        |  SELECT 3, lang, count(*), count(*), sum(n) + count(*), sum(n)
        |  FROM toked WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0
        |  GROUP BY 2)
        |SELECT CAST(version AS BIGINT) AS version, lang,
        |  CAST(docs_added AS BIGINT) AS docs_added,
        |  CAST(docs_removed AS BIGINT) AS docs_removed,
        |  CAST(tokens_added AS BIGINT) AS tokens_added,
        |  CAST(tokens_removed AS BIGINT) AS tokens_removed
        |FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v1
        |  UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3)""".stripMargin,
    // g23: same prefix-sum grid in DuckDB — each doc's [start, end)
    // interval fragments over 512-token bins via unnest(range(...))
    "g23_sequence_pack_split" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS endt
        |  FROM t
        |), b AS (
        |  SELECT doc_id, lang, n_tokens, endt,
        |    endt - n_tokens AS start FROM p
        |), x AS (
        |  SELECT doc_id, lang, start, endt,
        |    unnest(range(start // 512, (endt - 1) // 512 + 1)) AS seq_id
        |  FROM b
        |)
        |SELECT lang, seq_id, count(*) AS n_frags,
        |  CAST(sum(CASE WHEN start >= seq_id * 512
        |    AND endt <= (seq_id + 1) * 512 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_whole,
        |  CAST(sum(least(endt, (seq_id + 1) * 512)
        |    - greatest(start, seq_id * 512)) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM x GROUP BY 1, 2""".stripMargin,
    // g17: the profiler emits one row per customer column; the oracle
    // re-derives every metric from one aggregate row and unions the
    // per-column projections (names/types mirror Spark simpleString)
    "g17_column_profile" ->
      """WITH m AS (
        |  SELECT count(*) AS n_rows,
        |    count(c_custkey) AS cnt1, count(DISTINCT c_custkey) AS nd1,
        |    round(CAST(min(c_custkey) AS DOUBLE), 6) AS mn1,
        |    round(CAST(max(c_custkey) AS DOUBLE), 6) AS mx1,
        |    count(c_name) AS cnt2, count(DISTINCT c_name) AS nd2,
        |    min(c_name) AS mns2, max(c_name) AS mxs2,
        |    sum(length(c_name)) AS len2,
        |    count(c_nationkey) AS cnt3, count(DISTINCT c_nationkey) AS nd3,
        |    round(CAST(min(c_nationkey) AS DOUBLE), 6) AS mn3,
        |    round(CAST(max(c_nationkey) AS DOUBLE), 6) AS mx3,
        |    count(c_acctbal) AS cnt4, count(DISTINCT c_acctbal) AS nd4,
        |    round(CAST(min(c_acctbal) AS DOUBLE), 6) AS mn4,
        |    round(CAST(max(c_acctbal) AS DOUBLE), 6) AS mx4,
        |    count(c_mktsegment) AS cnt5,
        |    count(DISTINCT c_mktsegment) AS nd5,
        |    min(c_mktsegment) AS mns5, max(c_mktsegment) AS mxs5,
        |    sum(length(c_mktsegment)) AS len5
        |  FROM customer
        |)
        |SELECT 'c_custkey' AS column_name, 'bigint' AS data_type,
        |  n_rows, n_rows - cnt1 AS n_nulls, nd1 AS n_distinct,
        |  mn1 AS min_num, mx1 AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |  CAST(NULL AS DOUBLE) AS avg_len FROM m
        |UNION ALL
        |SELECT 'c_name', 'string', n_rows, n_rows - cnt2, nd2,
        |  NULL, NULL, mns2, mxs2,
        |  round(CAST(len2 AS DOUBLE) / NULLIF(cnt2, 0), 6) FROM m
        |UNION ALL
        |SELECT 'c_nationkey', 'int', n_rows, n_rows - cnt3, nd3,
        |  mn3, mx3, NULL, NULL, NULL FROM m
        |UNION ALL
        |SELECT 'c_acctbal', 'double', n_rows, n_rows - cnt4, nd4,
        |  mn4, mx4, NULL, NULL, NULL FROM m
        |UNION ALL
        |SELECT 'c_mktsegment', 'string', n_rows, n_rows - cnt5, nd5,
        |  NULL, NULL, mns5, mxs5,
        |  round(CAST(len5 AS DOUBLE) / NULLIF(cnt5, 0), 6) FROM m""".stripMargin,
    // g18: counts are exact integers; the smoothed term is one double
    // division; the per-doc mean follows the decimal-sum discipline
    "g18_bigram_lm_score" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), inst AS (
        |  SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |      i -> struct_pack(w1 := toks[i],
        |                       bg := toks[i] || ' ' || toks[i+1]))) AS s
        |    FROM base WHERE len(toks) >= 2)
        |), uni AS (
        |  SELECT w1, count(*) AS cu FROM (
        |    SELECT unnest(toks) AS w1 FROM base)
        |  GROUP BY 1
        |), vocab AS (
        |  SELECT count(*) AS v FROM uni
        |), bi AS (
        |  SELECT bg, count(*) AS cb FROM inst GROUP BY 1
        |)
        |SELECT i.doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST((b.cb + 1.0) / (u.cu + vv.v)
        |      AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6) AS lm_score
        |FROM inst i
        |JOIN bi b USING (bg)
        |JOIN uni u USING (w1)
        |CROSS JOIN vocab vv
        |GROUP BY 1""".stripMargin,
    // g19: hashed-bigram feature buckets, two Laplace models, exact
    // integer ratio terms, decimal-summed per-doc mean — replayed 1:1
    "g19_dsir_importance" ->
      """WITH base AS (
        |  SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), inst AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1]),
        |             1, 15))::UBIGINT AS BIGINT) % 1024)) AS b
        |  FROM base WHERE len(toks) >= 2
        |), qc AS (
        |  SELECT b, count(*) AS qb FROM inst GROUP BY 1
        |), tc AS (
        |  SELECT b, count(*) AS tb FROM inst WHERE lang = 'en' GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS qtot,
        |    count(*) FILTER (WHERE lang = 'en') AS ttot
        |  FROM inst
        |)
        |SELECT i.doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST(
        |      CAST((coalesce(t.tb, 0) + 1) * (v.qtot + 1024) AS DOUBLE) /
        |      CAST((q.qb + 1) * (v.ttot + 1024) AS DOUBLE)
        |    AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6) AS dsir_score,
        |  round(CAST(sum(CAST(
        |      CAST((coalesce(t.tb, 0) + 1) * (v.qtot + 1024) AS DOUBLE) /
        |      CAST((q.qb + 1) * (v.ttot + 1024) AS DOUBLE)
        |    AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6) >= 1.0
        |    AS selected
        |FROM inst i
        |JOIN qc q USING (b)
        |LEFT JOIN tc t USING (b)
        |CROSS JOIN tot v
        |GROUP BY 1""".stripMargin,
    "e2_dedup_ngram_jaccard" -> ngramJaccardOracle(200, "200"),
    // e7: the uncapped twin — same inverted-index plan, full corpus; the
    // sentinel max_doc_id = Long.MaxValue means "uncapped"
    "e7_dedup_ngram_full" ->
      ngramJaccardOracle(Long.MaxValue, "9223372036854775807"),
    // e8: the oracle mirrors the prefix-filtered plan itself (rare-first
    // canonical rank, integer-exact prefix length, size filter, exact
    // verification) — every stage is relational, so DuckDB replays the
    // whole PPJoin pipeline; the Spark/oracle agreement plus the
    // spec-pinned equality with the unfiltered inverted index at the
    // same threshold makes the filters' exactness doubly checked
    "e8_dedup_ppjoin" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), win AS (
        |  SELECT doc_id, list_transform(range(1, len(toks)-1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS w
        |  FROM base WHERE len(toks) >= 3
        |), hu AS (
        |  SELECT doc_id, list_transform(w,
        |    s -> ('0x' || substr(md5(s), 1, 16))::UBIGINT) AS u
        |  FROM win
        |), sized AS (
        |  -- two's-complement to the signed 64-bit value ShingleHashSet
        |  -- emits (first 8 md5 bytes, big-endian, as a Java long)
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_transform(u, x ->
        |      CAST(CASE WHEN x >= '9223372036854775808'::HUGEINT
        |        THEN x::HUGEINT - '18446744073709551616'::HUGEINT
        |        ELSE x::HUGEINT END AS BIGINT)))) AS hsh,
        |    CAST(len(list_distinct(u)) AS INTEGER) AS sz
        |  FROM hu
        |), prefix AS (
        |  SELECT doc_id, sz,
        |    unnest(list_slice(hsh, 1, sz - (sz + 2) // 3 + 1)) AS hs
        |  FROM sized
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM prefix x JOIN prefix y ON x.hs = y.hs
        |   AND x.doc_id < y.doc_id
        |   AND x.sz <= 2 * y.sz AND y.sz <= 2 * x.sz
        |)
        |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
        |  SELECT c.doc_a, c.doc_b,
        |    CAST(len(list_intersect(a.hsh, b.hsh)) AS DOUBLE) /
        |    CAST(a.sz + b.sz - len(list_intersect(a.hsh, b.hsh))
        |         AS DOUBLE) AS jaccard
        |  FROM cand c JOIN sized a ON c.doc_a = a.doc_id
        |              JOIN sized b ON c.doc_b = b.doc_id)
        |WHERE jaccard >= 0.5""".stripMargin,
    // e3: the whole LSH pipeline is reproducible because the sketch hash
    // is an md5 slice and the band key is the raw signature slice
    // (SketchExpressions.ShingleMinHash doc) — candidates, verification,
    // and output all mirror the Spark plan.
    "e3_dedup_minhash_lsh" -> minhashPairsOracle,
    // e9: connected components over the e3 pair graph — the oracle walks
    // undirected reachability to a fixpoint with a recursive CTE and
    // takes min(root) per node; the Spark side converges min-label
    // propagation to the same fixpoint
    "e9_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT doc_a, doc_b FROM ($minhashPairsOracle) mh
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM pairs
         |), nodes AS (
         |  SELECT DISTINCT src AS doc FROM edges
         |), reach AS (
         |  SELECT doc, doc AS root FROM nodes
         |  UNION
         |  SELECT e.dst AS doc, r.root
         |  FROM reach r JOIN edges e ON e.src = r.doc
         |)
         |SELECT doc AS doc_id, min(root) AS cluster_id
         |FROM reach GROUP BY 1""".stripMargin,
    // e4: simhash votes over the full 64-bit md5 slice; the oracle skips
    // the pigeonhole chunk join (pure candidate generation with
    // guaranteed recall <= dist 7) and computes all pairs directly.
    "e4_dedup_simhash" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
        |  FROM base WHERE len(toks) >= 3
        |), hs AS (
        |  SELECT doc_id, list_transform(shingles,
        |    s -> ('0x' || substr(md5(s), 1, 16))::UBIGINT) AS h
        |  FROM sh
        |), sims AS (
        |  SELECT doc_id, CAST(list_aggregate(list_transform(range(0, 64),
        |    j -> CASE WHEN 2 * len(list_filter(h, x -> (x >> j) & 1 = 1))
        |              > len(h)
        |      THEN (1::UBIGINT << CAST(j AS INTEGER)) ELSE 0::UBIGINT END),
        |    'sum') AS UBIGINT) AS simhash
        |  FROM hs
        |)
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
        |FROM sims x JOIN sims y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 7""".stripMargin,
    // e12: e4's exact pair set, re-verified with full Levenshtein under a
    // length-relative bound — both engines implement textbook edit
    // distance, so the expensive verifier is oracle-exact too
    "e12_dedup_edit_distance" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
        |  FROM base WHERE len(toks) >= 3
        |), hs AS (
        |  SELECT doc_id, list_transform(shingles,
        |    s -> ('0x' || substr(md5(s), 1, 16))::UBIGINT) AS h
        |  FROM sh
        |), sims AS (
        |  SELECT doc_id, CAST(list_aggregate(list_transform(range(0, 64),
        |    j -> CASE WHEN 2 * len(list_filter(h, x -> (x >> j) & 1 = 1))
        |              > len(h)
        |      THEN (1::UBIGINT << CAST(j AS INTEGER)) ELSE 0::UBIGINT END),
        |    'sum') AS UBIGINT) AS simhash
        |  FROM hs
        |), pairs AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
        |  FROM sims x JOIN sims y ON x.doc_id < y.doc_id
        |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 7
        |)
        |SELECT doc_a, doc_b, hamming, edit_dist,
        |  round(CAST(edit_dist AS DOUBLE) / maxlen, 6) AS edit_ratio
        |FROM (
        |  SELECT p.doc_a, p.doc_b, p.hamming,
        |    CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
        |    greatest(length(a.text), length(b.text)) AS maxlen
        |  FROM pairs p
        |  JOIN documents a ON a.doc_id = p.doc_a
        |  JOIN documents b ON b.doc_id = p.doc_b)
        |WHERE edit_dist <= 0.25 * maxlen""".stripMargin,
    "e5_dedup_embedding_cosine" ->
      """WITH n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |        WHERE vec_id < 4096)
        |)
        |SELECT vec_a, vec_b, round(cosine, 6) AS cosine,
        |  CAST(4096 AS BIGINT) AS max_vec_id FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cosine
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4""".stripMargin,
    // e6: the bucketed scale path for e5 — candidates from shared
    // (table, signature) LSH cells, then exact-cosine verification;
    // data-derived planes make the whole pipeline relational.
    "e6_dedup_embedding_lsh" ->
      s"""WITH ${hyperplaneSigCte(8, 12)},
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM sigs x JOIN sigs y
         |    ON x.t = y.t AND x.sig = y.sig AND x.vec_id < y.vec_id
         |)
         |SELECT vec_a, vec_b, round(cosine, 6) AS cosine FROM (
         |  SELECT c.vec_a, c.vec_b,
         |    list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cosine
         |  FROM cand c JOIN n a ON a.vec_id = c.vec_a
         |              JOIN n b ON b.vec_id = c.vec_b)
         |WHERE cosine >= 0.4""".stripMargin,
    // e11: SemDeDup — within-cluster pairs only; clusters = deterministic
    // IVF cells (first-16 centroids, cosine argmax), so the oracle
    // re-derives assignment, pairing, and keeper selection relationally
    "e11_dedup_semantic" ->
      """WITH n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |), cents AS (
        |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
        |  FROM n WHERE vec_id < 16
        |), assigned AS (
        |  SELECT vec_id, cent_id, v, norm FROM (
        |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
        |      row_number() OVER (PARTITION BY x.vec_id
        |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
        |          DESC, c.cent_id) AS crank
        |    FROM n x CROSS JOIN cents c)
        |  WHERE crank = 1
        |), pairs AS (
        |  SELECT a.cent_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cosine
        |  FROM assigned a JOIN assigned b
        |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
        |)
        |SELECT cent_id, vec_b AS vec_id, min(vec_a) AS keeper_id,
        |  round(arg_min(cosine, vec_a), 6) AS keeper_cosine
        |FROM pairs WHERE cosine >= 0.4
        |GROUP BY 1, 2""".stripMargin,
    // f2: same machinery, query-vs-corpus instead of self-join.
    "f2_knn_lsh" ->
      s"""WITH ${hyperplaneSigCte(16, 6)},
         |qs AS (SELECT vec_id AS query_id, t, sig FROM sigs
         |       WHERE vec_id < 10),
         |cand AS (
         |  SELECT DISTINCT q.query_id, s.vec_id
         |  FROM sigs s JOIN qs q ON s.t = q.t AND s.sig = q.sig
         |  WHERE s.vec_id != q.query_id
         |), scored AS (
         |  SELECT c.query_id, c.vec_id,
         |    list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cosine
         |  FROM cand c
         |  JOIN n a ON a.vec_id = c.query_id
         |  JOIN n b ON b.vec_id = c.vec_id
         |)
         |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
         |FROM (
         |  SELECT query_id, vec_id AS neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    "f1_knn_bruteforce" ->
      """WITH n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cosine
        |  FROM n q JOIN n c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 10
        |)
        |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
        |FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // f4: IVF after two Lloyd sweeps — every refinement step is
    // relational (exact decimal per-dimension sums), so the oracle
    // unrolls the iterations as CTEs and reproduces the refined
    // centroids, and therefore the final ranking, exactly.
    "f4_knn_ivf_kmeans" ->
      s"""WITH n AS (
         |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |), c0 AS (
         |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
         |  FROM n WHERE vec_id < 16
         |),
         |${lloydCtes(2)},
         |assigned AS (
         |  SELECT vec_id, cent_id, v, norm FROM (
         |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
         |      row_number() OVER (PARTITION BY x.vec_id
         |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
         |          DESC, c.cent_id) AS crank
         |    FROM n x CROSS JOIN c2 c)
         |  WHERE crank = 1
         |), probes AS (
         |  SELECT vec_id AS query_id, cent_id, v AS qv, norm AS qnorm
         |  FROM (
         |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
         |      row_number() OVER (PARTITION BY x.vec_id
         |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
         |          DESC, c.cent_id) AS crank
         |    FROM n x CROSS JOIN c2 c
         |    WHERE x.vec_id < 10)
         |  WHERE crank <= 4
         |), cand AS (
         |  SELECT p.query_id, a.vec_id,
         |    list_dot_product(p.qv, a.v) / (p.qnorm * a.norm) AS cosine
         |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
         |  WHERE a.vec_id != p.query_id
         |)
         |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
         |FROM (
         |  SELECT query_id, vec_id AS neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
         |  FROM cand)
         |WHERE rank <= 5""".stripMargin,
    // IVF is fully relational (deterministic centroids = first 16 corpus
    // vectors), so unlike LSH it carries a complete oracle. f10 queries
    // the PERSISTED index built from the identical assignment, so it
    // shares this oracle verbatim.
    "f3_knn_ivf" -> ivfSqlOracle,
    "f10_knn_ivf_persisted" -> ivfSqlOracle,
    // f14: the same IVF replay over an index REBUILT without the
    // erased ids — the erasure DML must be answer-equivalent to it
    "f14_knn_ivf_delete" -> ivfSqlOracle
      .replace("WHERE a.vec_id != p.query_id",
        "WHERE a.vec_id != p.query_id AND a.vec_id % 5 <> 0")
      .replace("SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine",
        "SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine,\n  TRUE AS deleted_absent"),
    // f15: the streamed erasure must equal the same rebuilt-without-
    // erased replay as f14; n_erased is the %5==0 corpus population
    // (every masked row ledger-accounted), replay_noop the redrain pin
    "f15_knn_ivf_erase_stream" -> ivfSqlOracle
      .replace("WHERE a.vec_id != p.query_id",
        "WHERE a.vec_id != p.query_id AND a.vec_id % 5 <> 0")
      .replace("SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine",
        "SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine,\n  TRUE AS deleted_absent,\n  (SELECT count(*) FROM n WHERE vec_id % 5 = 0) AS n_erased,\n  TRUE AS replay_noop"),
    // f11: fixed centroids make the incremental append bit-identical to
    // a full rebuild, so the split never shows in the answer
    "f11_knn_ivf_incremental" -> ivfSqlOracle,
    // f13: full replay of the maintenance loop — drifted union, c0
    // occupancy skew (max/avg of per-cell counts), ONE Lloyd sweep to
    // c1, and the IVF search under the retrained codebook
    "f13_knn_ivf_retrain" ->
      s"""WITH base AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings
         |), nf AS (
         |  SELECT vec_id, v0 AS v FROM base WHERE vec_id < 350
         |  UNION ALL
         |  SELECT vec_id, list_transform(v0, x -> x + 1.0) AS v
         |  FROM base WHERE vec_id >= 350
         |), n AS (
         |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
         |  FROM nf
         |), c0 AS (
         |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
         |  FROM n WHERE vec_id < 16
         |), occ AS (
         |  SELECT cent_id, count(*) AS cnt FROM (
         |    SELECT x.vec_id, c.cent_id,
         |      row_number() OVER (PARTITION BY x.vec_id
         |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
         |          DESC, c.cent_id) AS crank
         |    FROM n x CROSS JOIN c0 c)
         |  WHERE crank = 1 GROUP BY 1
         |), skew AS (
         |  SELECT round(CAST(max(cnt) AS DOUBLE) / avg(cnt), 6)
         |    AS occ_skew_pre FROM occ
         |),
         |${lloydCtes(1)},
         |assigned AS (
         |  SELECT vec_id, cent_id, v, norm FROM (
         |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
         |      row_number() OVER (PARTITION BY x.vec_id
         |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
         |          DESC, c.cent_id) AS crank
         |    FROM n x CROSS JOIN c1 c)
         |  WHERE crank = 1
         |), probes AS (
         |  SELECT vec_id AS query_id, cent_id, v AS qv, norm AS qnorm
         |  FROM (
         |    SELECT x.vec_id, c.cent_id, x.v, x.norm,
         |      row_number() OVER (PARTITION BY x.vec_id
         |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
         |          DESC, c.cent_id) AS crank
         |    FROM n x CROSS JOIN c1 c
         |    WHERE x.vec_id < 10)
         |  WHERE crank <= 4
         |), cand AS (
         |  SELECT p.query_id, a.vec_id,
         |    list_dot_product(p.qv, a.v) / (p.qnorm * a.norm) AS cosine
         |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
         |  WHERE a.vec_id != p.query_id
         |)
         |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine,
         |  (SELECT occ_skew_pre FROM skew) AS occ_skew_pre,
         |  TRUE AS retrained
         |FROM (
         |  SELECT query_id, vec_id AS neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
         |  FROM cand)
         |WHERE rank <= 5""".stripMargin,
    // f12: f3's IVF pipeline with the label predicate on the candidate
    // stream — rank over exactly the matching set (pre-filter semantics)
    "f12_knn_filtered" ->
      """WITH n AS (
        |  SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS norm
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, label
        |        FROM embeddings)
        |), cents AS (
        |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
        |  FROM n WHERE vec_id < 16
        |), assigned AS (
        |  SELECT vec_id, cent_id, v, norm, label FROM (
        |    SELECT x.vec_id, c.cent_id, x.v, x.norm, x.label,
        |      row_number() OVER (PARTITION BY x.vec_id
        |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
        |          DESC, c.cent_id) AS crank
        |    FROM n x CROSS JOIN cents c)
        |  WHERE crank = 1
        |), probes AS (
        |  SELECT vec_id AS query_id, cent_id, v AS qv, norm AS qnorm,
        |    label AS qlabel
        |  FROM (
        |    SELECT x.vec_id, c.cent_id, x.v, x.norm, x.label,
        |      row_number() OVER (PARTITION BY x.vec_id
        |        ORDER BY list_dot_product(x.v, c.cv) / (x.norm * c.cnorm)
        |          DESC, c.cent_id) AS crank
        |    FROM n x CROSS JOIN cents c
        |    WHERE x.vec_id < 10)
        |  WHERE crank <= 4
        |), cand AS (
        |  SELECT p.query_id, p.qlabel, a.vec_id,
        |    list_dot_product(p.qv, a.v) / (p.qnorm * a.norm) AS cosine
        |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
        |  WHERE a.vec_id != p.query_id AND a.label = p.qlabel
        |)
        |SELECT query_id, label, neighbor_id, rank,
        |  round(cosine, 6) AS cosine
        |FROM (
        |  SELECT query_id, qlabel AS label, vec_id AS neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        |  FROM cand)
        |WHERE rank <= 5""".stripMargin,
    // g4: both fingerprint hashes are engine-portable by construction —
    // mod-p polynomial over the UTF-8 bytes (RollingHash doc) and a
    // 60-bit md5 slice winnow minimum.
    "g4_fingerprint" ->
      """WITH b AS (
        |  SELECT doc_id, lower(text) AS lt,
        |    string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), fp AS (
        |  SELECT doc_id, toks,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, CAST(strlen(lt) AS INTEGER) + 1),
        |        i -> ('0x' || substr(hex(encode(lt)),
        |                     CAST(2*i - 1 AS INTEGER), 2))::BIGINT)),
        |      (a, x) -> (a * 131 + x) % 1000000007) AS fingerprint
        |  FROM b
        |)
        |SELECT doc_id, fingerprint,
        |  CASE WHEN len(toks) >= 4 THEN
        |    CAST(list_aggregate(list_transform(
        |      list_transform(range(1, len(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |             || ' ' || toks[i+3]),
        |      s -> CAST(('0x' || substr(md5(s), 1, 15))::UBIGINT AS BIGINT)),
        |      'min') AS BIGINT)
        |  ELSE NULL END AS winnow_min
        |FROM fp""".stripMargin,
    "g1_token_stats" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
        |  CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |       AS INTEGER) AS sum_token_len,
        |  round(CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |        AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) AS avg_token_len,
        |  round(CAST(len(list_distinct(toks)) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE), 6) AS ttr
        |FROM (SELECT doc_id, lang, n_chars,
        |        string_split(lower(text), ' ') AS toks FROM documents)""".stripMargin,
    "g2_quality_score" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(len(list_filter(toks, t ->
        |      list_contains(['the','a','and','of','to'], t))) AS INTEGER)
        |      AS n_stop,
        |    CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |      AS INTEGER) AS sum_len
        |  FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        |        FROM documents)
        |)
        |SELECT doc_id, lang, n_tokens,
        |  round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS stopword_ratio,
        |  round(0.5 * (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |    + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |    + 0.2 * greatest(1.0 - abs(CAST(sum_len AS DOUBLE)
        |        / CAST(n_tokens AS DOUBLE) - 5.0) / 10.0, 0.0), 6)
        |    AS quality_score
        |FROM c""".stripMargin,
    // g20: the oracle replays the same three-gate chain — g3's argmax,
    // g2's score formula, e1's first-occurrence dedup — over the
    // corpus + its re-keyed duplicate slice, then reports per source
    "g20_curation_pipeline" ->
      """WITH docs AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, source, text FROM documents
        |  WHERE doc_id % 9 = 0
        |), c AS (
        |  SELECT doc_id, source, text,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |      AS INTEGER) AS sum_len,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['the','a','and','of','to'], x))) AS INTEGER)
        |      AS cnt_en,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['el','la','de','que','y'], x))) AS INTEGER)
        |      AS cnt_es,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['der','die','und','das','ist'], x)))
        |      AS INTEGER) AS cnt_de,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['le','la','et','les','des'], x))) AS INTEGER)
        |      AS cnt_fr
        |  FROM (SELECT doc_id, source, text,
        |          string_split(lower(text), ' ') AS toks FROM docs)
        |), gated AS (
        |  SELECT doc_id, source, text, n_tokens,
        |    round(0.5 * (CAST(cnt_en AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |      + 0.2 * greatest(1.0 - abs(CAST(sum_len AS DOUBLE)
        |          / CAST(n_tokens AS DOUBLE) - 5.0) / 10.0, 0.0), 6)
        |      AS quality_score
        |  FROM c
        |  WHERE (CASE
        |      WHEN cnt_en >= cnt_es AND cnt_en >= cnt_de
        |        AND cnt_en >= cnt_fr THEN 'en'
        |      WHEN cnt_es >= cnt_de AND cnt_es >= cnt_fr THEN 'es'
        |      WHEN cnt_de >= cnt_fr THEN 'de'
        |      ELSE 'fr' END) = 'en'
        |), winners AS (
        |  SELECT sha256(text) AS h, min(doc_id) AS keep_id
        |  FROM gated WHERE quality_score >= 0.4 GROUP BY 1
        |)
        |SELECT g.source, count(*) AS n_docs,
        |  CAST(sum(g.n_tokens) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(CAST(g.quality_score AS DECIMAL(38,10)))
        |    AS DOUBLE) / count(*), 6) AS avg_quality
        |FROM gated g JOIN winners w
        |  ON sha256(g.text) = w.h AND g.doc_id = w.keep_id
        |WHERE g.quality_score >= 0.4
        |GROUP BY 1""".stripMargin,
    "g3_lang_id" ->
      """WITH c AS (
        |  SELECT doc_id, declared_lang,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['the','a','and','of','to'], x))) AS INTEGER)
        |      AS cnt_en,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['el','la','de','que','y'], x))) AS INTEGER)
        |      AS cnt_es,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['der','die','und','das','ist'], x))) AS INTEGER)
        |      AS cnt_de,
        |    CAST(len(list_filter(toks, x ->
        |      list_contains(['le','la','et','les','des'], x))) AS INTEGER)
        |      AS cnt_fr
        |  FROM (SELECT doc_id, lang AS declared_lang,
        |          string_split(lower(text), ' ') AS toks FROM documents)
        |)
        |SELECT doc_id, declared_lang,
        |  CASE
        |    WHEN cnt_en >= cnt_es AND cnt_en >= cnt_de AND cnt_en >= cnt_fr
        |      THEN 'en'
        |    WHEN cnt_es >= cnt_de AND cnt_es >= cnt_fr THEN 'es'
        |    WHEN cnt_de >= cnt_fr THEN 'de'
        |    ELSE 'fr' END AS predicted_lang,
        |  round(CAST(greatest(cnt_en, cnt_es, cnt_de, cnt_fr) AS DOUBLE)
        |        / greatest(CAST(n_tokens AS DOUBLE), 1.0), 6) AS confidence,
        |  n_tokens
        |FROM c""".stripMargin,
    "g5_corpus_stats" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source,
        |    string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(len(toks)) AS BIGINT) AS total_tokens
        |  FROM base GROUP BY 1, 2
        |), d AS (
        |  SELECT lang, source, count(DISTINCT tok) AS n_distinct_tokens
        |  FROM (SELECT lang, source, unnest(toks) AS tok FROM base)
        |  GROUP BY 1, 2
        |)
        |SELECT s.lang, s.source, n_docs, total_tokens, n_distinct_tokens
        |FROM s JOIN d USING (lang, source)""".stripMargin,
    // g13: g5 with the distinct count carried by the per-group KMV sketch
    // (the g11 discipline per (lang, source)): the kth-smallest md5-slice
    // hash is a pure function of the token set, so the approximate
    // estimate has an exact oracle.
    "g13_corpus_stats_sketch" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang, source,
         |    string_split(lower(text), ' ') AS toks
         |  FROM documents
         |), s AS (
         |  SELECT lang, source, count(*) AS n_docs,
         |    CAST(sum(len(toks)) AS BIGINT) AS total_tokens
         |  FROM base GROUP BY 1, 2
         |), h AS (
         |  SELECT DISTINCT lang, source,
         |    CAST(('0x' || substr(md5(tok), 1, 15))::UBIGINT AS BIGINT) AS hv
         |  FROM (SELECT lang, source, unnest(toks) AS tok FROM base)
         |), r AS (
         |  SELECT lang, source, hv,
         |    row_number() OVER (PARTITION BY lang, source ORDER BY hv) AS rn,
         |    count(*) OVER (PARTITION BY lang, source) AS nd
         |  FROM h
         |), est AS (
         |  SELECT lang, source,
         |    round(CASE WHEN max(nd) < $KmvK THEN CAST(max(nd) AS DOUBLE)
         |      ELSE ($KmvK - 1) * pow(2.0, 60)
         |           / CAST(max(CASE WHEN rn = $KmvK THEN hv END) AS DOUBLE)
         |      END, 6) AS distinct_tokens_est
         |  FROM r GROUP BY 1, 2
         |)
         |SELECT s.lang, s.source, n_docs, total_tokens, distinct_tokens_est
         |FROM s JOIN est USING (lang, source)""".stripMargin,
    // j7: the salted join is row-identical to the plain join — the oracle
    // IS the plain join; the dimension side derives from the data
    // j12: DPP must never change the answer — the oracle is the plain
    // filtered rollup
    "j12_dynamic_partition_pruning" ->
      """SELECT l_returnflag AS flag,
        |  'FLAG_' || l_returnflag AS flag_name, count(*) AS n_items,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE),
        |    6) AS total_qty
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY 1, 2""".stripMargin,
    // j13: the three scan mechanisms (DPP, Bloom skip, pushdown +
    // broadcast) are COST-only — the oracle is the plain filtered star
    "j13_star_composed" ->
      """SELECT l.l_returnflag AS flag,
        |  'FLAG_' || l.l_returnflag AS flag_name,
        |  o.o_orderpriority AS priority, c.c_mktsegment AS segment,
        |  count(*) AS n_items,
        |  round(CAST(sum(CAST(l.l_quantity AS DECIMAL(38,10))) AS DOUBLE),
        |    6) AS total_qty
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE l.l_returnflag = 'R' AND o.o_orderpriority = '1-URGENT'
        |  AND c.c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3, 4""".stripMargin,
    // j14: the bucketed layout + SPJ plan are COST-only — the oracle is
    // the plain custkey join
    "j14_spj_colocated" ->
      """SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
        |  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,10)))
        |    AS DOUBLE), 6) AS total_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,
    "j7_salted_skew_join" ->
      """SELECT flag, flag_name, count(*) AS n_items,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_qty
        |FROM lineitem
        |JOIN (SELECT DISTINCT l_returnflag AS flag,
        |        'FLAG_' || l_returnflag AS flag_name FROM lineitem) d
        |  ON l_returnflag = d.flag
        |GROUP BY 1, 2""".stripMargin,
    // j11: the oracle runs the NAIVE unkeyed theta join the binned plan
    // replaces — row-identical output proves binning loses nothing
    "j11_binned_range_join" ->
      """SELECT e.event_id AS error_id, count(*) AS n_follow,
        |  count(DISTINCT p.user_id) AS n_users,
        |  count(CASE WHEN p.event_type = 'error' THEN 1 END) AS n_cascade
        |FROM events e JOIN events p
        |  ON epoch_us(p.ts) >= epoch_us(e.ts) + 1
        | AND epoch_us(p.ts) <= epoch_us(e.ts) + 300000000
        |WHERE e.event_type = 'error'
        |GROUP BY 1""".stripMargin,
    "g6_quality_filter" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(len(list_filter(toks, t ->
        |      list_contains(['the','a','and','of','to'], t))) AS INTEGER)
        |      AS n_stop,
        |    CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
        |      AS INTEGER) AS sum_len
        |  FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        |        FROM documents)
        |), scored AS (
        |  SELECT doc_id, lang, n_tokens,
        |    round(0.5 * (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |      + 0.2 * greatest(1.0 - abs(CAST(sum_len AS DOUBLE)
        |          / CAST(n_tokens AS DOUBLE) - 5.0) / 10.0, 0.0), 6)
        |      AS quality_score
        |  FROM c
        |)
        |SELECT doc_id, lang, n_tokens, quality_score
        |FROM scored WHERE quality_score >= 0.4""".stripMargin,
    "g7_pii_scrub" ->
      """SELECT doc_id, lang,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>',
        |    'g'),
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS clean_text,
        |  CAST(
        |    len(regexp_extract_all(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        |    + len(regexp_extract_all(text, 'https?://[^ ]+'))
        |    + len(regexp_extract_all(text, '\+?[0-9][0-9()\- ]{7,}[0-9]'))
        |    AS INTEGER) AS n_redactions
        |FROM documents""".stripMargin,
    "g8_contamination" ->
      """WITH probes AS (
        |  SELECT DISTINCT sh_el AS probe
        |  FROM (SELECT unnest(list_distinct(list_transform(
        |          range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
        |          AS sh_el
        |        FROM (SELECT string_split(lower(text), ' ') AS toks
        |              FROM documents WHERE doc_id = 0))
        |  ORDER BY 1 LIMIT 5
        |)
        |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits
        |FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS padded
        |      FROM documents) d
        |CROSS JOIN probes
        |WHERE contains(d.padded, ' ' || probes.probe || ' ')
        |GROUP BY 1""".stripMargin,
    "h1_media_metadata" ->
      """SELECT doc_id,
        |  (['png','jpeg','wav','mp4'])[CAST(doc_id % 4 + 1 AS INTEGER)]
        |    AS format,
        |  CAST((doc_id % 16 + 1) * 64 AS INTEGER) AS width,
        |  CAST((doc_id % 9 + 1) * 64 AS INTEGER) AS height,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    // h3: a REAL RIFF/WAVE parse of deterministically synthesized PCM —
    // every decoded field is an arithmetic function of doc_id, so the
    // oracle recomputes what the binary parser must extract
    "h3_wav_decode" ->
      """SELECT doc_id,
        |  1 AS channels,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
        |  8 AS bits_per_sample,
        |  CAST(64 + (doc_id % 128) AS BIGINT) AS n_samples,
        |  CAST(list_max(list_transform(
        |      range(0, CAST(64 + (doc_id % 128) AS INTEGER)),
        |      i -> (7 * i + doc_id) % 256)) AS INTEGER) AS peak,
        |  CAST(list_aggregate(list_transform(
        |      range(0, CAST(64 + (doc_id % 128) AS INTEGER)),
        |      i -> (7 * i + doc_id) % 256), 'sum') AS BIGINT) AS sample_sum,
        |  round(CAST(64 + (doc_id % 128) AS DOUBLE) * 1000.0 /
        |    CAST(8000 + (doc_id % 8) * 1000 AS DOUBLE), 6) AS duration_ms
        |FROM documents""".stripMargin,
    // h5: every marker-segment field is arithmetic in doc_id, so the
    // oracle re-derives dimensions, segment counts, and the DQT sum —
    // the Spark side only matches if the marker walk is correct
    "h5_jpeg_decode" ->
      """SELECT doc_id,
        |  CAST(16 + (doc_id % 240) AS INTEGER) AS width,
        |  CAST(16 + (doc_id % 120) AS INTEGER) AS height,
        |  8 AS bit_depth,
        |  3 AS n_components,
        |  CAST(3 + CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_segments,
        |  CAST(list_aggregate(list_transform(range(0, 64),
        |      i -> (i + doc_id) % 255 + 1), 'sum') AS BIGINT) AS qtable_sum,
        |  round(CAST(16 + (doc_id % 240) AS DOUBLE)
        |    / (16 + (doc_id % 120)), 6) AS aspect
        |FROM documents""".stripMargin,
    // h6: every ISO-BMFF field re-derived arithmetically — the Spark
    // side only matches if the box walk (incl. the free-box skip, the
    // largesize escape and the 16.16 tkhd dims) is structurally right
    "h6_mp4_decode" ->
      """SELECT doc_id,
        |  'isom' AS major_brand,
        |  CAST(600 + doc_id % 1000 AS BIGINT) AS timescale,
        |  CAST((1 + doc_id % 60) * 1000 AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS n_tracks,
        |  CAST((doc_id % 16 + 1) * 64 AS INTEGER) AS width,
        |  CAST((doc_id % 9 + 1) * 64 AS INTEGER) AS height,
        |  CAST(4 + 2 * (1 + doc_id % 2)
        |    + CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_boxes,
        |  CAST(16 + doc_id % 32 AS BIGINT) AS mdat_bytes,
        |  CAST(list_aggregate(list_transform(
        |      range(0, CAST(16 + doc_id % 32 AS INTEGER)),
        |      j -> (doc_id + j) % 256), 'sum') AS BIGINT) AS mdat_sum,
        |  round(CAST((doc_id % 16 + 1) * 64 AS DOUBLE)
        |    / ((doc_id % 9 + 1) * 64), 6) AS aspect
        |FROM documents""".stripMargin,
    // h4: the decoded pixel grid is pure arithmetic in doc_id —
    // pixel(x,y) = (7x + 31y + doc_id) mod 256 over a w×h grid — so the
    // oracle re-derives the stats relationally; the Spark side only
    // matches if signature/CRC/inflate/unfilter all round-trip.
    "h4_png_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 13 AS INTEGER) AS width,
        |    CAST(3 + doc_id % 7 AS INTEGER) AS height
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, width, height,
        |    list_transform(range(0, CAST(width AS BIGINT) * height),
        |      i -> (7 * (i % width) + 31 * (i // width) + doc_id) % 256)
        |      AS px
        |  FROM d
        |)
        |SELECT doc_id, width, height, 8 AS bit_depth, 0 AS color_type,
        |  CAST(width AS BIGINT) * height AS n_pixels,
        |  CAST(list_aggregate(px, 'sum') AS BIGINT) AS pix_sum,
        |  CAST(list_max(px) AS INTEGER) AS peak,
        |  round(CAST(list_aggregate(px, 'sum') AS DOUBLE) /
        |    CAST(CAST(width AS BIGINT) * height AS DOUBLE), 6) AS mean_pixel
        |FROM p""".stripMargin,
    // h2: three decode branches, one per backend the RealDecoder dispatch
    // selects. wav/png rows carry REAL payloads whose decoded content is
    // arithmetic in doc_id (same formulas the h3/h4 oracles pin), so the
    // oracle re-derives mean-of-samples / mean-of-pixels and the strided
    // frame offsets over DECODED units; jpeg/mp4 rows keep the stub
    // backend — mean byte via the hex expansion of the UTF-8 text
    // payload, strided byte offsets, thumb = halve-until-<=64px
    // (unrolled: width <= 1024 needs at most 4 halvings).
    "h2_media_features" ->
      """WITH wavf AS (
        |  SELECT doc_id, CAST(64 + (doc_id % 128) AS BIGINT) AS ns,
        |    greatest((64 + (doc_id % 128)) // 4, 1) AS stride
        |  FROM documents WHERE doc_id % 4 = 2
        |), wav AS (
        |  SELECT doc_id, 'wav' AS format,
        |    round(CAST(list_aggregate(list_transform(
        |        range(0, CAST(ns AS INTEGER)), i -> (7 * i + doc_id) % 256),
        |      'sum') AS DOUBLE) / CAST(ns AS DOUBLE), 6) AS mean_byte,
        |    CAST(least(4, (ns + stride - 1) // stride) AS INTEGER)
        |      AS n_frames,
        |    CAST(0 AS BIGINT) AS first_offset,
        |    CAST((least(4, (ns + stride - 1) // stride) - 1) * stride
        |      AS BIGINT) AS last_offset,
        |    0 AS thumb_w, 0 AS thumb_h, 'real-wav' AS decoder
        |  FROM wavf
        |), pngf AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 13 AS INTEGER) AS w,
        |    CAST(3 + doc_id % 7 AS INTEGER) AS h,
        |    greatest(CAST(3 + doc_id % 7 AS INTEGER) // 4, 1) AS stride
        |  FROM documents WHERE doc_id % 4 = 0
        |), png AS (
        |  SELECT doc_id, 'png' AS format,
        |    round(CAST(list_aggregate(list_transform(
        |        range(0, CAST(w AS BIGINT) * h),
        |        i -> (7 * (i % w) + 31 * (i // w) + doc_id) % 256),
        |      'sum') AS DOUBLE) / CAST(CAST(w AS BIGINT) * h AS DOUBLE), 6)
        |      AS mean_byte,
        |    CAST(least(4, (h + stride - 1) // stride) AS INTEGER)
        |      AS n_frames,
        |    CAST(0 AS BIGINT) AS first_offset,
        |    CAST((least(4, (h + stride - 1) // stride) - 1) * stride * w
        |      AS BIGINT) AS last_offset,
        |    w AS thumb_w, h AS thumb_h, 'real-png' AS decoder
        |  FROM pngf
        |), m AS (
        |  SELECT doc_id,
        |    (doc_id % 16 + 1) * 64 AS w0,
        |    (doc_id % 9 + 1) * 64 AS h0,
        |    CAST(16 + doc_id % 32 AS BIGINT) AS n_bytes
        |  FROM documents WHERE doc_id % 4 = 3
        |), jpg AS (
        |  SELECT doc_id, 'jpeg' AS format,
        |    round(CAST(list_aggregate(list_transform(range(0, 64),
        |        i -> (i + doc_id) % 255 + 1), 'sum') AS DOUBLE) / 64.0, 6)
        |      AS mean_byte,
        |    CAST(ns AS INTEGER) AS n_frames,
        |    CAST(0 AS BIGINT) AS first_offset,
        |    CAST(ns - 1 AS BIGINT) AS last_offset,
        |    CAST(wj2 AS INTEGER) AS thumb_w,
        |    CAST(hj2 AS INTEGER) AS thumb_h,
        |    'real-jpeg' AS decoder
        |  FROM (
        |    SELECT doc_id, ns,
        |      CASE WHEN wj1 > 64 OR hj1 > 64 THEN wj1 // 2 ELSE wj1 END
        |        AS wj2,
        |      CASE WHEN wj1 > 64 OR hj1 > 64 THEN hj1 // 2 ELSE hj1 END
        |        AS hj2
        |    FROM (
        |      SELECT doc_id, ns,
        |        CASE WHEN wj0 > 64 OR hj0 > 64 THEN wj0 // 2 ELSE wj0 END
        |          AS wj1,
        |        CASE WHEN wj0 > 64 OR hj0 > 64 THEN hj0 // 2 ELSE hj0 END
        |          AS hj1
        |      FROM (
        |        SELECT doc_id,
        |          3 + CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END AS ns,
        |          16 + (doc_id % 240) AS wj0,
        |          16 + (doc_id % 120) AS hj0
        |        FROM documents WHERE doc_id % 4 = 1)))
        |), f AS (
        |  SELECT doc_id, n_bytes, w0, h0,
        |    round(CAST(list_aggregate(list_transform(
        |        range(0, CAST(n_bytes AS INTEGER)),
        |        j -> (doc_id + j) % 256),
        |      'sum') AS DOUBLE) / CAST(n_bytes AS DOUBLE), 6) AS mean_byte,
        |    greatest(n_bytes // 4, 1) AS stride
        |  FROM m
        |), t1 AS (
        |  SELECT *,
        |    CASE WHEN w0 > 64 OR h0 > 64 THEN w0 // 2 ELSE w0 END AS w1,
        |    CASE WHEN w0 > 64 OR h0 > 64 THEN h0 // 2 ELSE h0 END AS h1
        |  FROM f
        |), t2 AS (
        |  SELECT *,
        |    CASE WHEN w1 > 64 OR h1 > 64 THEN w1 // 2 ELSE w1 END AS w2,
        |    CASE WHEN w1 > 64 OR h1 > 64 THEN h1 // 2 ELSE h1 END AS h2
        |  FROM t1
        |), t3 AS (
        |  SELECT *,
        |    CASE WHEN w2 > 64 OR h2 > 64 THEN w2 // 2 ELSE w2 END AS w3,
        |    CASE WHEN w2 > 64 OR h2 > 64 THEN h2 // 2 ELSE h2 END AS h3
        |  FROM t2
        |), t4 AS (
        |  SELECT *,
        |    CASE WHEN w3 > 64 OR h3 > 64 THEN w3 // 2 ELSE w3 END AS w4,
        |    CASE WHEN w3 > 64 OR h3 > 64 THEN h3 // 2 ELSE h3 END AS h4
        |  FROM t3
        |), mp4 AS (
        |  SELECT doc_id, 'mp4' AS format, mean_byte,
        |    CAST(least(4, (n_bytes + stride - 1) // stride) AS INTEGER)
        |      AS n_frames,
        |    CAST(0 AS BIGINT) AS first_offset,
        |    CAST((least(4, (n_bytes + stride - 1) // stride) - 1)
        |         * stride AS BIGINT) AS last_offset,
        |    CAST(w4 AS INTEGER) AS thumb_w, CAST(h4 AS INTEGER) AS thumb_h,
        |    'real-mp4' AS decoder
        |  FROM t4
        |)
        |SELECT * FROM wav UNION ALL SELECT * FROM png
        |UNION ALL SELECT * FROM jpg
        |UNION ALL SELECT * FROM mp4""".stripMargin,
  )
}
