package graft

import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` output for representative queries to a
  * markdown file — the plan-shape audit trail (pushdown, broadcast,
  * codegen spans) referenced from BASELINE.md.
  *
  * Usage: runMain graft.ExplainDump [sfDir] [outFile]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "EXPLAIN.md"
    val spark = graft.sessions.Sessions
      .builder(appName = "graft-explain", master = "local[4]",
        shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val picks = Seq(
      "a2_silver_asset_perf",  // partial+final hash agg, one exchange
      "b1_listings_cleanse",   // pure narrow projection, zero exchange
      "c4_upsert",             // broadcast joins, base never shuffles
      "e1_dedup_exact",        // digest-keyed shuffle
      "e6_dedup_embedding_lsh",// signature-cell equi-join, id-only shuffle
      "f1_knn_bruteforce",     // broadcast query batch + per-query window
      "g9_token_count_regex",  // narrow codegen'd projection
      "e2_dedup_ngram_jaccard",// inverted shingle index: equi-join + count
      "e8_dedup_ppjoin",       // hash-domain prefix index: long equi-join
      "f4_knn_ivf_kmeans",     // Lloyd sweeps: broadcast centroids per pass
      "g11_kmv_distinct_tokens",// custom KMV aggregate: partial k-buffers
      "g14_repetition_stats",  // narrow HOF projection, zero exchange
      "g15_mixture_sample",    // content-hash gate + partial+final agg
      "g16_sequence_pack",     // per-lang window prefix sum + hash agg
      "g13_corpus_stats_sketch",// sketch-sized shuffle vs g5's exact path
      "j7_salted_skew_join",   // salt exchange: (flag, __salt) partitioning
      "t2_graftlog_merge",     // file-pruned MERGE through the commit log
      "t8_graftlog_data_skipping", // stat-pruned scan: fewer input files
      "f5_embedding_quantize", // broadcast stats join + narrow encode
      "i1_events_windowed_agg",
      "i5_events_enrich",      // stream-static shape: broadcast dim join
      "j1_star_revenue",       // fact-fact shuffle join + broadcast dims
      "j2_json_props",         // single from_json parse + one exchange
      "j3_revenue_rollup",     // one-pass grouping sets
      "j5_asof_last_view",     // as-of: one shuffle + window pass
      "j6_session_attach",     // keyed range join
      "j8_revenue_cube",       // Expand×4 into one exchange
      "j9_window_returns",     // 4 window specs, one ticker exchange
      "g17_column_profile",    // one scan, Expand-based multi-distinct
      "e11_dedup_semantic",    // broadcast centroids + cell equi-join
      "t10_graftlog_fileindex_scan", // planner-driven file skipping
      "t11_graftlog_partitioned",    // exact partition pruning
      "t12_graftlog_zorder",   // two-dim stat skipping layout
      "j10_revenue_percentiles", // exact sort-based percentile agg
      "g18_bigram_lm_score",   // vocab-sized count tables, token joins
      "e13_dedup_containment", // directional inverted-index normalizer
      "e14_dedup_containment_bucketed", // bucketed prefix index + filter
      "f8_knn_ivfadc",         // residual PQ, cell-confined ADC join
      "t16_graftlog_partitioned_merge", // partitioned file-pruned MERGE
      "d6_graft_sql_merge",    // SQL MERGE routed to the commit log
      "e15_dedup_substring_spans", // window-hash groupBy + span merge
      "g19_dsir_importance",   // bucket-keyed model joins, 1-row totals
      "t17_graftlog_deletion_vectors", // anti-join DV mask on _metadata
      "t18_graftlog_bloom_skipping",   // bloom-pruned point lookup
      "t19_graftlog_bucket_transform", // hidden-bucket dir pruning
      "d11_merge_scd_closeout",  // clause-pruned close-out MERGE read-back
      "i17_streaming_cdf_erasure", // DV-erasure CDF replayed as change rows
      "j11_binned_range_join",   // interval containment as an equi-join
      "t29_replace_where",       // slice reload: pruned probe, carried rest
      "t33_null_skipping",       // IS NOT NULL pruned via #nulls stats
      "e16_dedup_incremental",   // Bloom prefilter, broadcast-only joins
      "e17_neardup_incremental", // asymmetric band join batch x corpus
      "f11_knn_ivf_incremental", // codebook-assign append, probed cells
      "f12_knn_filtered",        // label pre-filter inside probed cells
      "g21_chunk_overlap",       // zero-exchange posexplode windows
      "g22_shard_shuffle",       // ONE hash exchange + per-shard sort
      "t34_row_tracking",        // base-join + coalesce(materialized)
      "t36_rowid_cdf",           // file-bounded row-id full-outer diff
      "d16_sql_insert",          // SQL INSERT via the log commit path
      "d21_merge_conditional",   // clause-cascade MERGE read-back
      "d22_table_changes",       // table_changes TVF: per-version diffs
      "d20_analyze_columns",     // one-pass column stats (KMV + min/max)
      "f13_knn_ivf_retrain",     // audit + Lloyd retrain + probed cells
      "d23_copy_into",           // ledger-deduped directory ingest
      "d24_merge_on_extra",      // full-ON cascade read-back
      "e18_dedup_state_persisted", // digest-table Bloom gate + append
      "j12_dynamic_partition_pruning", // runtime dir pruning via DPP
      "j13_star_composed",       // DPP + bloom skip + CBO broadcast, one plan
      "j14_spj_colocated",       // storage-partitioned join: ZERO exchanges
      "e21_contamination_spj",   // SPJ join + bucket-satisfied agg, no moves
      "t42_liquid_clustering",   // incremental zcube read-back
      "e19_dedup_state_scalable",  // Bloom sidecar + prefix-pruned probe
      "e20_neardup_state_rolling", // band-key sidecar + pruned verify
      "i28_incremental_agg_view",  // CDF fold into the delta-log view
      "i30_neardup_stream_ingest", // streamed e20: ledger-first verdicts
      "d27_mv_auto_rewrite",       // aggregate rewritten to the view scan
      "d29_mv_compensated_rewrite",// stale view + CDF tail, always fresh
      "d30_mv_multicol",           // N-column key, query's order kept
      "d28_stats_refresh",         // metadata fold + KMV merge, no rescan
      "d31_mv_avg_stddev",         // avg/stddev served from the moments
      "t43_row_tracking_merge",    // id-preserving MERGE read-back
      "e22_training_pipeline",     // staged pipeline: cached seams only
      "d32_mv_filtered_rewrite",   // group-column WHERE on the view scan
      "g23_sequence_pack_split",   // grid-fragment explode, one window
      "f14_knn_ivf_delete",        // erasure DML + pruned probe
      "g24_token_budget_select",   // quality-ordered distributed prefix
      "d33_mv_subset_filter",      // bucket WHERE + subset re-aggregation
      "d34_mv_minmax",             // extrema fold (post-delete fallback)
      "e23_training_pipeline_incr",// per-wave state advance read-back
      "f15_knn_ivf_erase_stream",  // DV-masked cells + pruned probe
      "d35_mv_join_rewrite",       // star served: view ⋈ dim, no fact
      "d36_mv_snowflake",          // view swapped into the join tree
      "d38_mv_union",              // union fan-in served from one view
      "g25_source_cap",            // two-level bounded top-N windows
      "g26_cms_token_frequency",   // cell-bounded sketch shuffle
      "e24_dedup_substring_cut",   // keeper election on the hash index
      "d39_mv_describe",           // metadata-only freshness probe
      "g28_corpus_drift",          // one batch CDF read, per-version fold
      "i31_union_view_stream",     // stream-maintained union view serve
      "d40_mv_two_fact_join",      // both facts swapped for their views
      "i32_join_view_stream",      // stream-maintained star serve
      "e25_dedup_state_erasure",   // pruned erase + re-minted sidecar
      "d41_mv_star_sql_lifecycle", // CREATE'd star served post-REFRESH
      "d42_mv_outer_star",         // left-outer star: view left-joins dim
      "e26_training_pipeline_curated", // contamination + source caps
      "i33_two_fact_view_stream")  // two CDF channels, d40 serve mid

    val sb = new StringBuilder
    sb.append("# Physical plans (generated by graft.ExplainDump)\n\n")
    sb.append(s"Scale factor dir: `$sfDir`\n\n")
    picks.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"## $name\n\n```\n$plan\n```\n\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
