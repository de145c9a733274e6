package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of flagship queries to stdout
  * (captured into PLANS.md) — the pushdown / broadcast / codegen evidence
  * for the scale-design claims in README.md.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picks = Seq("join_broadcast", "text_lang_stats", "dedup_minhash",
      "sim_ann_ivf", "window_tumbling", "agg_percentiles",
      "dedup_embedding_cosine", "dedup_incremental_minhash",
      "dedup_incremental_embedding",
      "dedup_incremental_minhash_indexed", "dedup_incremental_embedding_indexed",
      "agg_incremental_state_stored", "scd2_merge_incremental",
      "cdc_snapshot_diff", "funnel_steps", "quality_checks",
      "dedup_common_span_incremental", "agg_rolling_distinct",
      "funnel_sessions", "agg_outlier_exact",
      "join_bloom_pruned", "dedup_semantic", "dedup_containment",
      "curate_dsir_select_indexed", "text_bm25_topk", "agg_outlier_mad",
      "curate_temperature_sample",
      "text_chunk_windows", "dedup_keep_best", "quality_drift_psi",
      "curate_shard_assign", "sim_knn_graph",
      "text_topp_vocab", "text_novelty_incremental", "window_rate_anomaly",
      "agg_percentiles_incremental", "quality_skew_report",
      "text_novelty_indexed", "dedup_common_span_incremental_indexed",
      "text_fuzzy_join", "join_scd2_pointintime", "graph_pagerank",
      "vector_project_rp", "text_phrase_search", "events_gapfill",
      "agg_histogram_equidepth", "agg_decayed_counts",
      "sim_knn_triangles", "agg_group_trend", "agg_group_corr",
      "basket_pair_support", "text_bigram_lm_score",
      "feature_rank_normalize", "window_range_frame",
      "feature_rank_normalize_by", "join_asof_forward",
      "text_bigram_lm_incremental", "pipeline_lm_filter", "events_ab_lift",
      "basket_components", "basket_clustering_coeff", "retrieval_hybrid_rrf",
      "dedup_ngram_jaccard", "agg_approx_percentile",
      "text_pmi_pairs", "dedup_cross_source_matrix",
      "text_pmi_incremental", "text_textrank_keywords",
      "window_ntile_dist", "join_full_outer", "sim_knn_triangles",
      "join_bucketed_colocated", "agg_percentile_cont",
      "agg_percentile_cont_by", "events_interpolate",
      "pipeline_corpus_card", "multimodal_frame_sample")
    println("## entry (regional revenue: scan → 4 broadcast joins → agg → sort)")
    println("```")
    println(SparkEntry.entry(spark).queryExecution.executedPlan.toString)
    println("```")
    picks.foreach { name =>
      println(s"## $name")
      println("```")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString)
      println("```")
    }
    spark.stop()
  }
}
