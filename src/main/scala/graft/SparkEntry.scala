package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY §2 (or a
  * scale-suite addition: dedup / ANN / text analysis), expressed as a
  * declarative Spark plan; [[oracleSql]] carries the exact DuckDB
  * equivalent for the driver's hash-compare gate.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    RetrievalQueries.all ++
    IngestQueries.all ++
    DedupQueries.all ++
    AnnQueries.all ++
    TextQueries.all ++
    CurationQueries.all ++
    RelationalQueries.all ++
    EngineQueries.all ++
    PostQueries.all ++
    StreamMultimodalQueries.all ++
    ScaleQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full ingest→embed→hybrid-search pipeline. */
  def entry(spark: SparkSession): DataFrame =
    queries("hybrid_search_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** Raw registry names BEFORE the map dedups — lets the spec assert no
    * two modules register the same name (which would silently shadow). */
  private[graft] def registryNames: Seq[String] = registry.map(_.name)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset timed by [[Bench]] (the rest still run in Verify). */
  def benchQueries: Seq[String] = Seq(
    "d2_knn_topk", "d4_keyword_search", "d4_posting_search", "d7_rrf_fusion",
    "hybrid_search_fused", "d13_context_window",
    // the engine's signature serving path — deterministic under D19
    // benchmarkMode since round 10, so now benchable round-over-round
    "hybrid_search_ann", "hybrid_search_e2e", "sql_interface_hybrid",
    // the build the warm flagship amortizes (fresh workspace per run) and
    // the degenerate mega-bucket pair stage (round-12 trend rows)
    "ann_index_build", "dedup_simhash_pairs_skew",
    "stream_ingest", "dedup_simhash_pairs",
    "ann_bruteforce_topk", "ann_lsh_bucketed", "ann_lsh_multitable",
    "ann_ivf_cells", "ann_pq_adc",
    "ann_sq8_topk",
    "ann_ivfpq", "ann_ivfpq_refined", "ann_maxsim_multivector",
    "ann_hamming_binary", "ml_kmeans_step", "ann_ivf_trained",
    "ann_lsh_auto_geometry", "ann_ivf_auto_nprobe", "ann_ivfpq_refined_auto",
    "dedup_exact", "dedup_minhash_lsh", "dedup_lsh_verified_pairs",
    "dedup_embedding_cosine", "dedup_semantic", "dedup_substring_spans",
    "dedup_cdc_chunks", "dedup_cdc_savings", "dedup_cdc_containment",
    "curation_decontaminate", "curation_dsir_weights", "pipeline_pretrain_e2e",
    "ml_pca_covariance", "sketch_cms_estimate", "sketch_kmv_distinct",
    "sketch_kmv_merge", "sketch_kmv_intersect", "sketch_kmv_jaccard",
    "sketch_cms_merge", "sketch_hll_merge", "sketch_quantile_merge",
    "sketch_hll_distinct", "sketch_quantile_hist", "ml_linear_probe_train",
    "graph_pagerank_step", "graph_pagerank_converged", "graph_label_prop",
    "graph_triangle_count", "graph_kcore_peel",
    "dedup_canonical_docs", "curation_bloom_decontam",
    "curation_source_overlap", "embed_outlier_flags",
    "curation_weighted_sample", "curation_curriculum_order",
    "curation_shuffle_order", "q_auto_salt_agg",
    "curation_embed_decontam", "curation_dataset_card", "curation_bitext_mine",
    "ml_influence_grad_dot", "ml_quality_filter_apply",
    "dedup_containment", "text_word_entropy", "embed_standardize",
    "embed_psi_drift", "ml_confusion_matrix", "ml_ndcg_eval",
    "mm_energy_segments", "q_cohort_retention",
    "mm_energy_segments_large", "mm_blockhash_large", "dedup_cdc_boundaries_large",
    "curation_pack_report",
    "text_quality_score", "text_langid", "text_lm_perplexity",
    "text_bigram_lift",
    "mm_av_align", "mm_blockhash_pairs", "mm_image_decode", "mm_wav_meta",
    "mm_video_frame_decode", "mm_image_resize", "q_asof_join_forward_tol",
    "q1_pricing_summary", "q_rollup_pricing", "q_set_ops",
    "q3_topk_revenue_join", "q5_region_nation_revenue",
    "q_salted_skew_agg", "q_bucketed_colocated_join",
    "q_partition_pruned_scan", "q_dpp_partition_join",
    "q_topk_by_agg", "q_range_join_binned",
    "q_scd2_history", "q_merge_upsert",
    "b12_section_concat")
    .filter(queries.contains)
}
