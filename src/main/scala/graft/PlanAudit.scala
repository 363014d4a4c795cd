package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for headline queries — the audit
  * loop for scan pruning (PushedFilters/ReadSchema), join strategy
  * (broadcast vs shuffle), and WholeStageCodegen coverage. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q20_top_revenue_orders",
        "q02_filter_prefix", "q11_broadcast_dim_join", "q07_dedup_first_seen",
        "q42_knn_brute", "q53_sessionize", "q54_asof_join", "q55_range_join",
        "q56_salted_join", "q60_contamination", "q63_dedup_clusters",
        "q65_rollup_revenue", "q78_repetition", "q79_budget_fill",
        "q80_pack_sequences", "q82_zorder_key", "q84_knn_join",
        "q100_pipeline_funnel", "q102_dup_spans", "q103_bm25",
        "q108_skew_profile", "q111_mrl_cascade", "q112_source_overlap",
        "q115_dsir_weights", "q116_bigram_nll", "q119_ppl_buckets",
        "q124_pagerank", "q125_column_profile", "q126_scd2_intervals",
        "q130_join_size_est", "q131_fuzzy_pairs", "q132_triangles",
        "q133_equidepth_hist", "q134_anomaly_hours",
        "q38_minhash_pairs", "q39_ngram_jaccard_pairs", "q140_frame_sample",
        "q202_kcore", "q209_components", "q210_modularity",
        "q212_split_leakage", "q213_lorenz", "q215_twonn_id")
    val spark = GraftSession.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    // PLAN_EXEC=1 executes each query first so the explain shows the
    // FINAL adaptive plan (AQE's runtime join-strategy and coalesce
    // decisions), not the pre-execution initial guess
    val exec = sys.env.get("PLAN_EXEC").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) df.collect()
      df.explain("formatted")
    }
    spark.stop()
  }
}
