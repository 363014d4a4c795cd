package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, ExprQueries, Maintenance, Relational,
  Similarity, Temporal, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY.md §2
  * (or a training-data-pipeline operator) expressed as a declarative
  * DataFrame pipeline; [[oracleSql]] carries the DuckDB-equivalent SQL
  * for hash-checked correctness. Queries whose hash functions have no
  * DuckDB mirror (xxhash64-based sketches) are declared without oracle
  * SQL and are covered by ScalaTest invariants instead.
  *
  * Each query ends in a deterministic ORDER BY so the dumped parquet is
  * reproducible row-for-row; the sorts are verification-harness
  * ordering, not part of the operator semantics (the underlying ops in
  * graft.ops are unsorted).
  */
object SparkEntry {

  /** Flagship pipeline on sf0.001 (driver smoke-checks rows > 0):
    * near-dup clustering (keep the canonical doc per cluster) ->
    * quality/language annotation -> quality gate -> contamination
    * screen (anti-join against benchmark 8-gram overlaps) ->
    * deterministic sample -> top-k. The reference's E2 dataflow shape
    * (scraper.py:154-275) composed from the training-data operators. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val canonical = Dedup.nearDupClusters(spark, d)
      .filter(col("doc_id") === col("cluster")) // cluster representative
      .select(col("doc_id"))
    val contaminated = Curation.contamination(spark, d)
      .select(col("doc_id"))
    Tables.documents(spark, d)
      .join(canonical, "doc_id")
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .withColumn("detected_lang", TextOps.langId(col("text")))
      .filter(col("quality") >= 0.3)
      // contaminated is corpus-proportional (per-doc overlap rows) —
      // no broadcast hint; stats/AQE pick the strategy at each scale
      .join(contaminated, Seq("doc_id"), "left_anti")
      .filter(Curation.hashKeep(col("doc_id"), lit("cc"))) // ~80% sample
      .select(col("doc_id"), col("lang"), col("detected_lang"),
        round(col("quality"), 4).as("quality"), col("n_chars"))
      .orderBy(col("quality").desc, col("doc_id"))
      .limit(20)
  }

  type Q = (SparkSession, String) => DataFrame

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map[String, Q](
    // ---- filters (F1-F7)
    "q02_filter_prefix" -> ((s, d) =>
      Relational.filterPrefix(s, d).orderBy("p_partkey")),
    "q03_filter_contains" -> ((s, d) =>
      Relational.filterContains(s, d).orderBy("o_orderkey")),
    "q04_filter_daterange" -> ((s, d) =>
      Relational.filterDateRange(s, d).orderBy("o_orderkey")),
    "q05_filter_validity" -> ((s, d) =>
      Relational.filterValidity(s, d).orderBy("event_type")),
    "q06_filter_exclusion" -> ((s, d) =>
      Relational.filterExclusion(s, d).orderBy("p_partkey")),
    // ---- dedup (D1-D2)
    "q07_dedup_first_seen" -> ((s, d) =>
      Relational.dedupFirstSeen(s, d).orderBy("user_id")),
    "q08_distinct" -> ((s, d) =>
      Relational.distinctSegments(s, d).orderBy("c_mktsegment", "c_nationkey")),
    // ---- joins / set ops (J1-J6, U1, X1)
    "q09_anti_join" -> ((s, d) =>
      Relational.antiJoin(s, d).orderBy("c_custkey")),
    "q10_semi_join" -> ((s, d) =>
      Relational.semiJoin(s, d).orderBy("c_custkey")),
    "q11_broadcast_dim_join" -> ((s, d) =>
      Relational.broadcastDimJoin(s, d).orderBy("r_name")),
    "q12_except" -> ((s, d) =>
      Relational.exceptCustkeys(s, d).orderBy("custkey")),
    "q13_union_distinct" -> ((s, d) =>
      Relational.unionDistinct(s, d).orderBy("custkey")),
    // ---- aggregations (A1-A7)
    "q01_pricing_summary" -> ((s, d) =>
      Relational.pricingSummary(s, d).orderBy("l_returnflag", "l_linestatus")),
    "q14_agg_counters" -> ((s, d) =>
      Relational.aggCounters(s, d).orderBy("user_id")),
    "q15_agg_conditional" -> ((s, d) =>
      Relational.aggConditional(s, d).orderBy("o_year")),
    "q16_collect_list" -> ((s, d) =>
      Relational.collectOrderkeys(s, d).orderBy("o_custkey")),
    "q21_agg_month_buckets" -> ((s, d) =>
      Relational.aggMonthBuckets(s, d).orderBy("o_month")),
    "q45_event_hour_buckets" -> ((s, d) =>
      Relational.eventHourBuckets(s, d).orderBy("hour_bucket")),
    "q46_running_total" -> ((s, d) =>
      Relational.runningTotal(s, d).orderBy("o_custkey", "o_orderkey")),
    "q47_event_gaps" -> ((s, d) =>
      Relational.eventGaps(s, d).orderBy("user_id", "event_id")),
    "q50_salted_agg" -> ((s, d) =>
      graft.ops.Skew.saltedSupplierAgg(s, d).orderBy("l_suppkey")),
    "q51_json_props" -> ((s, d) =>
      Relational.jsonProps(s, d).orderBy("event_type")),
    // ---- limits / sorts / top-k (L1-L5)
    "q17_top10_orders" -> ((s, d) => Relational.top10Orders(s, d)),
    "q18_filter_then_limit" -> ((s, d) => Relational.filterThenLimit(s, d)),
    "q19_topk_per_group" -> ((s, d) =>
      Relational.topkPerGroup(s, d).orderBy("o_custkey", "rnk")),
    // ---- multi-join analytics
    "q20_top_revenue_orders" -> ((s, d) => Relational.topRevenueOrders(s, d)),
    "q22_region_revenue" -> ((s, d) =>
      Relational.regionNationRevenue(s, d).orderBy("n_name")),
    // ---- expression library (P1-P23)
    "q23_url_extract" -> ((s, d) =>
      ExprQueries.urlExtract(s, d).orderBy("o_orderkey")),
    "q24_date_formats" -> ((s, d) =>
      ExprQueries.dateFormats(s, d).orderBy("o_orderkey")),
    "q25_danish_dates" -> ((s, d) =>
      ExprQueries.danishDates(s, d).orderBy("o_orderkey")),
    "q26_filenames" -> ((s, d) =>
      ExprQueries.filenames(s, d).orderBy("c_custkey")),
    "q27_url_functions" -> ((s, d) =>
      ExprQueries.urlFunctions(s, d).orderBy("n_nationkey")),
    "q28_text_cleanup" -> ((s, d) =>
      ExprQueries.textCleanup(s, d).orderBy("p_partkey")),
    "q29_base64" -> ((s, d) =>
      ExprQueries.base64Roundtrip(s, d).orderBy("s_suppkey")),
    "q30_safe_dates" -> ((s, d) =>
      ExprQueries.safeDates(s, d).orderBy("o_orderkey")),
    // ---- training-data pipeline: dedup
    "q31_dedup_exact" -> ((s, d) =>
      Dedup.exactDupGroups(s, d).orderBy("doc_id")),
    "q32_dedup_keep_first" -> ((s, d) =>
      Dedup.exactDedupKeepFirst(s, d).orderBy("doc_id")),
    // full near-dup pipelines (banded MinHash candidates + exact
    // Jaccard verify + threshold) re-declared on md5 arithmetic so the
    // gate hash-checks them; the xxhash64 pipelines stay API +
    // ScalaTest-covered in Dedup
    "q38_minhash_pairs" -> ((s, d) =>
      Curation.minhashVerifiedPairs(s, d).orderBy("id_a", "id_b")),
    "q39_ngram_jaccard_pairs" -> ((s, d) =>
      Curation.charJaccardVerifiedPairs(s, d).orderBy("id_a", "id_b")),
    // seeded md5 SimHash (domain "sh|"): the same sketch/pair shapes as
    // the xxhash64 originals (still API + ScalaTest-covered in Dedup),
    // re-declared on oracle-expressible md5 arithmetic so the gate
    // hash-checks them; q72/q86 pin the unseeded family
    "q40_simhash" -> ((s, d) =>
      Curation.simhashMd5(s, d, seed = "sh|").orderBy("doc_id")),
    "q48_simhash_pairs" -> ((s, d) =>
      Curation.simhashMd5Pairs(s, d, seed = "sh|")
        .orderBy("id_a", "id_b")),
    // ---- training-data pipeline: text analysis
    "q33_text_stats" -> ((s, d) =>
      TextOps.textStats(s, d).orderBy("doc_id")),
    "q34_lang_profile" -> ((s, d) =>
      TextOps.langProfile(s, d).orderBy("lang")),
    "q35_langid" -> ((s, d) =>
      TextOps.langIdQuery(s, d).orderBy("doc_id")),
    "q36_quality_gate" -> ((s, d) =>
      TextOps.qualityQuery(s, d).orderBy("doc_id")),
    // seeded md5 fingerprint (domain "fp1|"): normalize-then-hash,
    // re-declared on md5 arithmetic for a full hash-match (the
    // xxhash64 fingerprint stays API + ScalaTest-covered)
    "q41_fingerprint" -> ((s, d) =>
      TextOps.fingerprintMd5Query(s, d, seed = "fp1|").orderBy("doc_id")),
    "q49_token_budget" -> ((s, d) =>
      TextOps.tokenBudget(s, d).orderBy("source")),
    // ---- training-data pipeline: similarity
    "q37_embed_norms" -> ((s, d) =>
      Similarity.normsQuery(s, d).orderBy("vec_id")),
    "q42_knn_brute" -> ((s, d) => Similarity.knnBruteForce(s, d)),
    // md5-integer SRP / seeded-IVF re-declarations (the q38-q41 move
    // applied to vectors): same index/probe/verify plans, bucket and
    // list assignment in exact BIGINT arithmetic a DuckDB oracle
    // reproduces bit-for-bit. The Gaussian-plane LSH and the
    // KMeans-trained IVF stay API + ScalaTest covered (q90 pins the
    // multi-probe recall, q87 pins the trained probe exhaustive ==
    // brute force).
    "q43_ann_lsh" -> ((s, d) => Similarity.annLshMd5(s, d)),
    "q44_embed_near_dup" -> ((s, d) =>
      Similarity.cosineNearDupMd5Query(s, d).orderBy("id_a", "id_b")),
    "q52_ann_ivf" -> ((s, d) => Similarity.annIvfMd5(s, d)),
    // ---- temporal operators
    "q53_sessionize" -> ((s, d) =>
      Temporal.sessionize(s, d).orderBy("user_id", "session_start_us")),
    "q54_asof_join" -> ((s, d) =>
      Temporal.asofJoin(s, d).orderBy("event_id")),
    "q55_range_join" -> ((s, d) =>
      Temporal.rangeJoinWindows(s, d).orderBy("window_id")),
    "q56_salted_join" -> ((s, d) =>
      graft.ops.Skew.saltedSegmentAgg(s, d).orderBy("segment")),
    // ---- corpus curation
    "q57_stratified_sample" -> ((s, d) =>
      Curation.stratifiedSample(s, d).orderBy("doc_id")),
    "q58_normalize_text" -> ((s, d) =>
      Curation.normalizeQuery(s, d).orderBy("doc_id")),
    "q59_pii_redact" -> ((s, d) =>
      Curation.piiRedactQuery(s, d).orderBy("c_custkey")),
    "q60_contamination" -> ((s, d) =>
      Curation.contamination(s, d).orderBy("doc_id")),
    "q61_tfidf_top_term" -> ((s, d) =>
      Curation.tfidfTopTerm(s, d).orderBy("doc_id")),
    "q62_minhash_md5" -> ((s, d) =>
      Curation.minhashMd5(s, d).orderBy("doc_id")),
    "q63_dedup_clusters" -> ((s, d) =>
      Dedup.nearDupClusters(s, d).orderBy("doc_id")),
    "q64_token_quantiles" -> ((s, d) =>
      TextOps.tokenQuantiles(s, d).orderBy("source")),
    "q65_rollup_revenue" -> ((s, d) =>
      Relational.rollupRevenue(s, d).orderBy("o_year", "o_month")),
    "q66_pivot_status" -> ((s, d) =>
      Relational.pivotStatus(s, d).orderBy("o_year")),
    "q67_heavy_hitters" -> ((s, d) => TextOps.heavyHitters(s, d)),
    "q68_value_histogram" -> ((s, d) =>
      Relational.valueHistogram(s, d).orderBy("bucket")),
    "q69_snapshot_diff" -> ((s, d) =>
      Relational.snapshotDiffQuery(s, d).orderBy("o_orderkey")),
    "q70_moving_avg" -> ((s, d) =>
      Relational.movingAvgSpend(s, d).orderBy("o_custkey", "o_orderkey")),
    "q71_lsh_banded_pairs" -> ((s, d) =>
      Curation.bandedMd5Pairs(s, d).orderBy("id_a", "id_b")),
    "q72_simhash_md5" -> ((s, d) =>
      Curation.simhashMd5(s, d).orderBy("doc_id")),
    "q73_cube_status" -> ((s, d) =>
      Relational.cubeStatusRevenue(s, d).orderBy("status", "prio")),
    "q74_above_cust_avg" -> ((s, d) =>
      Relational.aboveCustomerAvg(s, d).orderBy("o_orderkey")),
    "q75_spend_ranks" -> ((s, d) =>
      Relational.orderSpendRanks(s, d).orderBy("o_orderkey")),
    "q76_doc_chunks" -> ((s, d) =>
      TextOps.chunkQuery(s, d).orderBy("doc_id", "chunk_id")),
    "q77_temperature_mix" -> ((s, d) =>
      Curation.temperatureSample(s, d).orderBy("doc_id")),
    "q78_repetition" -> ((s, d) =>
      TextOps.repetitionQuery(s, d).orderBy("doc_id")),
    "q79_budget_fill" -> ((s, d) =>
      Curation.budgetFill(s, d).orderBy("doc_id")),
    "q80_pack_sequences" -> ((s, d) =>
      Curation.packSequences(s, d).orderBy("source", "bin_id", "doc_id")),
    "q81_cluster_split" -> ((s, d) =>
      Dedup.clusterSplit(s, d).orderBy("doc_id")),
    "q82_zorder_key" -> ((s, d) =>
      Maintenance.zorderQuery(s, d).orderBy("l_orderkey", "l_linenumber")),
    "q83_keep_best" -> ((s, d) =>
      Dedup.keepBestInCluster(s, d).orderBy("cluster")),
    "q84_knn_join" -> ((s, d) =>
      Similarity.knnJoin(s, d).orderBy("q_id", "rank")),
    "q85_semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(s, d).orderBy("vec_id")),
    // ---- oracled twins of the sketch-join shapes (hash-match in DuckDB)
    "q86_simhash_md5_pairs" -> ((s, d) =>
      Curation.simhashMd5Pairs(s, d).orderBy("id_a", "id_b")),
    "q87_ann_ivf_exact" -> ((s, d) =>
      Similarity.annIvf(s, d, nprobe = 16)),
    "q88_cosine_pairs_exact" -> ((s, d) =>
      Similarity.cosinePairsExact(s, d).orderBy("id_a", "id_b")),
    // q89: annLsh through degenerate geometry — 1 plane per table, and
    // multi-probe flips that one bit, so BOTH buckets of the only table
    // are probed: the candidate set is provably the whole corpus and the
    // exact re-rank must equal brute force (the nprobe=nlist trick of
    // q87, applied to the LSH path — hash-matched, not rows-only)
    "q89_ann_lsh_exact" -> ((s, d) =>
      Similarity.annLsh(s, d, numPlanes = 1, tables = 1,
        multiProbe = true)),
    "q90_ann_recall" -> ((s, d) => Similarity.annRecallQuery(s, d)),
    // md5 twin of q41's normalize-then-fingerprint shape (hash-matched)
    "q91_fingerprint_md5" -> ((s, d) =>
      TextOps.fingerprintMd5Query(s, d).orderBy("doc_id")),
    // Count-Min sketch estimates for the exact top-20 terms: the md5
    // row hashes make every matrix cell DuckDB-reproducible, so CMS's
    // one-sided error (n_cms >= n_exact) is hash-checked end to end
    "q92_cms_estimate" -> ((s, d) =>
      graft.ops.Sketches.cmsEstimateQuery(s, d)),
    // Bloom-pruned anti join vs the PLAIN anti join oracle: pruning
    // must be invisible in the result
    "q93_bloom_anti" -> ((s, d) =>
      Relational.bloomAntiNeverBulkShipped(s, d).orderBy("p_partkey")),
    // HLL++ distinct vs exact: the oracle pins the rounded ratio to
    // 1.0, hash-checking the sketch's accuracy bound
    "q94_hll_distinct" -> ((s, d) =>
      graft.ops.Sketches.hllDistinctQuery(s, d)),
    // A-ES weighted sampling without replacement: priorities are pure
    // md5 arithmetic, so the selected per-stratum set hash-matches the
    // DuckDB mirror exactly
    "q95_weighted_sample" -> ((s, d) =>
      graft.ops.Curation.weightedSample(s, d)),
    // PQ ANN with a corpus-covering refine budget: encode + ADC scan +
    // exact re-rank must reproduce brute force exactly (q87/q89 role)
    "q96_ann_pq_exact" -> ((s, d) =>
      graft.ops.Pq.annPq(s, d, refineFactor = 100000)),
    // golden-value oracle (q90 pattern): recall@10 of the production
    // PQ operating point is a deterministic 0.9 at both gate SFs
    "q97_ann_pq_recall" -> ((s, d) =>
      graft.ops.Pq.annPqRecallQuery(s, d)),
    // SQ8 int8 quantization: pure min-max arithmetic, so every code
    // cell hash-matches the DuckDB mirror
    "q98_sq8_codes" -> ((s, d) => graft.ops.Pq.sq8Codes(s, d)),
    // per-source quota cap on a deterministic md5 draw; the kept set
    // hash-matches the DuckDB mirror exactly
    "q99_domain_cap" -> ((s, d) =>
      graft.ops.Curation.domainCap(s, d, cap = 15)),
    // end-to-end funnel: quality gate -> sha256 keep-first -> md5
    // domain cap, the whole DAG hash-matched stage-composed
    "q100_pipeline_funnel" -> ((s, d) =>
      graft.ops.Curation.pipelineFunnel(s, d, cap = 10)),
    // per-stage survivor counts for the same funnel
    "q101_funnel_counts" -> ((s, d) =>
      graft.ops.Curation.funnelCounts(s, d, cap = 10)),
    // exact substring-dedup signal: per-doc duplicated 8-gram
    // positions and span-union token coverage
    "q102_dup_spans" -> ((s, d) =>
      graft.ops.Curation.dupSpans(s, d, k = 8)),
    // BM25 top-20 for a literal query; fixed-order float arithmetic
    // so the rounded scores hash-match
    "q103_bm25" -> ((s, d) => graft.ops.Retrieval.bm25TopK(s, d)),
    // inverted index with full df and a capped ordered postings string
    "q104_inverted_index" -> ((s, d) =>
      graft.ops.Retrieval.invertedIndex(s, d, maxPostings = 25)),
    // the removal transform for q102: duplicated spans dropped, text
    // rebuilt in token order, byte-identical to the DuckDB rebuild
    "q105_substring_dedup" -> ((s, d) =>
      graft.ops.Curation.dedupSubstrings(s, d, k = 8)),
    // corpus-unigram mean NLL per doc, summed in token-position order
    // so the doubles hash-match
    "q106_unigram_nll" -> ((s, d) => graft.ops.TextOps.unigramNll(s, d)),
    // top adjacent-pair frequencies: the first BPE merge round
    "q107_bpe_pairs" -> ((s, d) =>
      graft.ops.TextOps.bpePairMining(s, d, topK = 20)),
    // join-key skew order statistics with exact rank-based percentiles
    "q108_skew_profile" -> ((s, d) => graft.ops.Skew.skewProfile(s, d)),
    // prefix-vs-full recall as an exact set intersection
    "q109_mrl_recall" -> ((s, d) =>
      Similarity.mrlRecallQuery(s, d, dims = 16, k = 10)),
    // Matryoshka 16-dim prefix cosine top-10, oracled exactly
    "q110_mrl_prefix_knn" -> ((s, d) =>
      Similarity.mrlPrefixTopK(s, d, dims = 16)),
    // prefix-candidates -> full-cosine rerank, oracled end-to-end
    "q111_mrl_cascade" -> ((s, d) =>
      Similarity.mrlCascadeTopK(s, d, dims = 16, candidates = 50)),
    // pairwise source-vocabulary Jaccard (mirror-domain diagnostic)
    "q112_source_overlap" -> ((s, d) =>
      graft.ops.Curation.sourceOverlap(s, d)),
    // minimum-variance stratified budget split, Hamilton-rounded
    "q113_neyman_alloc" -> ((s, d) =>
      graft.ops.Curation.neymanAllocation(s, d, budget = 1000)),
    // UniMax water-filling: equal shares, epoch-capped per language
    "q114_unimax_alloc" -> ((s, d) =>
      graft.ops.Curation.unimaxAllocation(s, d,
        budget = 250000L, epochCap = 2)),
    // DSIR hashed-bigram importance log-weights vs the en target slice
    "q115_dsir_weights" -> ((s, d) =>
      graft.ops.Curation.dsirWeights(s, d, buckets = 256)),
    // CCNet-style quality: bigram LM backed off to unigrams
    "q116_bigram_nll" -> ((s, d) => graft.ops.TextOps.bigramNll(s, d)),
    // Zipf rank-frequency OLS fit over the top-500 terms
    "q117_zipf_fit" -> ((s, d) => graft.ops.TextOps.zipfFit(s, d, 500)),
    // top collocations by PMI, ranked on the raw probability ratio
    "q118_pmi_collocations" -> ((s, d) =>
      graft.ops.TextOps.pmiCollocations(s, d, topK = 20, minCount = 5)),
    // CCNet head/middle/tail from md5-sampled rank cutoffs
    "q119_ppl_buckets" -> ((s, d) =>
      graft.ops.Curation.perplexityBuckets(s, d)),
    // ordered funnel signup->view->click->purchase, strict succession
    "q120_funnel_steps" -> ((s, d) =>
      graft.ops.EventAnalytics.funnel(s, d)),
    // KMV distinct sketch vs exact per event_type
    "q121_kmv_distinct" -> ((s, d) =>
      graft.ops.EventAnalytics.kmvDistinct(s, d, k = 32)),
    // top event-type trigrams across user journeys
    "q122_event_trigrams" -> ((s, d) =>
      graft.ops.EventAnalytics.eventTrigrams(s, d, topK = 10)),
    // first-seen cohorts x day offset activity matrix
    "q123_retention" -> ((s, d) =>
      graft.ops.EventAnalytics.retentionCohorts(s, d)),
    // exact scaled-BIGINT PageRank over the customer-supplier graph
    "q124_pagerank" -> ((s, d) =>
      graft.ops.Graph.pageRank(s, d, iters = 5, k = 20)),
    // ANALYZE-style one-pass column statistics for lineitem
    "q125_column_profile" -> ((s, d) =>
      graft.ops.Profiling.columnProfile(s, d)),
    // SCD2 change-history intervals from the event stream
    "q126_scd2_intervals" -> ((s, d) =>
      graft.ops.Temporal.scd2Intervals(s, d)
        .orderBy("user_id", "version")),
    // order-scoped part-pair co-occurrence (market basket)
    "q127_basket_pairs" -> ((s, d) =>
      graft.ops.Graph.basketPairs(s, d, k = 20)),
    // per-rule Gopher quality table (rule columns, not a composite)
    "q128_gopher_rules" -> ((s, d) =>
      graft.ops.TextOps.gopherRules(s, d).orderBy("doc_id")),
    // trade-graph degree histogram (the pre-PageRank skew diagnostic)
    "q129_degree_profile" -> ((s, d) =>
      graft.ops.Graph.degreeProfile(s, d)),
    // exact self-join cardinality estimate per candidate key
    "q130_join_size_est" -> ((s, d) =>
      graft.ops.Profiling.joinSizeEstimate(s, d)),
    // blocked fuzzy name matching (levenshtein within blocks)
    "q131_fuzzy_pairs" -> ((s, d) =>
      graft.ops.Linkage.fuzzyNamePairs(s, d, maxDist = 2, k = 50)),
    // degree-oriented triangle count on the support-thresholded
    // co-purchase graph
    "q132_triangles" -> ((s, d) =>
      graft.ops.Graph.triangleCount(s, d, minSupport = 7)),
    // exact equi-depth histogram without a global-sort window
    "q133_equidepth_hist" -> ((s, d) =>
      graft.ops.Profiling.equiDepthHistogram(s, d, buckets = 10)),
    // 3-sigma hourly volume anomalies in cleared-denominator BIGINTs
    "q134_anomaly_hours" -> ((s, d) =>
      graft.ops.EventAnalytics.hourlyAnomalies(s, d)),
    // chi-square independence of (lang, source), ordered cell fold
    "q135_chi2_independence" -> ((s, d) =>
      graft.ops.Profiling.chiSquareIndependence(s, d)),
    // signup->purchase latency, exact rank-at-ceil percentiles
    "q136_conversion_latency" -> ((s, d) =>
      graft.ops.EventAnalytics.conversionLatency(s, d)),
    // EWMA level per event type, ordered fold at alpha=0.25
    "q137_ewma_level" -> ((s, d) =>
      graft.ops.EventAnalytics.ewmaLevel(s, d)),
    // winnowing fingerprint selection (MOSS sketch), k=3 w=4
    "q138_winnowing" -> ((s, d) =>
      graft.ops.TextOps.winnowingFingerprints(s, d, k = 3, w = 4)
        .orderBy("doc_id")),
    // winnowing near-dup candidates over capped fingerprint buckets
    "q139_winnowing_pairs" -> ((s, d) =>
      graft.ops.TextOps.winnowingNearDupPairs(s, d)
        .orderBy("doc_a", "doc_b")),
    // multimodal frame sampling: the explode-based plumbing over the
    // synthetic media table, whose video geometry derives
    // arithmetically from doc_id — so the one multimodal operator with
    // DuckDB-expressible output is hash-checked end to end (the codec
    // paths stay ScalaTest-covered; DuckDB cannot decode PNGs)
    "q140_frame_sample" -> ((s, d) =>
      graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.syntheticMediaTable(s, d))
        .select(col("media_id"), col("ts_ms"), col("frame_idx"))
        .orderBy("media_id", "ts_ms")),
    // single-source BFS over the trade graph: min hop distance within
    // 4 hops — the k-hop traversal primitive beside the rank (q124)
    // and component (q63) operators; oracled by a recursive CTE
    "q141_bfs_hops" -> ((s, d) => graft.ops.Graph.bfsHops(s, d)),
    // Bellman-Ford cheapest-route cost (weight = 1e6 DIV tie support,
    // exact integer min-plus) — the weighted complement of q141,
    // oracled by an unrolled CTE chain like PageRank
    "q142_sssp_cost" -> ((s, d) => graft.ops.Graph.ssspCost(s, d)),
    // personalized PageRank: restart mass pinned to customer 1 — the
    // graph-recommendation primitive, sparse exact-BIGINT iteration
    "q143_ppr" -> ((s, d) => graft.ops.Graph.personalizedPageRank(s, d)),
    // per-doc marginal-contribution score over word trigrams (first-
    // appearance fraction) — the grade-don't-delete curation dual of
    // the q102/q105 removal operators
    "q144_novelty" -> ((s, d) => graft.ops.TextOps.noveltyScore(s, d)),
    // character-distribution Shannon entropy (nats): the low-entropy
    // boilerplate/garbage detector, alphabet-bounded per-doc state
    "q145_char_entropy" -> ((s, d) => graft.ops.TextOps.charEntropy(s, d)),
    // per-type OLS trend of the hourly count series: slope/intercept
    // from exact BIGINT sufficient statistics, one double division
    "q146_trend_slope" -> ((s, d) =>
      graft.ops.EventAnalytics.trendSlope(s, d)),
    // global clustering coefficient: 3·triangles / degree-sum wedges
    // on the same memoized thresholded co-purchase graph as q132
    "q147_clustering_coef" -> ((s, d) =>
      graft.ops.Graph.clusteringCoefficient(s, d)),
    // link prediction: top supplier pairs by neighborhood Jaccard
    "q148_node_jaccard" -> ((s, d) => graft.ops.Graph.nodeJaccard(s, d)),
    // Adamic-Adar: the degree-weighted link-prediction twin of q148
    "q149_adamic_adar" -> ((s, d) => graft.ops.Graph.adamicAdar(s, d)),
    // PSI drift of each type's hour-of-day profile, early vs late half
    "q150_psi_drift" -> ((s, d) => graft.ops.EventAnalytics.psiDrift(s, d)),
    // exact two-sample KS between even/odd order-price cohorts,
    // integer cross-multiplied ECDFs via the q133 sub-bucket device
    "q151_ks_test" -> ((s, d) => graft.ops.Profiling.ksTest(s, d)),
    // Heaps'-law vocabulary-growth exponent: OLS of ln(cum types) vs
    // ln(cum tokens) at every 10th doc, subsplit cumsums, q106 folds
    "q152_heaps_fit" -> ((s, d) => graft.ops.TextOps.heapsFit(s, d)),
    // gap-based sessionization (30 min) rolled up to the session-
    // length distribution; one user_id shuffle end-to-end
    "q153_sessions" -> ((s, d) =>
      graft.ops.EventAnalytics.sessionLengths(s, d)),
    // first-order Markov transition matrix over event types
    "q154_transitions" -> ((s, d) =>
      graft.ops.EventAnalytics.eventTransitions(s, d)),
    // lag-1 autocorrelation of densified hourly counts per type
    "q155_autocorr" -> ((s, d) =>
      graft.ops.EventAnalytics.lag1Autocorr(s, d)),
    // Gini spend concentration via the scalable two-level rank
    "q156_gini" -> ((s, d) => graft.ops.Profiling.giniSpend(s, d)),
    // Benford leading-digit profile of order totals
    "q157_benford" -> ((s, d) => graft.ops.Profiling.benfordDigits(s, d)),
    // exact Mann-Whitney U / AUC, URGENT vs LOW order totals
    "q158_mann_whitney" -> ((s, d) =>
      graft.ops.Profiling.mannWhitney(s, d)),
    // RFM quintile grid from partitioned ranks + exact ntile math
    "q159_rfm" -> ((s, d) => graft.ops.Profiling.rfmSegments(s, d)),
    // mutual information lang x source, chi2's (q135) info sibling
    "q160_mutual_info" -> ((s, d) =>
      graft.ops.Profiling.mutualInformation(s, d)),
    // Deequ-style constraint suite: PK/FK/null/domain checks
    "q161_constraints" -> ((s, d) =>
      graft.ops.Maintenance.constraintChecks(s, d)),
    // daily new-user counts + cumulative adoption curve
    "q162_user_growth" -> ((s, d) =>
      graft.ops.EventAnalytics.userGrowth(s, d)),
    // one-pass pairwise Pearson matrix over lineitem numerics
    "q163_corr_matrix" -> ((s, d) => graft.ops.Profiling.corrMatrix(s, d)),
    // deterministic bottom-k quantile sample, estimate beside exact
    "q164_quantile_sketch" -> ((s, d) =>
      graft.ops.Sketches.quantileSketch(s, d)),
    // Jensen-Shannon divergence between two sources' unigram dists
    "q165_jsd" -> ((s, d) => graft.ops.TextOps.jsDivergence(s, d)),
    // robust mean: clip order totals at exact [p05, p95] ranks
    "q166_winsorized" -> ((s, d) =>
      graft.ops.Profiling.winsorizedMean(s, d)),
    // tie-aware Spearman rho, qty vs price, doubled integer ranks
    "q167_spearman" -> ((s, d) => graft.ops.Profiling.spearman(s, d)),
    // Cramér's V effect size on the q135 contingency table
    "q168_cramers_v" -> ((s, d) => graft.ops.Profiling.cramersV(s, d)),
    // robust scale: median, MAD, integer 3-MAD outlier fence
    "q169_mad_outliers" -> ((s, d) =>
      graft.ops.Profiling.madOutliers(s, d)),
    // Cohen's d effect size, URGENT vs LOW totals (q158's companion)
    "q170_cohens_d" -> ((s, d) => graft.ops.Profiling.cohensD(s, d)),
    // deterministic md5-coin subsampling bootstrap CI for the mean
    "q171_bootstrap_ci" -> ((s, d) =>
      graft.ops.Profiling.bootstrapCi(s, d)),
    // Welch's unequal-variance t with Welch-Satterthwaite df
    "q172_welch_t" -> ((s, d) => graft.ops.Profiling.welchT(s, d)),
    // per-priority order-total deciles, grouped two-level ranks
    "q173_grouped_hist" -> ((s, d) =>
      graft.ops.Profiling.groupedEquiDepth(s, d)),
    // DAU / 7-day WAU / stickiness via bounded user-day fan-out
    "q174_dau_wau" -> ((s, d) => graft.ops.EventAnalytics.dauWau(s, d)),
    // week-over-week revenue growth off the weeks marginal
    "q175_wow_revenue" -> ((s, d) =>
      graft.ops.Temporal.weeklyRevenueGrowth(s, d)),
    // cohort LTV: buyers + cumulative revenue per (cohort, offset)
    "q176_ltv_cohorts" -> ((s, d) =>
      graft.ops.Relational.ltvCohorts(s, d)),
    // HHI supplier-revenue concentration per nation
    "q177_supplier_hhi" -> ((s, d) =>
      graft.ops.Relational.supplierHhi(s, d)),
    // q120's funnel with a 24h conversion deadline per stage
    "q178_windowed_funnel" -> ((s, d) =>
      graft.ops.EventAnalytics.windowedFunnel(s, d)),
    // SQ8 reconstruction cosine fidelity (q98's quality report)
    "q179_sq8_fidelity" -> ((s, d) => graft.ops.Pq.sq8Fidelity(s, d)),
    // per-class precision/recall/F1 of the q35 langId heuristic
    "q180_langid_eval" -> ((s, d) => graft.ops.TextOps.langIdEval(s, d)),
    // Wilson 95% CI on each funnel step's conversion rate
    "q181_funnel_wilson" -> ((s, d) =>
      graft.ops.EventAnalytics.funnelWilson(s, d)),
    // reorder cadence: inter-order gap-day rank percentiles
    "q182_order_gaps" -> ((s, d) =>
      graft.ops.Temporal.interOrderGaps(s, d)),
    // per-type argmax hour-of-day with volume share
    "q183_peak_hours" -> ((s, d) =>
      graft.ops.EventAnalytics.peakHours(s, d)),
    // Fightin' Words: Dirichlet log-odds distinctive terms per source
    "q184_log_odds" -> ((s, d) => graft.ops.TextOps.logOddsTerms(s, d)),
    // curation curve: tokens per quality decile, integer-keyed ranks
    "q185_quality_curve" -> ((s, d) =>
      graft.ops.TextOps.qualityTokenCurve(s, d)),
    // dedup telemetry: exact-dup rate by arrival bucket
    "q186_dup_rate" -> ((s, d) =>
      graft.ops.TextOps.dupRateOverTime(s, d)),
    // tokenizer fertility (pieces per word) per language
    "q187_fertility" -> ((s, d) =>
      graft.ops.TextOps.tokenizerFertility(s, d)),
    // identical texts filed under multiple languages
    "q188_lang_conflicts" -> ((s, d) =>
      graft.ops.TextOps.langConflicts(s, d)),
    // vocab size / hapax fraction / TTR per source
    "q189_vocab_profile" -> ((s, d) =>
      graft.ops.TextOps.vocabProfile(s, d)),
    // per-label centroid cohesion over embeddings, integer-exact
    "q190_label_cohesion" -> ((s, d) =>
      graft.ops.Pq.labelCohesion(s, d)),
    // Pareto headline: top-20% / top-1% customer revenue shares
    "q191_pareto" -> ((s, d) => graft.ops.Profiling.paretoShare(s, d)),
    // order->ship gap percentiles per priority (SLA report)
    "q192_ship_latency" -> ((s, d) =>
      graft.ops.Temporal.shipLatency(s, d)),
    // TPC-H Q8 shape: national revenue share per order year
    "q193_market_share" -> ((s, d) =>
      graft.ops.Relational.nationMarketShare(s, d)),
    // TPC-H Q5 shape: local-supplier revenue per EUROPE nation
    "q194_local_rev" -> ((s, d) =>
      graft.ops.Relational.localSupplierRevenue(s, d)),
    // TPC-H Q10 shape: top-20 customers by returned revenue
    "q195_top_returners" -> ((s, d) =>
      graft.ops.Relational.topReturners(s, d)),
    // R-squared honesty column for the q146 trend fit
    "q196_trend_r2" -> ((s, d) => graft.ops.EventAnalytics.trendR2(s, d)),
    // quality x length decile grid: is quality secretly length?
    "q197_quality_length" -> ((s, d) =>
      graft.ops.TextOps.qualityLengthGrid(s, d)),
    // exact-dup cluster-size histogram (keep-first vs keep-best call)
    "q198_cluster_sizes" -> ((s, d) =>
      graft.ops.TextOps.dupClusterSizes(s, d)),
    // priority mix share per 30-day bucket (mix-shift monitor)
    "q199_priority_mix" -> ((s, d) =>
      graft.ops.Temporal.priorityMixByMonth(s, d)),
    // the corpus datasheet: docs/tokens/dups/mean quality in one row
    "q200_corpus_card" -> ((s, d) => graft.ops.TextOps.corpusCard(s, d)),
    // degree-degree Pearson over the co-purchase adjacency
    "q201_assortativity" -> ((s, d) => graft.ops.Graph.assortativity(s, d)),
    // fixed-round k-core peeling census
    "q202_kcore" -> ((s, d) => graft.ops.Graph.kCore(s, d)),
    // per-node clustering coefficient top-k (closed wedges per vertex)
    "q203_local_cc" -> ((s, d) => graft.ops.Graph.localClustering(s, d)),
    // bounded-radius harmonic centrality of one source
    "q204_harmonic" -> ((s, d) =>
      graft.ops.Graph.harmonicCentrality(s, d)),
    // k-anonymity release gate over the (nation, segment) QI
    "q205_k_anonymity" -> ((s, d) => graft.ops.Curation.kAnonymity(s, d)),
    // l-diversity of the sensitive balance bucket within QI groups
    "q206_l_diversity" -> ((s, d) => graft.ops.Curation.lDiversity(s, d)),
    // Flesch-style readability decade-band census
    "q207_readability" -> ((s, d) =>
      graft.ops.TextOps.readabilityBands(s, d)),
    // reproducible md5-nibble train/val/test split manifest
    "q208_split_manifest" -> ((s, d) =>
      graft.ops.Curation.splitManifest(s, d)),
    // connected-component size census via min-label propagation
    "q209_components" -> ((s, d) => graft.ops.Graph.components(s, d)),
    // nation-partition modularity of the co-purchase graph
    "q210_modularity" -> ((s, d) => graft.ops.Graph.modularity(s, d)),
    // rich-club edge density among nodes above each degree threshold
    "q211_rich_club" -> ((s, d) => graft.ops.Graph.richClub(s, d)),
    // near-dup pairs crossing the train/val/test boundary (contamination)
    "q212_split_leakage" -> ((s, d) =>
      graft.ops.Curation.splitLeakage(s, d)),
    // Lorenz curve at decile resolution (the curve behind q156's Gini)
    "q213_lorenz" -> ((s, d) => graft.ops.Profiling.lorenzDeciles(s, d)),
    // Theil-T inequality with between/within-nation decomposition
    "q214_theil" -> ((s, d) => graft.ops.Profiling.theilIndex(s, d)),
    // TwoNN intrinsic dimension of the embedding manifold
    "q215_twonn_id" -> ((s, d) =>
      graft.ops.Similarity.twoNnDimension(s, d)),
    // Fano-factor burstiness of the densified hourly event series
    "q216_fano" -> ((s, d) =>
      graft.ops.EventAnalytics.fanoBurstiness(s, d)),
    // k-occurrence hubness histogram of the embedding kNN graph
    "q217_hubness" -> ((s, d) => graft.ops.Similarity.knnHubness(s, d)),
    // TPC-H Q3 shape: unshipped revenue top-k for one market segment
    "q218_tpch_q3" -> ((s, d) =>
      graft.ops.Relational.shippingPriority(s, d)),
    // TPC-H Q7 shape: bilateral nation trade volume by role and year
    "q219_tpch_q7" -> ((s, d) =>
      graft.ops.Relational.bilateralVolume(s, d)),
    // CSN power-law MLE over the trade-graph degree tail
    "q220_powerlaw" -> ((s, d) => graft.ops.Graph.degreePowerLaw(s, d)),
    // undamped power-iteration eigenvector centrality
    "q221_eigenvector" -> ((s, d) =>
      graft.ops.Graph.eigenvectorCentrality(s, d)),
    // Atkinson welfare inequality index at epsilon = 1
    "q222_atkinson" -> ((s, d) => graft.ops.Profiling.atkinsonIndex(s, d)),
    // butterfly (C4) census of the bipartite trade graph
    "q223_butterflies" -> ((s, d) =>
      graft.ops.Graph.butterflyCensus(s, d)),
    // tie-strength-weighted PageRank (mass splits by shared orders)
    "q224_weighted_pagerank" -> ((s, d) =>
      graft.ops.Graph.weightedPageRank(s, d)),
    // fixed-round 3-truss peel (edge-cohesion census)
    "q225_ktruss" -> ((s, d) => graft.ops.Graph.kTruss(s, d)),
    // HITS hubs/authorities on the directed bipartite trade graph
    "q226_hits" -> ((s, d) => graft.ops.Graph.hitsScores(s, d)),
    // sync label-propagation community size census (deterministic LPA)
    "q227_lpa" -> ((s, d) => graft.ops.Graph.lpaCommunities(s, d)),
    // preferential-attachment + resource-allocation link prediction
    "q228_linkpred_pa_ra" -> ((s, d) =>
      graft.ops.Graph.linkPredPaRa(s, d)),
    // contrastive hard negatives: top-k cross-label cosine neighbors
    "q229_hard_negatives" -> ((s, d) =>
      graft.ops.Similarity.hardNegatives(s, d)),
    // Kneser-Ney smoothed probabilities for the top bigrams
    "q230_kneser_ney" -> ((s, d) =>
      graft.ops.TextOps.kneserNeyBigrams(s, d)),
    // KMV sketch Jaccard between source vocabularies (vs exact)
    "q231_kmv_jaccard" -> ((s, d) =>
      graft.ops.Sketches.kmvSourceJaccard(s, d)),
    // TPC-H Q13 shape: order-count distribution incl. the 0-bucket
    "q232_tpch_q13" -> ((s, d) =>
      graft.ops.Relational.orderCountDistribution(s, d)),
    // TPC-H Q18 shape: large-volume orders over the quantity HAVING
    "q233_tpch_q18" -> ((s, d) =>
      graft.ops.Relational.largeVolumeOrders(s, d)),
    // TPC-H Q21 shape: sole late supplier (semi + anti correlation)
    "q234_tpch_q21" -> ((s, d) =>
      graft.ops.Relational.soleLateSupplier(s, d)),
    // TPC-H Q22 shape: dormant high-balance customers per nation
    "q235_tpch_q22" -> ((s, d) =>
      graft.ops.Relational.dormantHighBalance(s, d)),
    // containment near-dups (short-doc-inside-long-doc, capped grams)
    "q236_containment" -> ((s, d) =>
      graft.ops.Curation.containmentPairs(s, d)),
    // tokenizer vocab coverage curve (two-level rank, no global sort)
    "q237_vocab_coverage" -> ((s, d) =>
      graft.ops.TextOps.vocabCoverage(s, d)),
    // inter-centroid cosine matrix (label separability)
    "q238_centroid_dist" -> ((s, d) =>
      graft.ops.Pq.centroidDistances(s, d)),
    // MMR diversified retrieval (relevance minus redundancy greedy)
    "q239_mmr" -> ((s, d) => graft.ops.Similarity.mmrTopK(s, d)),
    // Johnson-Lindenstrauss +-1 projection distortion audit
    "q240_jl_distortion" -> ((s, d) =>
      graft.ops.Similarity.jlDistortion(s, d)),
    // event-time out-of-orderness census (watermark sizing)
    "q241_out_of_order" -> ((s, d) =>
      graft.ops.EventAnalytics.outOfOrderCensus(s, d)),
    // graph diameter lower bound by BFS double sweep
    "q242_diameter" -> ((s, d) => graft.ops.Graph.diameterSweep(s, d)),
    // partition-pruning ROI audit: natural vs date-clustered layout
    "q243_pruning_audit" -> ((s, d) =>
      graft.ops.Maintenance.pruningAudit(s, d)),
    // data-constrained epoch water-filling across sources
    "q244_epoch_waterfill" -> ((s, d) =>
      graft.ops.Curation.epochWaterfill(s, d)),
    // Efraimidis-Spirakis weighted sample without replacement
    "q245_priority_sample" -> ((s, d) =>
      graft.ops.Curation.prioritySample(s, d)),
    // containment-cluster size census (components over q236 pairs)
    "q246_containment_clusters" -> ((s, d) =>
      graft.ops.Curation.containmentClusters(s, d)),
    // dedup ROI: pairs/docs/chars removed per Jaccard threshold
    "q247_dedup_roi" -> ((s, d) =>
      graft.ops.Curation.dedupRoiCurve(s, d)),
    // TPC-H Q4 shape: priority classes with at least one late line
    "q248_tpch_q4" -> ((s, d) =>
      graft.ops.Relational.priorityLateOrders(s, d)),
    // within-label scatter (covariance trace per label)
    "q249_label_scatter" -> ((s, d) =>
      graft.ops.Pq.withinLabelScatter(s, d)),
    // SimHash-vs-Jaccard calibration (pick the Hamming cutoff)
    "q250_simhash_calibration" -> ((s, d) =>
      graft.ops.Curation.simhashCalibration(s, d)),
    // TPC-H Q2 shape: min-cost supplier (aggregate-argmin join-back)
    "q251_tpch_q2" -> ((s, d) =>
      graft.ops.Relational.minCostSupplier(s, d)),
    // TPC-H Q6 shape: forecast revenue change (pure pushdown scan)
    "q252_tpch_q6" -> ((s, d) =>
      graft.ops.Relational.forecastRevenueChange(s, d)),
    // TPC-H Q8 shape: national market share by order year
    "q253_tpch_q8" -> ((s, d) =>
      graft.ops.Relational.marketShare(s, d)),
    // quarterly return-rate drift by customer nation
    "q254_return_rate" -> ((s, d) =>
      graft.ops.Relational.returnRateByNation(s, d)),
    // TPC-H Q11 shape: important parts (HAVING over global scalar)
    "q255_tpch_q11" -> ((s, d) =>
      graft.ops.Relational.importantParts(s, d)),
    // TPC-H Q14 shape: promo revenue share (conditional aggregate)
    "q256_tpch_q14" -> ((s, d) =>
      graft.ops.Relational.promoRevenueShare(s, d)),
    // TPC-H Q15 shape: top supplier (scalar-max equality join)
    "q257_tpch_q15" -> ((s, d) =>
      graft.ops.Relational.topSupplier(s, d)),
    // TPC-H Q16 shape: supplier diversity census with exclusions
    "q258_tpch_q16" -> ((s, d) =>
      graft.ops.Relational.supplierClassCensus(s, d)),
    // TPC-H Q17 shape: small-quantity revenue (correlated per-part avg)
    "q259_tpch_q17" -> ((s, d) =>
      graft.ops.Relational.smallQuantityRevenue(s, d)),
    // TPC-H Q19 shape: disjunctive brand/size/quantity predicates
    "q260_tpch_q19" -> ((s, d) =>
      graft.ops.Relational.disjunctiveRevenue(s, d)),
    // TPC-H Q20 shape: big shippers of a part family (nested semi)
    "q261_tpch_q20" -> ((s, d) =>
      graft.ops.Relational.bigShipperSuppliers(s, d)),
    // hashed-feature linear classifier score histogram
    "q262_classifier_hist" -> ((s, d) =>
      graft.ops.TextOps.classifierScoreHistogram(s, d)),
    // train/val split unigram KL divergence (split drift gate)
    "q263_split_kl" -> ((s, d) =>
      graft.ops.TextOps.splitKlDivergence(s, d)),
    // TPC-H Q9 shape: product-line profit by nation and year
    "q264_tpch_q9" -> ((s, d) =>
      graft.ops.Relational.productProfit(s, d)),
    // TPC-H Q12 shape: late-shipment priority census
    "q265_tpch_q12" -> ((s, d) =>
      graft.ops.Relational.lateShipmentCensus(s, d)),
    // per-type value skewness / excess kurtosis (one-pass power sums)
    "q266_value_moments" -> ((s, d) =>
      graft.ops.Profiling.valueMoments(s, d)),
    // basket association rules (support / confidence / lift)
    "q267_basket_rules" -> ((s, d) =>
      graft.ops.Graph.basketRules(s, d)),
    // hybrid retrieval: reciprocal-rank fusion of BM25 + cosine
    "q268_rrf_fusion" -> ((s, d) =>
      graft.ops.Retrieval.rrfFusion(s, d)),
  )

  /** Shared decimal-sum fragment (see Relational.dsum). The scale-4
    * inner cast is load-bearing beyond determinism: DuckDB's
    * decimal->double cast goes through hugeint units and loses an ulp
    * once sum*10^scale exceeds 2^53 (observed at sf0.1 with a scale-8
    * product sum: ...0862 became ...086201), while a scale-4 sum stays
    * exactly convertible on both engines well past any gate SF. Apply
    * it to PRODUCTS too (dsumSql(discPriceSql)), never a bare
    * CAST(SUM(product) AS DOUBLE). */
  private def dsumSql(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"

  private val discPriceSql: String =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * " +
      "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  /** Generated CTE chain for the 60-bit md5 SimHash sketch, ending in
    * `sk(doc_id, simhash60)` — shared by the q72/q40 sketch oracles and
    * the q86/q48 pigeonhole pair-join oracles. `seed` mirrors
    * [[graft.ops.Curation.simhashMd5]]'s domain separation. */
  private def simhash60Ctes(seed: String = ""): String =
    s"""toks AS (SELECT doc_id, md5('$seed' || t) AS h FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents)),
      |votes AS (SELECT doc_id,
      |""".stripMargin +
      (0 until 60).map { j =>
        val nib = s"substr(h, ${1 + j / 4}, 1)"
        s"  SUM(CASE WHEN (((ascii($nib) - CASE WHEN $nib <= '9' " +
          s"THEN 48 ELSE 87 END) >> ${j % 4}) & 1) = 1 " +
          s"THEN 1 ELSE -1 END) AS v$j"
      }.mkString(",\n") +
      "\nFROM toks GROUP BY doc_id),\nsk AS (SELECT doc_id, CAST(" +
      (0 until 60).map(j =>
        s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ") +
      " AS BIGINT) AS simhash60 FROM votes)"

  /** Pigeonhole Hamming pair-join oracle over the 60-bit md5 sketch —
    * shared by q86 (bare) and q48 (seeded "sh|"). */
  private def simhashPairsSql(seed: String): String =
    s"""WITH ${simhash60Ctes(seed)},
       |chunks AS (
       |  SELECT doc_id, simhash60, c.chunk,
       |    (simhash60 >> (c.chunk * 15)) & 32767 AS ckey
       |  FROM sk, (SELECT CAST(unnest(range(4)) AS INT) AS chunk) c),
       |kept AS (
       |  SELECT * FROM (
       |    SELECT doc_id, simhash60, chunk, ckey,
       |      COUNT(*) OVER (PARTITION BY chunk, ckey) AS bsz
       |    FROM chunks) s
       |  WHERE bsz <= 1000),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.simhash60 AS sh_a, b.simhash60 AS sh_b
       |  FROM kept a JOIN kept b
       |    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** Seeded normalize-then-md5 fingerprint oracle (q91 bare, q41
    * seeded): 15 hex nibbles decoded to a 60-bit BIGINT key. */
  private def fingerprintMd5Sql(seed: String): String = {
    val terms = (0 until 15).map { i =>
      val nib = s"substr(h, ${i + 1}, 1)"
      s"CAST(ascii($nib) - CASE WHEN $nib <= '9' THEN 48 ELSE 87 END" +
        s" AS BIGINT) * ${1L << (4 * (14 - i))}"
    }.mkString(" +\n        ")
    s"""WITH n AS (SELECT doc_id,
       |  md5('$seed' || regexp_replace(trim(text), '\\s+', ' ', 'g')) AS h
       |  FROM documents)
       |SELECT doc_id, CAST($terms AS BIGINT) AS fp60
       |FROM n ORDER BY doc_id""".stripMargin
  }

  /** Brute-force cosine top-`limit` for query vector 0 — the oracle
    * for the brute-force scan (q42), the exhaustive IVF probe (q87),
    * and the semantic channel of the RRF fusion (q268). */
  private def cosineTopSql(limit: Int): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(
       |  list_sum(list_transform(range(1, len(embedding) + 1),
       |    i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
       |  / nullif(
       |      sqrt(list_sum(list_transform(embedding,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |      * sqrt(list_sum(list_transform(qe,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
       |      CAST(0.0 AS DOUBLE)),
       |  6) AS cosine
       |FROM embeddings, q WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id LIMIT $limit""".stripMargin

  private val bruteForceTop10Sql: String = cosineTopSql(10)

  /** BM25 top-`limit` oracle (q103's SQL, parameterized so the RRF
    * fusion q268 can reuse the lexical channel at a different k). */
  private def bm25TopSql(terms: Seq[String], limit: Int): String = {
    val contribs = terms.zipWithIndex.map { case (t, i) =>
      s"""ln((CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE))
         |    / (CAST(df$i AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |    + CAST(1.0 AS DOUBLE))
         |  * (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)
         |    * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |  / (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)
         |    + CAST(1.2 AS DOUBLE)
         |      * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
         |        * (CAST(dl AS DOUBLE)
         |          / (CAST(sum_dl AS DOUBLE)
         |            / CAST(n_docs AS DOUBLE)))))""".stripMargin
    }
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS df$i"
    }.mkString(",\n  ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
       |  $dfAggs
       |  FROM docs)
       |SELECT doc_id, bm25 FROM (
       |  SELECT doc_id, round(
       |    ${contribs.mkString("\n  + ")}, 6) AS bm25
       |  FROM docs CROSS JOIN stats) t
       |WHERE bm25 > 0
       |ORDER BY bm25 DESC, doc_id LIMIT $limit""".stripMargin
  }

  /** DuckDB oracle for the RRF fusion (q268): the two channel
    * queries verbatim as derived tables, ranked, full-outer fused
    * with the identical 1/(rrfK + r) two-term tree. */
  private def rrfFusionSql(terms: Seq[String], k: Int, rrfK: Int,
      topK: Int): String = {
    def rt(r: String): String =
      s"""CASE WHEN $r > 0
         |    THEN CAST(1.0 AS DOUBLE)
         |      / (CAST($rrfK.0 AS DOUBLE) + CAST($r AS DOUBLE))
         |    ELSE CAST(0.0 AS DOUBLE) END""".stripMargin
    s"""WITH lex AS (SELECT doc_id AS id,
       |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
       |  FROM (${bm25TopSql(terms, k)}) lexbase),
       |sem AS (SELECT vec_id AS id,
       |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS r_sem
       |  FROM (${cosineTopSql(k)}) sembase),
       |j AS (SELECT coalesce(lex.id, sem.id) AS id,
       |    CAST(coalesce(r_lex, 0) AS BIGINT) AS r_lex,
       |    CAST(coalesce(r_sem, 0) AS BIGINT) AS r_sem
       |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
       |SELECT id, r_lex, r_sem,
       |  round(${rt("r_lex")}
       |    + ${rt("r_sem")}, 6) AS rrf
       |FROM j ORDER BY rrf DESC, id LIMIT $topK""".stripMargin
  }

  /** 16-dim-prefix variant of [[bruteForceTop10Sql]] (q109/q110, and
    * at limit=50 the candidate stage of the q111 cascade): same
    * one-pass arithmetic over the sliced lists. */
  private def prefixTopSql(limit: Int): String =
    s"""WITH q AS (SELECT embedding[1:16] AS qe FROM embeddings
       |           WHERE vec_id = 0)
       |SELECT vec_id, round(
       |  list_sum(list_transform(range(1, 17),
       |    i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
       |  / nullif(
       |      sqrt(list_sum(list_transform(embedding[1:16],
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |      * sqrt(list_sum(list_transform(qe,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
       |      CAST(0.0 AS DOUBLE)),
       |  6) AS cosine
       |FROM embeddings, q WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id LIMIT $limit""".stripMargin

  private val prefixTop10Sql: String = prefixTopSql(10)

  /** Shared CTE chain for the q100/q101 funnel: the q36 quality score
    * (same expression, same round-6), sha256 keep-first, md5 'pf|'
    * domain cap at 10 — each stage the exact mirror of the Spark DAG in
    * [[graft.ops.Curation.pipelineFunnel]]. */
  private val funnelCtes: String =
    """WITH t AS (
      |  SELECT doc_id, source, lang, text, round(
      |    CAST(0.4 AS DOUBLE) * least(
      |      CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE)
      |        / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
      |    + CAST(0.3 AS DOUBLE) *
      |      (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |        / CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE))
      |    + CAST(0.3 AS DOUBLE) * least(
      |      (CAST(len(list_filter(string_split(text, ' '),
      |          x -> list_contains(['the','a','and','of','to','in'], x)))
      |        AS DOUBLE)
      |        / CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE))
      |        * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)),
      |    6) AS quality
      |  FROM documents),
      |g AS (SELECT * FROM t WHERE quality >= 0.5),
      |d AS (SELECT doc_id, source, lang, quality,
      |    row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id)
      |      AS rn FROM g),
      |u AS (SELECT doc_id, source, lang, quality FROM d WHERE rn = 1),
      |c AS (SELECT doc_id, source, lang, quality,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5('pf|' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS rk FROM u)""".stripMargin

  /** DuckDB-dialect oracle SQL per query (omitted -> rows-only check). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql(discPriceSql)} AS sum_disc_price,
         |  ${dsumSql("l_quantity")} / COUNT(l_quantity) AS avg_qty,
         |  ${dsumSql("l_discount")} / COUNT(l_discount) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_prefix" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_name LIKE 'large%' ORDER BY p_partkey""".stripMargin,
    "q03_filter_contains" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE lower(o_orderpriority) LIKE '%high%' ORDER BY o_orderkey""".stripMargin,
    "q04_filter_daterange" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date FROM orders
        |WHERE o_orderdate IS NULL OR (o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01')
        |ORDER BY o_orderkey""".stripMargin,
    "q05_filter_validity" ->
      s"""SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS total_value
         |FROM events
         |WHERE value IS NOT NULL AND props IS NOT NULL AND event_type <> 'error'
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q06_filter_exclusion" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name NOT LIKE '%widget%' AND p_type <> 'PROMO'
        |  AND p_name NOT LIKE '%rod'
        |ORDER BY p_partkey""".stripMargin,
    "q07_dedup_first_seen" ->
      """SELECT user_id, first_event_id, first_event_type FROM (
        |  SELECT user_id, event_id AS first_event_id,
        |         event_type AS first_event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q08_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    // the PLAIN anti join: the Spark side routes through the Bloom
    // pre-filter, and pruning must not change a single row
    "q93_bloom_anti" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin,
    // golden-ratio oracle (the q90 pattern): HLL++ at rsd 0.01 is
    // within a fraction of a percent of exact on this key space at
    // both gate SFs, so round(approx/exact, 1) must be exactly 1.0
    "q94_hll_distinct" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
        |  CAST(1.0 AS DOUBLE) AS hll_ratio FROM orders""".stripMargin,
    "q10_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q11_broadcast_dim_join" ->
      s"""SELECT r_name, COUNT(*) AS n_customers,
         |  ${dsumSql("c_acctbal")} AS total_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q12_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,
    "q13_union_distinct" ->
      """SELECT DISTINCT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |) t ORDER BY custkey""".stripMargin,
    "q14_agg_counters" ->
      s"""SELECT user_id,
         |  COUNT(CASE WHEN event_type <> 'error' THEN 1 END) AS n_ok,
         |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
         |  ${dsumSql("value")} AS total_value,
         |  COUNT(*) AS n_events
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q15_agg_conditional" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
         |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
         |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
         |  ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q16_collect_list" ->
      """SELECT o_custkey,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
        |    AS orderkeys
        |FROM orders WHERE o_custkey < 50
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q17_top10_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q18_filter_then_limit" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date FROM orders
        |WHERE o_orderstatus = 'O'
        |ORDER BY o_orderdate, o_orderkey LIMIT 20""".stripMargin,
    "q19_topk_per_group" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q20_top_revenue_orders" ->
      s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
         |  ${dsumSql(discPriceSql)} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2000-03-15'
         |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q21_agg_month_buckets" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS o_month,
         |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY 1 ORDER BY o_month""".stripMargin,
    "q22_region_revenue" ->
      s"""SELECT n_name, ${dsumSql(discPriceSql)} AS revenue,
         |  COUNT(*) AS n_lineitems
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q23_url_extract" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    'https://dagsordener.demo.dk/vis?Referat-d.'
        |      || strftime(o_orderdate, '%d-%m-%Y') || '&id='
        |      || concat_ws('-',
        |           substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8),
        |           substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 4),
        |           substr(md5(CAST(o_orderkey AS VARCHAR)), 13, 4),
        |           substr(md5(CAST(o_orderkey AS VARCHAR)), 17, 4),
        |           substr(md5(CAST(o_orderkey AS VARCHAR)), 21, 12)) AS url
        |  FROM orders)
        |SELECT o_orderkey,
        |  regexp_extract(url, 'id=([a-f0-9\-]{36})', 1) AS doc_uuid,
        |  CAST(strptime(regexp_extract(url, 'd\.([0-9]{2}-[0-9]{2}-[0-9]{4})', 1),
        |       '%d-%m-%Y') AS DATE) AS meeting_date,
        |  'https://dagsordener.demo.dk/pdf/GetDagsorden/'
        |    || regexp_extract(url, 'id=([a-f0-9\-]{36})', 1) AS pdf_url
        |FROM t ORDER BY o_orderkey""".stripMargin,
    "q24_date_formats" ->
      """SELECT o_orderkey,
        |  CAST(strptime(strftime(o_orderdate, '%d-%m-%Y'), '%d-%m-%Y') AS DATE) AS d_dmy,
        |  CAST(regexp_extract(strftime(o_orderdate, '%Y-%m-%d'),
        |       '([0-9]{4}-[0-9]{2}-[0-9]{2})', 1) AS DATE) AS d_iso,
        |  CAST(strptime(regexp_extract(strftime(o_orderdate, '%d.%m.%Y'),
        |       '([0-9]{2}\.[0-9]{2}\.[0-9]{4})', 1), '%d.%m.%Y') AS DATE) AS d_dot
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q25_danish_dates" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    CAST(day(o_orderdate) AS VARCHAR) || '. ' ||
        |    CASE month(o_orderdate)
        |      WHEN 1 THEN 'januar' WHEN 2 THEN 'februar' WHEN 3 THEN 'marts'
        |      WHEN 4 THEN 'april' WHEN 5 THEN 'maj' WHEN 6 THEN 'juni'
        |      WHEN 7 THEN 'juli' WHEN 8 THEN 'august' WHEN 9 THEN 'september'
        |      WHEN 10 THEN 'oktober' WHEN 11 THEN 'november'
        |      WHEN 12 THEN 'december' END
        |    || ' ' || CAST(year(o_orderdate) AS VARCHAR) AS danish
        |  FROM orders)
        |SELECT o_orderkey, danish,
        |  make_date(
        |    CAST(regexp_extract(danish, '[0-9]{1,2}\. [a-z]+ ([0-9]{4})', 1) AS INT),
        |    CASE regexp_extract(danish, '[0-9]{1,2}\. ([a-z]+) [0-9]{4}', 1)
        |      WHEN 'januar' THEN 1 WHEN 'februar' THEN 2 WHEN 'marts' THEN 3
        |      WHEN 'april' THEN 4 WHEN 'maj' THEN 5 WHEN 'juni' THEN 6
        |      WHEN 'juli' THEN 7 WHEN 'august' THEN 8 WHEN 'september' THEN 9
        |      WHEN 'oktober' THEN 10 WHEN 'november' THEN 11
        |      WHEN 'december' THEN 12 END,
        |    CAST(regexp_extract(danish, '([0-9]{1,2})\. [a-z]+ [0-9]{4}', 1) AS INT)
        |  ) AS parsed_date
        |FROM t ORDER BY o_orderkey""".stripMargin,
    "q26_filenames" ->
      """WITH t AS (
        |  SELECT c_custkey,
        |    lower(replace(c_name, 'Customer#', 'cust')) AS muni,
        |    DATE '2025-01-01' + CAST(c_custkey % 365 AS INT) AS meeting_date
        |  FROM customer)
        |SELECT c_custkey,
        |  strftime(meeting_date, '%Y-%m-%d') || '_' || muni
        |    || '_oekonomiudvalget.pdf' AS filename,
        |  regexp_replace('a<b>:' || muni || '|x?*.pdf',
        |    '[<>:"/\\|?*]', '_', 'g') AS sanitized,
        |  muni || '&&' || replace('https://x.dk/doc/'
        |    || CAST(c_custkey AS VARCHAR), '/', '@') || '.pdf' AS remote_key
        |FROM t ORDER BY c_custkey""".stripMargin,
    "q27_url_functions" ->
      """WITH t AS (
        |  SELECT n_nationkey,
        |    lower(replace(n_name, '_', '')) AS muni,
        |    'https://dagsorden.' || lower(replace(n_name, '_', ''))
        |      || 'kommune.dk/' AS base
        |  FROM nation)
        |SELECT n_nationkey,
        |  regexp_extract(base, '^https?://([^/]+)', 1) AS host,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    regexp_extract(base, '^https?://([^/]+)', 1),
        |    '^dagsorden(er)?\.', ''), '\.dk$', ''), 'kommune$', '') AS derived_muni,
        |  regexp_replace(base, '/+$', '') || '/agenda?pdfnavn=' || muni
        |    || '.pdf&mode=open' AS joined_url,
        |  regexp_extract(base || 'x?pdfnavn=' || muni || '.pdf&m=1',
        |    '[?&]pdfnavn=([^&]*)', 1) AS pdfnavn,
        |  upper(muni) AS muni_upper,
        |  regexp_extract('window.open(''/files/' || muni || '.pdf'')',
        |    'window\.open\(''([^'']+)''', 1) AS js_url
        |FROM t ORDER BY n_nationkey""".stripMargin,
    "q28_text_cleanup" ->
      """SELECT p_partkey,
        |  replace(replace(replace(replace(replace(replace(
        |    'Referat &amp; dagsorden &lt;' || p_name || '&gt; &quot;x&quot;',
        |    '&quot;', '"'), '&#39;', ''''), '&lt;', '<'), '&gt;', '>'),
        |    '&nbsp;', ' '), '&amp;', '&') AS unescaped,
        |  lpad(CAST(p_partkey % 31 + 1 AS VARCHAR), 2, '0') AS padded_day,
        |  trim(regexp_replace('Punkt  ' || CAST(p_partkey AS VARCHAR),
        |    '^\s*Punkt\s*', '')) AS item_number,
        |  CASE WHEN p_partkey % 2 = 0 THEN '.pdf' ELSE '.docx' END AS ext
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q29_base64" ->
      """SELECT s_suppkey,
        |  to_base64(encode(s_name)) AS b64,
        |  decode(from_base64(to_base64(encode(s_name)))) AS roundtrip
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q30_safe_dates" ->
      """SELECT o_orderkey,
        |  CASE WHEN m BETWEEN 1 AND 12 AND 10 BETWEEN 1 AND 31
        |       THEN make_date(2025, m, 10) END AS maybe_date
        |FROM (SELECT o_orderkey, CAST(o_orderkey % 15 + 1 AS INT) AS m
        |      FROM orders) t
        |ORDER BY o_orderkey""".stripMargin,
    "q45_event_hour_buckets" ->
      s"""SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
         |  COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  ${dsumSql("value")} AS total_value
         |FROM events GROUP BY 1 ORDER BY hour_bucket""".stripMargin,
    "q46_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |    AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q47_event_gaps" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts), 1)
        |    OVER (PARTITION BY user_id ORDER BY event_id) AS gap_us
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q31_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY sha256(text) ORDER BY doc_id""".stripMargin,
    "q32_dedup_keep_first" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q33_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE) AS avg_token_len,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE) AS unique_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_lang_profile" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  ${dsumSql("n_chars")} AS total_chars,
         |  CAST(SUM(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS total_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q35_langid" ->
      """WITH t AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents)
        |SELECT doc_id, lang AS labeled_lang,
        |  CASE
        |    WHEN (CASE WHEN p LIKE '% the %' THEN 1 ELSE 0 END
        |        + CASE WHEN p LIKE '% and %' THEN 1 ELSE 0 END
        |        + CASE WHEN p LIKE '% of %' THEN 1 ELSE 0 END) >= 2 THEN 'en'
        |    WHEN (CASE WHEN p LIKE '% og %' THEN 1 ELSE 0 END
        |        + CASE WHEN p LIKE '% det %' THEN 1 ELSE 0 END
        |        + CASE WHEN p LIKE '% en %' THEN 1 ELSE 0 END) >= 2 THEN 'da'
        |    WHEN (CASE WHEN p LIKE '% der %' THEN 1 ELSE 0 END
        |        + CASE WHEN p LIKE '% und %' THEN 1 ELSE 0 END
        |        + CASE WHEN p LIKE '% die %' THEN 1 ELSE 0 END) >= 2 THEN 'de'
        |    ELSE 'und' END AS detected_lang
        |FROM t ORDER BY doc_id""".stripMargin,
    "q36_quality_gate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> list_contains(['the','a','and','of','to','in'], x)))
        |      AS DOUBLE) AS n_stop
        |  FROM documents)
        |SELECT doc_id, quality FROM (
        |  SELECT doc_id, round(
        |    CAST(0.4 AS DOUBLE) * least(n_tokens / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |    + CAST(0.3 AS DOUBLE) * (n_uniq / n_tokens)
        |    + CAST(0.3 AS DOUBLE) * least((n_stop / n_tokens) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)),
        |    6) AS quality
        |  FROM t) s
        |WHERE quality >= 0.5 ORDER BY doc_id""".stripMargin,
    "q50_salted_agg" ->
      s"""SELECT l_suppkey, COUNT(*) AS n_items,
         |  ${dsumSql("l_quantity")} AS total_value
         |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q51_json_props" ->
      """SELECT event_type,
        |  COUNT(k) AS n_with_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
        |      FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q49_token_budget" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT)
        |    AS total_tokens,
        |  CAST(SUM(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9]{1,4}|[^a-zA-Z0-9 ]'))) AS BIGINT) AS total_subwords
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q37_embed_norms" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
        |  CAST(len(embedding) AS BIGINT) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q53_sessionize" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
         |         OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w >= 21600000000000
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |s AS (SELECT user_id, ts, value,
         |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |          ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM g)
         |SELECT user_id,
         |  CAST(min(epoch_ns(ts) // 1000) AS BIGINT) AS session_start_us,
         |  COUNT(*) AS n_events, ${dsumSql("value")} AS total_value
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_start_us""".stripMargin,
    "q54_asof_join" ->
      """WITH upd AS (
        |  SELECT o_custkey % 150 AS user_id,
        |         1704067200000000000 + (o_orderkey % 720) * 3600000000000
        |           AS uts,
        |         MAX(o_totalprice) AS upd_price
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, u.upd_price AS asof_price
        |FROM events e ASOF LEFT JOIN upd u
        |  ON e.user_id = u.user_id AND epoch_ns(e.ts) >= u.uts
        |ORDER BY e.event_id""".stripMargin,
    "q55_range_join" ->
      s"""WITH w AS (SELECT CAST(range AS BIGINT) AS window_id,
         |             1704067200000000000 + range * 129600000000000 AS ws
         |           FROM range(20))
         |SELECT window_id, COUNT(*) AS n_events,
         |  ${dsumSql("value")} AS total_value
         |FROM events e JOIN w
         |  ON epoch_ns(e.ts) >= w.ws AND epoch_ns(e.ts) < w.ws + 5400000000000
         |GROUP BY window_id ORDER BY window_id""".stripMargin,
    "q56_salted_join" ->
      s"""WITH dim AS (SELECT c_custkey % 150 AS user_id,
         |               MAX(c_mktsegment) AS segment
         |             FROM customer GROUP BY 1)
         |SELECT segment, COUNT(*) AS n_events,
         |  ${dsumSql("value")} AS total_value
         |FROM events e JOIN dim USING (user_id)
         |GROUP BY segment ORDER BY segment""".stripMargin,
    "q57_stratified_sample" ->
      """SELECT doc_id, source, lang FROM (
        |  SELECT doc_id, source, lang,
        |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
        |         THEN '14' ELSE '33' END AS rate_hex
        |  FROM documents) t
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= rate_hex
        |ORDER BY doc_id""".stripMargin,
    "q58_normalize_text" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q59_pii_redact" ->
      """WITH t AS (
        |  SELECT c_custkey,
        |    'contact ' || lower(regexp_replace(c_name, '[# ]', '', 'g'))
        |      || '@example.com or +45 '
        |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' '
        |      || lpad(CAST(c_custkey * 7 % 10000 AS VARCHAR), 4, '0')
        |      || ' office' AS raw
        |  FROM customer)
        |SELECT c_custkey, raw,
        |  regexp_replace(regexp_replace(raw,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '\+[0-9]{2} [0-9]{4} [0-9]{4}', '[PHONE]', 'g') AS redacted
        |FROM t ORDER BY c_custkey""".stripMargin,
    "q60_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents),
        |grams AS (SELECT doc_id,
        |            unnest(list_transform(range(1, len(tk) - 6),
        |              i -> array_to_string(tk[i:i+7], ' '))) AS g
        |          FROM toks WHERE len(tk) >= 8),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
        |SELECT doc_id, COUNT(DISTINCT g) AS n_shared_grams
        |FROM grams JOIN bench USING (g)
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q61_tfidf_top_term" ->
      """WITH tfa AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tfa GROUP BY 1, 2),
        |dfa AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
        |      AS score
        |  FROM tf JOIN dfa USING (term) CROSS JOIN n)
        |SELECT doc_id, term AS top_term, round(score, 6) AS tfidf FROM (
        |  SELECT doc_id, term, score, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q62_minhash_md5" ->
      ("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
         |              FROM documents),
         |grams AS (SELECT doc_id,
         |            unnest(list_transform(range(1, len(tk) - 1),
         |              i -> array_to_string(tk[i:i+2], ' '))) AS g
         |          FROM toks WHERE len(tk) >= 3)
         |SELECT doc_id,
         |""".stripMargin
        + (0 until 8).map(j =>
            s"  min(md5('$j|' || g)) AS sig_$j").mkString(",\n")
        + "\nFROM grams GROUP BY doc_id ORDER BY doc_id"),
    "q63_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (SELECT doc_id,
        |            unnest(list_transform(range(1, len(tk) - 1),
        |              i -> array_to_string(tk[i:i+2], ' '))) AS g
        |          FROM toks WHERE len(tk) >= 3),
        |sig AS (SELECT doc_id, min(md5('0|' || g)) AS s0
        |        FROM grams GROUP BY doc_id),
        |edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
        |          FROM sig a JOIN sig b ON a.s0 = b.s0
        |          WHERE a.doc_id <> b.doc_id),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // histogram + interpolated-rank quantiles: the identical R-7
    // expression the Spark side evaluates (quantile_cont would match
    // numerically, but mirroring the histogram device keeps the float
    // expression tree identical by construction)
    "q64_token_quantiles" -> {
      def h(q: String) =
        s"CAST(n - 1 AS DOUBLE) * CAST($q AS DOUBLE)"
      def los(q: String, tag: String) =
        s"""MIN(CASE WHEN cum >= floor(${h(q)}) + 1 THEN t END)
           |      AS lo$tag,
           |    MIN(CASE WHEN cum >= ceil(${h(q)}) + 1 THEN t END)
           |      AS hi$tag""".stripMargin
      def interp(q: String, tag: String) =
        s"""round(CASE WHEN floor(${h(q)}) = ceil(${h(q)}) THEN lo$tag
           |    ELSE (ceil(${h(q)}) - ${h(q)}) * lo$tag
           |      + (${h(q)} - floor(${h(q)})) * hi$tag END, 6)
           |    AS p$tag""".stripMargin
      s"""WITH hist AS (SELECT source,
         |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE) AS t,
         |    COUNT(*) AS c
         |  FROM documents GROUP BY 1, 2),
         |r AS (SELECT source, t,
         |    SUM(c) OVER (PARTITION BY source ORDER BY t) AS cum,
         |    SUM(c) OVER (PARTITION BY source) AS n
         |  FROM hist),
         |q AS (SELECT source, MAX(n) AS n,
         |    ${los("0.5", "50")},
         |    ${los("0.9", "90")},
         |    ${los("0.99", "99")}
         |  FROM r GROUP BY source)
         |SELECT source,
         |  ${interp("0.5", "50")},
         |  ${interp("0.9", "90")},
         |  ${interp("0.99", "99")}
         |FROM q ORDER BY source""".stripMargin
    },
    "q65_rollup_revenue" ->
      s"""SELECT COALESCE(o_year, -1) AS o_year,
         |  COALESCE(o_month, -1) AS o_month,
         |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
         |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |        CAST(month(o_orderdate) AS BIGINT) AS o_month, o_totalprice
         |      FROM orders) t
         |GROUP BY ROLLUP (o_year, o_month)
         |ORDER BY o_year, o_month""".stripMargin,
    "q66_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q67_heavy_hitters" ->
      """SELECT term, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,
    "q68_value_histogram" ->
      s"""SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
         |  COUNT(*) AS n_events, ${dsumSql("value")} AS total_value
         |FROM events WHERE value IS NOT NULL
         |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q69_snapshot_diff" ->
      """WITH prev AS (SELECT o_orderkey, o_totalprice AS fp FROM orders
        |              WHERE o_orderkey % 9 <> 0),
        |cur AS (SELECT o_orderkey,
        |          CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
        |               ELSE o_totalprice END AS fp
        |        FROM orders)
        |SELECT COALESCE(p.o_orderkey, c.o_orderkey) AS o_orderkey,
        |  CASE WHEN p.o_orderkey IS NULL THEN 'added'
        |       WHEN c.o_orderkey IS NULL THEN 'removed'
        |       WHEN p.fp <> c.fp THEN 'changed' END AS status
        |FROM prev p FULL OUTER JOIN cur c ON p.o_orderkey = c.o_orderkey
        |WHERE (p.o_orderkey IS NULL OR c.o_orderkey IS NULL OR p.fp <> c.fp)
        |ORDER BY o_orderkey""".stripMargin,
    "q70_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS avg_last3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q42_knn_brute" -> bruteForceTop10Sql,
    "q43_ann_lsh" -> Similarity.annLshMd5Sql(),
    "q44_embed_near_dup" -> Similarity.cosineNearDupMd5Sql(),
    "q52_ann_ivf" -> Similarity.annIvfMd5Sql(),
    // annIvf with nprobe == nlist is exhaustive: the IVF machinery
    // (KMeans assignment, probe-list ranking, re-rank) must reproduce
    // the brute-force top-10 exactly — ANN-vs-exact agreement as a
    // hash-match, not just a ScalaTest invariant
    "q87_ann_ivf_exact" -> bruteForceTop10Sql,
    // annLsh with 1 plane x 1 table + multi-probe probes both buckets of
    // the only table — an exhaustive candidate set by construction, so
    // the LSH machinery (SRP bucketing pass, memoized index, multi-probe
    // predicate, exact re-rank) must reproduce brute force exactly
    "q89_ann_lsh_exact" -> bruteForceTop10Sql,
    // golden-value oracle: recall@10 of the production-geometry
    // multi-probe annLsh vs brute force is a deterministic function of
    // the seeded hyperplanes and the synthetic table — measured 8/10 at
    // BOTH sf0.001 and sf0.01 (the iteration and gate scales). A
    // regression in bucketing, probing, or re-ranking moves this number;
    // SimilaritySpec's recall-floor test bounds it from below, this row
    // hash-checks it exactly
    "q90_ann_recall" ->
      "SELECT CAST(8 AS BIGINT) AS hits, CAST(0.8 AS DOUBLE) AS recall_at_10",
    // PQ exact twin: a refine budget covering the corpus makes the
    // encode + ADC + re-rank pipeline exhaustive by construction
    "q96_ann_pq_exact" -> bruteForceTop10Sql,
    // golden-value oracle: recall@10 of the refineFactor=16 PQ probe
    // (deterministic md5-sampled training, seeded Lloyd, exact
    // re-rank) measured 9/10 at BOTH sf0.001 and sf0.01; a regression
    // in training, encoding, the ADC kernel, or refinement moves it
    "q97_ann_pq_recall" ->
      "SELECT CAST(9 AS BIGINT) AS hits, CAST(0.9 AS DOUBLE) AS recall_at_10",
    // SQ8 cell-for-cell: per-dim min/max then the identical
    // floor((v-mn)/(mx-mn)*255 + 0.5) in exact IEEE double arithmetic
    "q98_sq8_codes" ->
      """WITH ix AS (SELECT vec_id, embedding,
        |        unnest(range(1, len(embedding) + 1)) AS i
        |      FROM embeddings),
        |e AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
        |      FROM ix),
        |s AS (SELECT i, min(v) AS mn, max(v) AS mx FROM e GROUP BY i)
        |SELECT e.vec_id, CAST(e.i - 1 AS BIGINT) AS dim,
        |  CAST(CASE WHEN mx = mn THEN 0
        |       ELSE least(255, greatest(0,
        |         floor((v - mn) / (mx - mn) * 255 + 0.5))) END
        |    AS BIGINT) AS code
        |FROM e JOIN s USING (i)
        |ORDER BY vec_id, dim""".stripMargin,
    // domain cap: the md5 hex string IS the order key (fixed-width
    // lowercase hex sorts identically in both engines)
    "q99_domain_cap" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5('dc|' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= 15
        |ORDER BY source, doc_id""".stripMargin,
    // the composed funnel: quality CTE (q36's exact formula) ->
    // sha256 keep-first (q32's shape) -> md5 cap (q99's shape)
    "q100_pipeline_funnel" ->
      s"""$funnelCtes
         |SELECT doc_id, source, lang, quality FROM c WHERE rk <= 10
         |ORDER BY doc_id""".stripMargin,
    "q101_funnel_counts" ->
      s"""$funnelCtes
         |SELECT (SELECT COUNT(*) FROM documents) AS n_total,
         |  (SELECT COUNT(*) FROM g) AS n_quality,
         |  (SELECT COUNT(*) FROM u) AS n_unique,
         |  (SELECT COUNT(*) FROM c WHERE rk <= 10) AS n_capped""".stripMargin,
    // duplicated spans over gram STRINGS (the Spark side keys on the
    // 64-bit lead-window hash; equal counts because gram equality is
    // preserved — the q60 equivalence); positions are 1-based here and
    // 0-based in Spark, which no count can see
    "q102_dup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents),
        |p AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS pos
        |      FROM toks WHERE len(tk) >= 8),
        |g2 AS (SELECT doc_id, pos,
        |         array_to_string(tk[pos:pos+7], ' ') AS g
        |       FROM p),
        |dup AS (SELECT g FROM g2 GROUP BY g
        |        HAVING COUNT(DISTINCT doc_id) >= 2),
        |dp AS (SELECT doc_id, pos FROM g2 JOIN dup USING (g)),
        |counts AS (SELECT doc_id, COUNT(*) AS n_dup_grams
        |           FROM dp GROUP BY doc_id),
        |cov AS (SELECT doc_id, COUNT(DISTINCT pos + j) AS n_cov_tokens
        |        FROM (SELECT doc_id, pos, unnest(range(0, 8)) AS j
        |              FROM dp) e
        |        GROUP BY doc_id),
        |ntok AS (SELECT doc_id, len(tk) AS n_tokens FROM toks)
        |SELECT doc_id, n_dup_grams, n_cov_tokens,
        |  round(CAST(n_cov_tokens AS DOUBLE)
        |    / CAST(n_tokens AS DOUBLE), 6) AS dup_frac
        |FROM counts JOIN cov USING (doc_id) JOIN ntok USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // BM25: constants are spelled as the same IEEE operations the
    // Scala side compiles (1.2 + 1.0, not a 2.2 literal) so every
    // double matches; ln's last ulp is absorbed by round-6 (q61)
    "q103_bm25" -> bm25TopSql(Seq("spark", "hash", "window"), 20),
    "q104_inverted_index" ->
      """WITH pairs AS (SELECT DISTINCT doc_id,
        |    unnest(string_split(text, ' ')) AS term FROM documents),
        |r AS (SELECT term, doc_id, row_number() OVER (
        |    PARTITION BY term ORDER BY doc_id) AS rn FROM pairs)
        |SELECT term, COUNT(*) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |    FILTER (WHERE rn <= 25) AS postings
        |FROM r GROUP BY term ORDER BY term""".stripMargin,
    // span removal over gram STRINGS; 1-based positions, Spark's are
    // 0-based — invisible to the rebuilt text
    "q105_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents),
        |p AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS pos
        |      FROM toks WHERE len(tk) >= 8),
        |g2 AS (SELECT doc_id, pos,
        |         array_to_string(tk[pos:pos+7], ' ') AS g
        |       FROM p),
        |dup AS (SELECT g FROM g2 GROUP BY g
        |        HAVING COUNT(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS cp
        |        FROM (SELECT doc_id, pos, unnest(range(0, 8)) AS j
        |              FROM g2 JOIN dup USING (g)) e),
        |tok AS (SELECT doc_id, unnest(tk) AS t,
        |          unnest(range(1, len(tk) + 1)) AS pos
        |        FROM toks),
        |kept AS (SELECT tok.doc_id,
        |    string_agg(t, ' ' ORDER BY pos) AS clean_text
        |  FROM tok LEFT JOIN cov
        |    ON tok.doc_id = cov.doc_id AND tok.pos = cov.cp
        |  WHERE cov.doc_id IS NULL
        |  GROUP BY tok.doc_id)
        |SELECT d.doc_id, coalesce(kept.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN kept ON d.doc_id = kept.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // ordered per-doc fold: list(nlp ORDER BY pos) then list_sum is
    // the same left-to-right accumulation as Spark's aggregate()
    "q106_unigram_nll" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS t,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |vocab AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
        |total AS (SELECT COUNT(*) AS total FROM tok)
        |SELECT doc_id, round(
        |    list_sum(list(-ln(CAST(cnt AS DOUBLE)
        |      / CAST(total AS DOUBLE)) ORDER BY pos))
        |    / COUNT(*), 6) AS mean_nll
        |FROM tok JOIN vocab USING (t) CROSS JOIN total
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q107_bpe_pairs" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS t,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents)
        |SELECT t1.t AS a, t2.t AS b, COUNT(*) AS cnt
        |FROM tok t1 JOIN tok t2
        |  ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
        |GROUP BY t1.t, t2.t
        |ORDER BY cnt DESC, a, b LIMIT 20""".stripMargin,
    // rank-based percentiles: "count at rank ceil(q*n) in (cnt, key)
    // order" is the same integer in both engines, unlike interpolated
    // quantiles whose rules differ
    "q108_skew_profile" ->
      """WITH counts AS (SELECT l_suppkey, COUNT(*) AS cnt
        |                FROM lineitem GROUP BY l_suppkey),
        |r AS (SELECT cnt, row_number() OVER (
        |    ORDER BY cnt, l_suppkey) AS rn FROM counts),
        |n AS (SELECT COUNT(*) AS nk, MAX(cnt) AS mx FROM counts)
        |SELECT nk AS n_keys, mx AS max_cnt,
        |  (SELECT cnt FROM r, n
        |   WHERE rn = CAST(ceil(0.5 * CAST(nk AS DOUBLE)) AS BIGINT))
        |    AS p50_cnt,
        |  (SELECT cnt FROM r, n
        |   WHERE rn = CAST(ceil(0.99 * CAST(nk AS DOUBLE)) AS BIGINT))
        |    AS p99_cnt,
        |  round(CAST(mx AS DOUBLE) / CAST((SELECT cnt FROM r, n
        |    WHERE rn = CAST(ceil(0.5 * CAST(nk AS DOUBLE)) AS BIGINT))
        |    AS DOUBLE), 6) AS skew_ratio
        |FROM n""".stripMargin,
    "q109_mrl_recall" ->
      s"""WITH full10 AS ($bruteForceTop10Sql),
         |pre10 AS ($prefixTop10Sql)
         |SELECT COUNT(*) AS hits,
         |  CAST(COUNT(*) AS DOUBLE) / CAST(10.0 AS DOUBLE) AS recall_at_k
         |FROM pre10 JOIN full10 USING (vec_id)""".stripMargin,
    "q110_mrl_prefix_knn" -> prefixTop10Sql,
    "q111_mrl_cascade" ->
      s"""WITH cand AS (SELECT vec_id FROM (${prefixTopSql(50)}) c),
         |qf AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(
         |  list_sum(list_transform(range(1, len(embedding) + 1),
         |    i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
         |  / nullif(
         |      sqrt(list_sum(list_transform(embedding,
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |      * sqrt(list_sum(list_transform(qe,
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
         |      CAST(0.0 AS DOUBLE)),
         |  6) AS cosine
         |FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN qf
         |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "q112_source_overlap" ->
      """WITH st AS (SELECT DISTINCT source,
        |    unnest(string_split(text, ' ')) AS term FROM documents),
        |sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY source),
        |sh AS (SELECT a.source AS s1, b.source AS s2,
        |    COUNT(*) AS shared
        |  FROM st a JOIN st b
        |    ON a.term = b.term AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT s1, s2, shared,
        |  round(CAST(shared AS DOUBLE)
        |    / CAST(z1.n + z2.n - shared AS DOUBLE), 6) AS jaccard
        |FROM sh JOIN sz z1 ON s1 = z1.source
        |  JOIN sz z2 ON s2 = z2.source
        |ORDER BY s1, s2""".stripMargin,
    // N_h*S_h = sqrt(n*sx2 - sx^2): exact BIGINT argument, correctly-
    // rounded sqrt in both engines; the cross-strata weight total
    // folds in lang order (the q106 device)
    "q113_neyman_alloc" ->
      """WITH m AS (SELECT lang, CAST(n_chars AS BIGINT) AS x
        |           FROM documents),
        |s AS (SELECT lang, COUNT(*) AS n_h, CAST(SUM(x) AS BIGINT) AS sx,
        |        SUM(CAST(x AS HUGEINT) * x) AS sx2
        |      FROM m GROUP BY lang),
        |w AS (SELECT lang, n_h,
        |        sqrt(CAST(sx2 * n_h - CAST(sx AS HUGEINT) * sx
        |          AS DOUBLE)) AS w
        |      FROM s),
        |t AS (SELECT list_sum(list(w ORDER BY lang)) AS sw FROM w),
        |f AS (SELECT lang, n_h, w,
        |        CAST(1000.0 AS DOUBLE) * w / sw AS share
        |      FROM w, t),
        |b AS (SELECT lang, n_h, w, share,
        |        CAST(floor(share) AS BIGINT) AS base,
        |        share - floor(share) AS rem
        |      FROM f),
        |bs AS (SELECT SUM(base) AS bsum FROM b),
        |r AS (SELECT lang, n_h, w, base, rem, row_number() OVER (
        |        ORDER BY rem DESC, lang) AS rk FROM b)
        |SELECT lang, n_h, round(w, 6) AS weight,
        |  base + CASE WHEN rk <= 1000 - bsum
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS alloc
        |FROM r, bs ORDER BY lang""".stripMargin,
    // water-filling closed form: saturation is prefix-monotone over
    // capacity-sorted strata, so a running-min window finds the
    // breakpoint; all comparisons exact BIGINT, two final divisions
    "q114_unimax_alloc" ->
      """WITH sz AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sz
        |            FROM documents GROUP BY lang),
        |c AS (SELECT lang, sz, sz * 2 AS cap,
        |        (SELECT COUNT(*) FROM sz) AS m FROM sz),
        |o AS (SELECT *, row_number() OVER (ORDER BY cap, lang) AS rk,
        |        CAST(SUM(cap) OVER (ORDER BY cap, lang
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
        |      FROM c),
        |f AS (SELECT *, CASE WHEN cap * (m - rk + 1)
        |          <= 250000 - (prefix - cap)
        |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |          AS satflag FROM o),
        |g AS (SELECT *, MIN(satflag) OVER (ORDER BY rk
        |        ROWS UNBOUNDED PRECEDING) AS sat FROM f),
        |agg AS (SELECT CAST(SUM(sat) AS BIGINT) AS t,
        |          CAST(SUM(sat * cap) AS BIGINT) AS capsum FROM g)
        |SELECT lang, sz, cap, sat AS saturated,
        |  round(CASE WHEN sat = 1 THEN CAST(cap AS DOUBLE)
        |    ELSE CAST(250000 - capsum AS DOUBLE)
        |      / CAST(m - t AS DOUBLE) END, 6) AS alloc,
        |  round(CASE WHEN sat = 1 THEN CAST(cap AS DOUBLE)
        |    ELSE CAST(250000 - capsum AS DOUBLE)
        |      / CAST(m - t AS DOUBLE) END
        |    / CAST(sz AS DOUBLE), 6) AS epochs
        |FROM g, agg ORDER BY lang""".stripMargin,
    // DSIR: hashed-bigram bucket models (exact BIGINT counts), one ln
    // per bucket, per-doc sum folded in position order (q106 device)
    "q115_dsir_weights" -> {
      val nibbleSum = graft.ops.Curation.md5NibbleSumSql
      s"""WITH tok AS (SELECT doc_id, lang,
         |    unnest(string_split(text, ' ')) AS t,
         |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
         |  FROM documents),
         |g0 AS (SELECT t1.doc_id, t1.lang, t1.pos,
         |         md5('0|' || t1.t || ' ' || t2.t) AS h
         |       FROM tok t1 JOIN tok t2
         |         ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
         |hb AS (SELECT doc_id, lang, pos, ($nibbleSum) % 256 AS b
         |       FROM g0),
         |tc AS (SELECT b, COUNT(*) AS ct FROM hb WHERE lang = 'en'
         |       GROUP BY b),
         |tt AS (SELECT COUNT(*) AS tt FROM hb WHERE lang = 'en'),
         |qc AS (SELECT b, COUNT(*) AS cq FROM hb GROUP BY b),
         |qt AS (SELECT COUNT(*) AS qt FROM hb),
         |lr AS (SELECT q.b,
         |         ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE)
         |            / CAST(tt + 256 AS DOUBLE))
         |         - ln(CAST(cq + 1 AS DOUBLE)
         |            / CAST(qt + 256 AS DOUBLE)) AS lrv
         |       FROM qc q LEFT JOIN tc USING (b), tt, qt)
         |SELECT doc_id, COUNT(*) AS n_grams,
         |  round(list_sum(list(lrv ORDER BY pos)), 6) AS logw
         |FROM hb JOIN lr USING (b)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // bigram LM: exact counts, fixed parenthesization (explicit DOUBLE
    // lambdas — bare 0.7 is DECIMAL in DuckDB), position-ordered fold
    "q116_bigram_nll" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS t,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |uni AS (SELECT t, COUNT(*) AS c1 FROM tok GROUP BY t),
        |tot AS (SELECT COUNT(*) AS n FROM tok),
        |pr AS (SELECT t1.doc_id, t1.pos, t1.t AS a, t2.t AS b
        |       FROM tok t1 JOIN tok t2
        |         ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
        |bi AS (SELECT a, b, COUNT(*) AS c2 FROM pr GROUP BY a, b)
        |SELECT doc_id, round(list_sum(list(-ln(
        |    CAST(0.7 AS DOUBLE)
        |      * (CAST(c2 AS DOUBLE) / CAST(ua.c1 AS DOUBLE))
        |    + CAST(0.3 AS DOUBLE)
        |      * (CAST(ub.c1 AS DOUBLE) / CAST(n AS DOUBLE))
        |  ) ORDER BY pos)) / COUNT(*), 6) AS mean_nll
        |FROM pr JOIN bi USING (a, b)
        |  JOIN uni ua ON pr.a = ua.t
        |  JOIN uni ub ON pr.b = ub.t
        |  CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Zipf OLS on ln(rank)/ln(cnt) over a total-ordered top-K; all
    // four sums fold in rank order, slope/intercept share one
    // parenthesization with the Spark side
    "q117_zipf_fit" ->
      """WITH cnts AS (SELECT t, COUNT(*) AS cnt FROM
        |    (SELECT unnest(string_split(text, ' ')) AS t
        |     FROM documents) GROUP BY t),
        |top AS (SELECT t, cnt,
        |          row_number() OVER (ORDER BY cnt DESC, t) AS rk
        |        FROM cnts ORDER BY cnt DESC, t LIMIT 500),
        |xy AS (SELECT rk, ln(CAST(rk AS DOUBLE)) AS x,
        |         ln(CAST(cnt AS DOUBLE)) AS y FROM top),
        |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
        |        list_sum(list(x ORDER BY rk)) AS sx,
        |        list_sum(list(y ORDER BY rk)) AS sy,
        |        list_sum(list(x * y ORDER BY rk)) AS sxy,
        |        list_sum(list(x * x ORDER BY rk)) AS sxx FROM xy)
        |SELECT CAST(k AS BIGINT) AS n_terms,
        |  round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
        |  round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx)
        |    / k, 6) AS intercept
        |FROM s""".stripMargin,
    // PMI: ranking on the paired-division ratio (identical IEEE ops in
    // both engines), ln only in the displayed round-6 pmi
    "q118_pmi_collocations" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS t,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |uni AS (SELECT t, COUNT(*) AS c1 FROM tok GROUP BY t),
        |tot AS (SELECT COUNT(*) AS n FROM tok),
        |bi AS (SELECT t1.t AS a, t2.t AS b, COUNT(*) AS c2
        |       FROM tok t1 JOIN tok t2
        |         ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
        |       GROUP BY 1, 2),
        |r AS (SELECT a, b, c2 AS cnt,
        |        (CAST(c2 AS DOUBLE) / CAST(ua.c1 AS DOUBLE))
        |          * (CAST(n AS DOUBLE) / CAST(ub.c1 AS DOUBLE)) AS ratio
        |      FROM bi JOIN uni ua ON bi.a = ua.t
        |        JOIN uni ub ON bi.b = ub.t
        |      CROSS JOIN tot WHERE c2 >= 5),
        |top AS (SELECT * FROM r ORDER BY ratio DESC, a, b LIMIT 20)
        |SELECT a, b, cnt, round(ln(ratio), 6) AS pmi
        |FROM top ORDER BY pmi DESC, a, b""".stripMargin,
    // CCNet buckets: q116's nll CTE, md5-sampled rank cutoffs (q108
    // rank device on the ~25% sample), broadcast-compare labeling
    "q119_ppl_buckets" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS t,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |uni AS (SELECT t, COUNT(*) AS c1 FROM tok GROUP BY t),
        |tot AS (SELECT COUNT(*) AS n FROM tok),
        |pr AS (SELECT t1.doc_id, t1.pos, t1.t AS a, t2.t AS b
        |       FROM tok t1 JOIN tok t2
        |         ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
        |bi AS (SELECT a, b, COUNT(*) AS c2 FROM pr GROUP BY a, b),
        |nll AS (SELECT doc_id, round(list_sum(list(-ln(
        |      CAST(0.7 AS DOUBLE)
        |        * (CAST(c2 AS DOUBLE) / CAST(ua.c1 AS DOUBLE))
        |      + CAST(0.3 AS DOUBLE)
        |        * (CAST(ub.c1 AS DOUBLE) / CAST(n AS DOUBLE))
        |    ) ORDER BY pos)) / COUNT(*), 6) AS mean_nll
        |  FROM pr JOIN bi USING (a, b)
        |    JOIN uni ua ON pr.a = ua.t
        |    JOIN uni ub ON pr.b = ub.t
        |    CROSS JOIN tot
        |  GROUP BY doc_id),
        |samp AS (SELECT * FROM nll
        |         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |           <= '3f'),
        |rk AS (SELECT mean_nll, row_number() OVER (
        |         ORDER BY mean_nll, doc_id) AS rn,
        |         (SELECT COUNT(*) FROM samp) AS m FROM samp),
        |cuts AS (SELECT
        |    max(CASE WHEN rn = ceil(m / 3.0) THEN mean_nll END) AS c1,
        |    max(CASE WHEN rn = ceil((m * 2) / 3.0) THEN mean_nll END)
        |      AS c2 FROM rk),
        |lab AS (SELECT d.lang,
        |          CASE WHEN mean_nll <= c1 THEN 'head'
        |               WHEN mean_nll <= c2 THEN 'middle'
        |               ELSE 'tail' END AS bucket, mean_nll
        |        FROM nll JOIN documents d USING (doc_id), cuts)
        |SELECT lang, bucket, COUNT(*) AS n_docs,
        |  MIN(mean_nll) AS min_nll, MAX(mean_nll) AS max_nll
        |FROM lab GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    // funnel stages chain per-user min-ts aggregates; TIMESTAMP order
    // in DuckDB == nanos-BIGINT order in Spark, both exact
    "q120_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
        |t1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(ts) AS t2 FROM e
        |       JOIN t1 USING (user_id)
        |       WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(ts) AS t3 FROM e
        |       JOIN t2 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t2 GROUP BY 1),
        |t4 AS (SELECT e.user_id, min(ts) AS t4 FROM e
        |       JOIN t3 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t3 GROUP BY 1)
        |SELECT '1_signup' AS step, COUNT(*) AS n_users FROM t1
        |UNION ALL SELECT '2_view', COUNT(*) FROM t2
        |UNION ALL SELECT '3_click', COUNT(*) FROM t3
        |UNION ALL SELECT '4_purchase', COUNT(*) FROM t4
        |ORDER BY step""".stripMargin,
    // KMV: k-th smallest md5-nibble fraction per group, (k-1)/r_k,
    // exact-count fallback under k distinct values
    "q121_kmv_distinct" -> {
      val nibbleSum = graft.ops.Curation.md5NibbleSumSql
      s"""WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
         |f AS (SELECT event_type, user_id,
         |        CAST(($nibbleSum) AS DOUBLE) / 4294967296.0 AS fr
         |      FROM (SELECT event_type, user_id,
         |              md5(CAST(user_id AS VARCHAR)) AS h FROM u)),
         |r AS (SELECT event_type, user_id, fr, row_number() OVER (
         |        PARTITION BY event_type ORDER BY fr, user_id) AS rn
         |      FROM f),
         |g AS (SELECT event_type, COUNT(*) AS n_exact,
         |        max(CASE WHEN rn = 32 THEN fr END) AS rk
         |      FROM r GROUP BY 1)
         |SELECT event_type, n_exact,
         |  round(CASE WHEN rk IS NULL THEN CAST(n_exact AS DOUBLE)
         |    ELSE CAST(31 AS DOUBLE) / rk END, 6) AS kmv_est
         |FROM g ORDER BY event_type""".stripMargin
    },
    "q122_event_trigrams" ->
      """WITH s AS (SELECT user_id, event_type AS a,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS b,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS c
        |  FROM events)
        |SELECT a, b, c, COUNT(*) AS cnt FROM s WHERE c IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY cnt DESC, a, b, c LIMIT 10""".stripMargin,
    "q123_retention" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day
        |           FROM days GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  COUNT(*) AS n_users
        |FROM days JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    // unrolled 5-iteration CTE chain with the same floor-division
    // scaled-BIGINT arithmetic as the Spark loop
    "q124_pagerank" -> graft.ops.Graph.pageRankSql(iters = 5, k = 20),
    "q125_column_profile" -> graft.ops.Profiling.columnProfileSql,
    "q126_scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts,
        |             event_id FROM events),
        |f AS (SELECT user_id, event_type, ts, event_id,
        |        CASE WHEN lag(event_type) OVER w IS NULL
        |          OR lag(event_type) OVER w <> event_type
        |        THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY ts, event_id)),
        |v AS (SELECT user_id, event_type, ts,
        |        CAST(SUM(chg) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS BIGINT) AS version
        |      FROM f),
        |g AS (SELECT user_id, version, MIN(event_type) AS event_type,
        |        MIN(ts) AS valid_from, COUNT(*) AS n_events
        |      FROM v GROUP BY 1, 2)
        |SELECT user_id, version, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id
        |    ORDER BY version) AS valid_to,
        |  n_events
        |FROM g ORDER BY user_id, version""".stripMargin,
    "q127_basket_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
        |               FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |  COUNT(*) AS n_orders
        |FROM items a JOIN items b
        |  ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    // split-token semantics (len(string_split) counts empty tokens,
    // matching Spark's split), unrounded mean in the rule predicate
    "q128_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chars
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, tk, n_tokens,
        |    CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |      AS mean_raw,
        |    CAST(len(list_filter(tk,
        |        x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |      / CAST(n_tokens AS DOUBLE) AS alpha_frac,
        |    len(list_intersect(list_distinct(tk),
        |      ['the','and','of','to','in','a'])) AS n_stop_kinds
        |  FROM t WHERE n_tokens >= 1)
        |SELECT doc_id, n_tokens, round(mean_raw, 6) AS mean_wlen,
        |  CAST(CASE WHEN n_tokens BETWEEN 10 AND 100000
        |    THEN 1 ELSE 0 END AS BIGINT) AS r_len,
        |  CAST(CASE WHEN mean_raw BETWEEN 3.0 AND 10.0
        |    THEN 1 ELSE 0 END AS BIGINT) AS r_wlen,
        |  CAST(CASE WHEN alpha_frac >= 0.8
        |    THEN 1 ELSE 0 END AS BIGINT) AS r_alpha,
        |  CAST(CASE WHEN n_stop_kinds >= 2
        |    THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
        |  CAST(CASE WHEN (CASE WHEN n_tokens BETWEEN 10 AND 100000
        |      THEN 1 ELSE 0 END)
        |    + (CASE WHEN mean_raw BETWEEN 3.0 AND 10.0
        |      THEN 1 ELSE 0 END)
        |    + (CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END)
        |    + (CASE WHEN n_stop_kinds >= 2 THEN 1 ELSE 0 END) = 4
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "q130_join_size_est" -> graft.ops.Profiling.joinSizeEstimateSql,
    "q132_triangles" -> graft.ops.Graph.triangleCountSql(minSupport = 7),
    "q135_chi2_independence" ->
      graft.ops.Profiling.chiSquareIndependenceSql,
    "q139_winnowing_pairs" ->
      graft.ops.TextOps.winnowingNearDupPairsSql(),
    // frame sampling: video geometry is arithmetic on doc_id (kind =
    // id%3 -> 2 is video; duration = 1000 + id%10*500, a multiple of
    // the 500 ms stride, so DuckDB's end-exclusive range equals
    // Spark's sequence(0, duration-1, 500)); frame_idx floors
    // ts/1000*25 in exact-for-these-magnitudes doubles on both engines
    "q140_frame_sample" ->
      """WITH v AS (SELECT doc_id AS media_id,
        |             1000 + (doc_id % 10) * 500 AS duration_ms
        |           FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT media_id,
        |        unnest(range(0, duration_ms, 500)) AS ts_ms
        |      FROM v)
        |SELECT media_id, ts_ms,
        |  CAST(floor(ts_ms / 1000.0 * 25.0) AS BIGINT) AS frame_idx
        |FROM f ORDER BY media_id, ts_ms""".stripMargin,
    "q141_bfs_hops" -> graft.ops.Graph.bfsHopsSql(),
    "q142_sssp_cost" -> graft.ops.Graph.ssspCostSql(),
    "q143_ppr" -> graft.ops.Graph.personalizedPageRankSql(),
    "q144_novelty" -> graft.ops.TextOps.noveltyScoreSql,
    "q145_char_entropy" -> graft.ops.TextOps.charEntropySql,
    "q146_trend_slope" -> graft.ops.EventAnalytics.trendSlopeSql,
    "q147_clustering_coef" -> graft.ops.Graph.clusteringCoefficientSql(),
    "q148_node_jaccard" -> graft.ops.Graph.nodeJaccardSql(),
    "q149_adamic_adar" -> graft.ops.Graph.adamicAdarSql(),
    "q150_psi_drift" -> graft.ops.EventAnalytics.psiDriftSql,
    "q151_ks_test" -> graft.ops.Profiling.ksTestSql,
    "q152_heaps_fit" -> graft.ops.TextOps.heapsFitSql,
    "q153_sessions" -> graft.ops.EventAnalytics.sessionLengthsSql(),
    "q154_transitions" -> graft.ops.EventAnalytics.eventTransitionsSql,
    "q155_autocorr" -> graft.ops.EventAnalytics.lag1AutocorrSql,
    "q156_gini" -> graft.ops.Profiling.giniSpendSql,
    "q157_benford" -> graft.ops.Profiling.benfordDigitsSql,
    "q158_mann_whitney" -> graft.ops.Profiling.mannWhitneySql,
    "q159_rfm" -> graft.ops.Profiling.rfmSegmentsSql,
    "q160_mutual_info" -> graft.ops.Profiling.mutualInformationSql,
    "q161_constraints" -> graft.ops.Maintenance.constraintChecksSql,
    "q162_user_growth" -> graft.ops.EventAnalytics.userGrowthSql,
    "q163_corr_matrix" -> graft.ops.Profiling.corrMatrixSql,
    "q164_quantile_sketch" -> graft.ops.Sketches.quantileSketchSql(),
    "q165_jsd" -> graft.ops.TextOps.jsDivergenceSql(),
    "q166_winsorized" -> graft.ops.Profiling.winsorizedMeanSql,
    "q167_spearman" -> graft.ops.Profiling.spearmanSql,
    "q168_cramers_v" -> graft.ops.Profiling.cramersVSql,
    "q169_mad_outliers" -> graft.ops.Profiling.madOutliersSql,
    "q170_cohens_d" -> graft.ops.Profiling.cohensDSql,
    "q171_bootstrap_ci" -> graft.ops.Profiling.bootstrapCiSql(),
    "q172_welch_t" -> graft.ops.Profiling.welchTSql,
    "q173_grouped_hist" -> graft.ops.Profiling.groupedEquiDepthSql(),
    "q174_dau_wau" -> graft.ops.EventAnalytics.dauWauSql,
    "q175_wow_revenue" -> graft.ops.Temporal.weeklyRevenueGrowthSql,
    "q176_ltv_cohorts" -> graft.ops.Relational.ltvCohortsSql,
    "q179_sq8_fidelity" -> graft.ops.Pq.sq8FidelitySql,
    "q180_langid_eval" -> graft.ops.TextOps.langIdEvalSql,
    "q181_funnel_wilson" -> graft.ops.EventAnalytics.funnelWilsonSql(),
    "q182_order_gaps" -> graft.ops.Temporal.interOrderGapsSql,
    "q183_peak_hours" -> graft.ops.EventAnalytics.peakHoursSql,
    "q184_log_odds" -> graft.ops.TextOps.logOddsTermsSql(),
    "q185_quality_curve" -> graft.ops.TextOps.qualityTokenCurveSql,
    "q186_dup_rate" -> graft.ops.TextOps.dupRateOverTimeSql(),
    "q187_fertility" -> graft.ops.TextOps.tokenizerFertilitySql,
    "q188_lang_conflicts" -> graft.ops.TextOps.langConflictsSql,
    "q189_vocab_profile" -> graft.ops.TextOps.vocabProfileSql,
    "q190_label_cohesion" -> graft.ops.Pq.labelCohesionSql,
    "q191_pareto" -> graft.ops.Profiling.paretoShareSql,
    "q192_ship_latency" -> graft.ops.Temporal.shipLatencySql,
    "q193_market_share" -> graft.ops.Relational.nationMarketShareSql,
    "q194_local_rev" -> graft.ops.Relational.localSupplierRevenueSql(),
    "q195_top_returners" -> graft.ops.Relational.topReturnersSql(),
    "q196_trend_r2" -> graft.ops.EventAnalytics.trendR2Sql,
    "q197_quality_length" -> graft.ops.TextOps.qualityLengthGridSql,
    "q198_cluster_sizes" -> graft.ops.TextOps.dupClusterSizesSql,
    "q199_priority_mix" -> graft.ops.Temporal.priorityMixByMonthSql,
    "q200_corpus_card" -> graft.ops.TextOps.corpusCardSql,
    "q201_assortativity" -> graft.ops.Graph.assortativitySql(),
    "q202_kcore" -> graft.ops.Graph.kCoreSql(),
    "q203_local_cc" -> graft.ops.Graph.localClusteringSql(),
    "q204_harmonic" -> graft.ops.Graph.harmonicCentralitySql(),
    "q205_k_anonymity" -> graft.ops.Curation.kAnonymitySql(),
    "q206_l_diversity" -> graft.ops.Curation.lDiversitySql(),
    "q207_readability" -> graft.ops.TextOps.readabilityBandsSql,
    "q208_split_manifest" -> graft.ops.Curation.splitManifestSql,
    "q209_components" -> graft.ops.Graph.componentsSql(),
    "q210_modularity" -> graft.ops.Graph.modularitySql(),
    "q211_rich_club" -> graft.ops.Graph.richClubSql(),
    "q212_split_leakage" -> graft.ops.Curation.splitLeakageSql,
    "q213_lorenz" -> graft.ops.Profiling.lorenzDecilesSql,
    "q214_theil" -> graft.ops.Profiling.theilIndexSql,
    "q215_twonn_id" -> graft.ops.Similarity.twoNnDimensionSql(),
    "q216_fano" -> graft.ops.EventAnalytics.fanoBurstinessSql,
    "q217_hubness" -> graft.ops.Similarity.knnHubnessSql(),
    "q218_tpch_q3" -> graft.ops.Relational.shippingPrioritySql(),
    "q219_tpch_q7" -> graft.ops.Relational.bilateralVolumeSql(),
    "q220_powerlaw" -> graft.ops.Graph.degreePowerLawSql(),
    "q221_eigenvector" -> graft.ops.Graph.eigenvectorCentralitySql(),
    "q222_atkinson" -> graft.ops.Profiling.atkinsonIndexSql,
    "q223_butterflies" -> graft.ops.Graph.butterflyCensusSql(),
    "q224_weighted_pagerank" -> graft.ops.Graph.weightedPageRankSql(),
    "q225_ktruss" -> graft.ops.Graph.kTrussSql(),
    "q226_hits" -> graft.ops.Graph.hitsScoresSql(),
    "q227_lpa" -> graft.ops.Graph.lpaCommunitiesSql(),
    "q228_linkpred_pa_ra" -> graft.ops.Graph.linkPredPaRaSql(),
    "q229_hard_negatives" -> graft.ops.Similarity.hardNegativesSql(),
    "q230_kneser_ney" -> graft.ops.TextOps.kneserNeyBigramsSql(),
    "q231_kmv_jaccard" -> graft.ops.Sketches.kmvSourceJaccardSql(),
    "q232_tpch_q13" ->
      graft.ops.Relational.orderCountDistributionSql(),
    "q233_tpch_q18" -> graft.ops.Relational.largeVolumeOrdersSql(),
    "q234_tpch_q21" -> graft.ops.Relational.soleLateSupplierSql(),
    "q235_tpch_q22" -> graft.ops.Relational.dormantHighBalanceSql(),
    "q236_containment" -> graft.ops.Curation.containmentPairsSql(),
    "q237_vocab_coverage" -> graft.ops.TextOps.vocabCoverageSql(),
    "q238_centroid_dist" -> graft.ops.Pq.centroidDistancesSql,
    "q239_mmr" -> graft.ops.Similarity.mmrTopKSql(),
    "q240_jl_distortion" -> graft.ops.Similarity.jlDistortionSql(),
    "q241_out_of_order" ->
      graft.ops.EventAnalytics.outOfOrderCensusSql,
    "q242_diameter" -> graft.ops.Graph.diameterSweepSql(),
    "q243_pruning_audit" -> graft.ops.Maintenance.pruningAuditSql(),
    "q244_epoch_waterfill" -> graft.ops.Curation.epochWaterfillSql(),
    "q245_priority_sample" -> graft.ops.Curation.prioritySampleSql(),
    "q246_containment_clusters" ->
      graft.ops.Curation.containmentClustersSql(),
    "q247_dedup_roi" -> graft.ops.Curation.dedupRoiCurveSql(),
    "q248_tpch_q4" -> graft.ops.Relational.priorityLateOrdersSql(),
    "q249_label_scatter" -> graft.ops.Pq.withinLabelScatterSql,
    "q250_simhash_calibration" ->
      s"""WITH ${simhash60Ctes()},
         |pr AS (SELECT * FROM (
         |  ${graft.ops.Curation.charJaccardVerifiedPairsSql}) q),
         |j AS (SELECT
         |    CAST(floor(pr.jaccard_est * 10.0 + 1e-9) AS BIGINT)
         |      AS jaccard_decile,
         |    CAST(bit_count(xor(a.simhash60, b.simhash60)) AS BIGINT)
         |      AS hamming
         |  FROM pr JOIN sk a ON a.doc_id = pr.id_a
         |  JOIN sk b ON b.doc_id = pr.id_b)
         |SELECT jaccard_decile, COUNT(*) AS n_pairs,
         |  round(CAST(SUM(hamming) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_hamming,
         |  CAST(MIN(hamming) AS BIGINT) AS min_hamming,
         |  CAST(MAX(hamming) AS BIGINT) AS max_hamming
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q251_tpch_q2" -> graft.ops.Relational.minCostSupplierSql(),
    "q252_tpch_q6" -> graft.ops.Relational.forecastRevenueChangeSql(),
    "q253_tpch_q8" -> graft.ops.Relational.marketShareSql(),
    "q254_return_rate" -> graft.ops.Relational.returnRateByNationSql,
    "q255_tpch_q11" -> graft.ops.Relational.importantPartsSql(),
    "q256_tpch_q14" -> graft.ops.Relational.promoRevenueShareSql(),
    "q257_tpch_q15" -> graft.ops.Relational.topSupplierSql(),
    "q258_tpch_q16" -> graft.ops.Relational.supplierClassCensusSql(),
    "q259_tpch_q17" -> graft.ops.Relational.smallQuantityRevenueSql(),
    "q260_tpch_q19" -> graft.ops.Relational.disjunctiveRevenueSql,
    "q261_tpch_q20" -> graft.ops.Relational.bigShipperSuppliersSql(),
    "q262_classifier_hist" ->
      graft.ops.TextOps.classifierScoreHistogramSql(),
    "q263_split_kl" -> graft.ops.TextOps.splitKlDivergenceSql,
    "q264_tpch_q9" -> graft.ops.Relational.productProfitSql(),
    "q265_tpch_q12" -> graft.ops.Relational.lateShipmentCensusSql(),
    "q266_value_moments" -> graft.ops.Profiling.valueMomentsSql,
    "q267_basket_rules" -> graft.ops.Graph.basketRulesSql(),
    "q268_rrf_fusion" ->
      rrfFusionSql(Seq("spark", "hash", "window"), 50, 60, 20),
    "q177_supplier_hhi" -> graft.ops.Relational.supplierHhiSql,
    "q178_windowed_funnel" ->
      graft.ops.EventAnalytics.windowedFunnelSql(),
    // winnowing mirror: same md5-nibble gram hashes, per-window argmin
    // via ORDER BY gh, p DESC = Spark's min(struct(gh, -p))
    "q138_winnowing" -> {
      val nibbleSum = graft.ops.Curation.md5NibbleSumSql
      s"""WITH tok AS (SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS t,
         |    unnest(range(0, len(string_split(text, ' ')))) AS p
         |  FROM documents),
         |g0 AS (SELECT t0.doc_id, t0.p,
         |         md5(t0.t || ' ' || t1.t || ' ' || t2.t) AS h
         |       FROM tok t0
         |       JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
         |       JOIN tok t2 ON t2.doc_id = t0.doc_id AND t2.p = t0.p + 2),
         |grams AS (SELECT doc_id, p, ($nibbleSum) AS gh FROM g0),
         |mx AS (SELECT doc_id, MAX(p) AS mp FROM grams GROUP BY 1),
         |wins AS (SELECT g.doc_id, g.p AS start FROM grams g
         |         JOIN mx USING (doc_id) WHERE g.p <= mp - 3),
         |cand AS (SELECT w.doc_id, w.start, g.p, g.gh,
         |           row_number() OVER (PARTITION BY w.doc_id, w.start
         |             ORDER BY g.gh, g.p DESC) AS rn
         |         FROM wins w JOIN grams g ON g.doc_id = w.doc_id
         |           AND g.p BETWEEN w.start AND w.start + 3),
         |sel AS (SELECT DISTINCT doc_id, p, gh FROM cand WHERE rn = 1),
         |ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1)
         |SELECT s.doc_id, ng.n_grams, COUNT(*) AS n_selected,
         |  CAST(SUM(gh & 4294967295) AS BIGINT) AS fp_checksum
         |FROM sel s JOIN ng USING (doc_id)
         |GROUP BY s.doc_id, ng.n_grams ORDER BY doc_id""".stripMargin
    },
    "q136_conversion_latency" ->
      """WITH t1 AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |lat AS (SELECT e.user_id,
        |          min(epoch_ns(ts) - t1) // 1000000000 AS lat_s
        |        FROM events e JOIN t1 USING (user_id)
        |        WHERE event_type = 'purchase' AND epoch_ns(ts) > t1
        |        GROUP BY 1),
        |r AS (SELECT lat_s, row_number() OVER (
        |        ORDER BY lat_s, user_id) AS rn,
        |        COUNT(*) OVER () AS n
        |      FROM lat)
        |SELECT CAST(max(n) AS BIGINT) AS n_converted,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |    THEN lat_s END) AS p50_s,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
        |    THEN lat_s END) AS p90_s,
        |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
        |    THEN lat_s END) AS p99_s
        |FROM r""".stripMargin,
    "q137_ewma_level" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |per AS (SELECT event_type,
        |          list(CAST(cnt AS DOUBLE) ORDER BY hour) AS xs
        |        FROM hourly GROUP BY 1)
        |SELECT event_type, CAST(len(xs) AS INT) AS n_buckets,
        |  round(list_reduce(xs, (acc, x) ->
        |    CAST(0.25 AS DOUBLE) * x + CAST(0.75 AS DOUBLE) * acc), 6)
        |    AS ewma_level
        |FROM per ORDER BY event_type""".stripMargin,
    // z^2 > 9 with denominators cleared: |c*n - total|^2 vs
    // 9*(n*sumsq - total^2); quadratic terms in HUGEINT, mirroring
    // the Spark side's DECIMAL(38,0) — both exact 128-bit paths
    "q134_anomaly_hours" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(cnt) AS BIGINT) AS total,
        |    SUM(CAST(cnt AS HUGEINT) * cnt) AS sumsq
        |  FROM hourly GROUP BY 1)
        |SELECT h.event_type, h.hour, h.cnt
        |FROM hourly h JOIN stats s USING (event_type)
        |WHERE s.n >= 2
        |  AND (CAST(h.cnt AS HUGEINT) * s.n - s.total)
        |    * (CAST(h.cnt AS HUGEINT) * s.n - s.total)
        |    > 9 * (s.n * s.sumsq - CAST(s.total AS HUGEINT) * s.total)
        |ORDER BY h.event_type, h.hour""".stripMargin,
    "q133_equidepth_hist" ->
      graft.ops.Profiling.equiDepthHistogramSql(buckets = 10),
    "q131_fuzzy_pairs" ->
      graft.ops.Linkage.fuzzyNamePairsSql(maxDist = 2, k = 50),
    "q129_degree_profile" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS cnode,
        |         l_suppkey * 2 + 1 AS snode
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT cnode AS src, snode AS dst FROM pairs
        |  UNION ALL SELECT snode AS src, cnode AS dst FROM pairs),
        |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1)
        |SELECT CASE WHEN src % 2 = 0 THEN 'c' ELSE 's' END AS side,
        |  deg, COUNT(*) AS n_nodes
        |FROM deg GROUP BY 1, 2 ORDER BY side, deg""".stripMargin,
    // Count-Min matrix + probe, cell-for-cell: the nibble decode of
    // md5('j|' || term) addresses the same (j, bucket) cells as the
    // Spark side, estimates are min over the term's 4 cells
    "q92_cms_estimate" -> {
      val nibbleSum = graft.ops.Curation.md5NibbleSumSql
      val branches = (0 until 4).map(j =>
        s"SELECT term, $j AS j, md5('$j|' || term) AS h FROM toks")
        .mkString("\n  UNION ALL ")
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |hx AS (
         |  $branches),
         |hb AS (SELECT term, j, ($nibbleSum) % 256 AS bucket FROM hx),
         |matrix AS (SELECT j, bucket, count(*) AS c FROM hb GROUP BY 1, 2),
         |top AS (SELECT term, count(*) AS n_exact FROM toks GROUP BY 1
         |        ORDER BY n_exact DESC, term LIMIT 20),
         |pb AS (SELECT DISTINCT term, j, bucket FROM hb)
         |SELECT t.term, t.n_exact, CAST(min(m.c) AS BIGINT) AS n_cms
         |FROM top t JOIN pb p USING (term) JOIN matrix m USING (j, bucket)
         |GROUP BY t.term, t.n_exact
         |ORDER BY t.n_exact DESC, t.term""".stripMargin
    },
    // normalize-then-hash fingerprint, nibble-decoded 60-bit key:
    // q91 is the bare family, q41 the seeded ("fp1|") one
    "q91_fingerprint_md5" -> fingerprintMd5Sql(""),
    "q41_fingerprint" -> fingerprintMd5Sql("fp1|"),
    "q71_lsh_banded_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents),
        |grams AS (SELECT doc_id,
        |            unnest(list_transform(range(1, len(tk) - 1),
        |              i -> array_to_string(tk[i:i+2], ' '))) AS g
        |          FROM toks WHERE len(tk) >= 3),
        |sig AS (SELECT doc_id,
        |          min(md5('0|' || g)) AS s0, min(md5('1|' || g)) AS s1,
        |          min(md5('2|' || g)) AS s2, min(md5('3|' || g)) AS s3,
        |          min(md5('4|' || g)) AS s4, min(md5('5|' || g)) AS s5,
        |          min(md5('6|' || g)) AS s6, min(md5('7|' || g)) AS s7
        |        FROM grams GROUP BY doc_id),
        |banded0 AS (
        |  SELECT doc_id, 0 AS band, md5('0' || '|' || s0 || '|' || s1) AS bkey FROM sig
        |  UNION ALL
        |  SELECT doc_id, 1, md5('1' || '|' || s2 || '|' || s3) FROM sig
        |  UNION ALL
        |  SELECT doc_id, 2, md5('2' || '|' || s4 || '|' || s5) FROM sig
        |  UNION ALL
        |  SELECT doc_id, 3, md5('3' || '|' || s6 || '|' || s7) FROM sig),
        |banded AS (
        |  SELECT doc_id, band, bkey FROM (
        |    SELECT doc_id, band, bkey,
        |      COUNT(*) OVER (PARTITION BY band, bkey) AS bsz
        |    FROM banded0) s
        |  WHERE bsz <= 1000)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
        |FROM banded a
        |JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
        |  AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    "q72_simhash_md5" ->
      s"WITH ${simhash60Ctes()}\nSELECT doc_id, simhash60 FROM sk ORDER BY doc_id",
    // q40: the seeded sketch family (domain "sh|"), same CTE chain
    "q40_simhash" ->
      s"WITH ${simhash60Ctes("sh|")}\nSELECT doc_id, simhash60 FROM sk ORDER BY doc_id",
    "q86_simhash_md5_pairs" -> simhashPairsSql(""),
    // q48: pigeonhole pairs over the seeded sketch family
    "q48_simhash_pairs" -> simhashPairsSql("sh|"),
    // q38/q39: banded-candidates + exact-Jaccard-verify pipelines
    "q38_minhash_pairs" -> Curation.minhashVerifiedPairsSql,
    "q39_ngram_jaccard_pairs" -> Curation.charJaccardVerifiedPairsSql,
    "q73_cube_status" ->
      s"""SELECT COALESCE(status, 'ALL') AS status,
         |  COALESCE(prio, 'ALL') AS prio,
         |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
         |FROM (SELECT o_orderstatus AS status,
         |        substr(o_orderpriority, 1, 1) AS prio, o_totalprice
         |      FROM orders) t
         |GROUP BY CUBE (status, prio)
         |ORDER BY status, prio""".stripMargin,
    "q74_above_cust_avg" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
        |    (SELECT COUNT(*) FROM orders i
        |     WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,4)))
        |     FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q75_spend_ranks" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(10) OVER w AS BIGINT) AS decile
        |FROM (SELECT * FROM orders WHERE o_orderkey % 37 = 0) t
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q76_doc_chunks" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents),
        |c AS (SELECT doc_id, tk,
        |        unnest(range(0, (len(tk) - 1) // 24 + 1)) AS chunk_id
        |      FROM toks)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  array_to_string(tk[chunk_id * 24 + 1 :
        |    least(chunk_id * 24 + 32, len(tk))], ' ') AS chunk_text,
        |  CAST(least(chunk_id * 24 + 32, len(tk)) - chunk_id * 24
        |    AS BIGINT) AS n_tok
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q77_temperature_mix" ->
      ("""WITH c AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY 1),
         |m AS (SELECT MIN(n_s) AS min_n FROM c),
         |r AS (SELECT lang,
         |        sqrt(CAST(min_n AS DOUBLE) / CAST(n_s AS DOUBLE)) AS rate
         |      FROM c, m),
         |h AS (SELECT doc_id, lang,
         |        md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents)
         |SELECT doc_id, lang FROM h JOIN r USING (lang)
         |WHERE CAST(("""
        + (1 to 8).map { i =>
            val d = s"substr(hh, $i, 1)"
            s"CAST(ascii($d) - CASE WHEN $d <= '9' THEN 48 ELSE 87 END " +
              s"AS BIGINT) * ${1L << (4 * (8 - i))}"
          }.mkString(" + ")
        + """) AS DOUBLE) / 4294967296.0 < rate
          |ORDER BY doc_id""".stripMargin).stripMargin,
    // A-ES weighted sample: the ln(u)/w priority mirrors the Spark
    // side's md5-decoded 32-bit uniform bit-for-bit; the priority is
    // window-internal (never output), so the hash compares the
    // selected SET, not last-ulp libm values
    "q95_weighted_sample" ->
      ("""WITH h AS (SELECT doc_id, lang, n_chars,
         |        md5('ws|' || CAST(doc_id AS VARCHAR)) AS hh
         |      FROM documents),
         |p AS (SELECT doc_id, lang, n_chars,
         |        ln(CAST(("""
        + (1 to 8).map { i =>
            val d = s"substr(hh, $i, 1)"
            s"CAST(ascii($d) - CASE WHEN $d <= '9' THEN 48 ELSE 87 END " +
              s"AS BIGINT) * ${1L << (4 * (8 - i))}"
          }.mkString(" + ")
        + """) AS DOUBLE) / 4294967296.0)
          |          / CAST(greatest(n_chars, 1) AS DOUBLE) AS pri
          |      FROM h),
          |r AS (SELECT doc_id, lang, n_chars,
          |        row_number() OVER (PARTITION BY lang
          |          ORDER BY pri DESC, doc_id) AS rn
          |      FROM p)
          |SELECT doc_id, lang, n_chars FROM r WHERE rn <= 5
          |ORDER BY lang, doc_id""".stripMargin).stripMargin,
    "q78_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents),
        |i AS (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
        |      FROM toks WHERE len(tk) >= 2),
        |g AS (SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS gram FROM i),
        |c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id,
        |  round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
        |    AS dup2_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q79_budget_fill" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT)
        |      AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM t)
        |SELECT doc_id, source, n_tok,
        |  CAST(cum_before + n_tok AS BIGINT) AS cum_tok
        |FROM c WHERE cum_before < 3000 ORDER BY doc_id""".stripMargin,
    "q80_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT)
        |      AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS s
        |  FROM t WHERE n_tok >= 1),
        |b AS (SELECT doc_id, source, s, n_tok,
        |    unnest(range(s // 512, (s + n_tok - 1) // 512 + 1)) AS bin
        |  FROM c)
        |SELECT source, CAST(bin AS BIGINT) AS bin_id, doc_id,
        |  CAST(least(s + n_tok, (bin + 1) * 512)
        |    - greatest(s, bin * 512) AS BIGINT) AS n_in_bin
        |FROM b ORDER BY source, bin_id, doc_id""".stripMargin,
    "q81_cluster_split" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (SELECT doc_id,
        |            unnest(list_transform(range(1, len(tk) - 1),
        |              i -> array_to_string(tk[i:i+2], ' '))) AS g
        |          FROM toks WHERE len(tk) >= 3),
        |sig AS (SELECT doc_id, min(md5('0|' || g)) AS s0
        |        FROM grams GROUP BY doc_id),
        |edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
        |          FROM sig a JOIN sig b ON a.s0 = b.s0
        |          WHERE a.doc_id <> b.doc_id),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |lab AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster
        |        FROM reach GROUP BY id)
        |SELECT doc_id, cluster,
        |  CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 2) <= '28'
        |       THEN 'heldout' ELSE 'train' END AS split
        |FROM lab ORDER BY doc_id""".stripMargin,
    "q82_zorder_key" -> {
      val terms = (0 until 16).flatMap { j => Seq(
        s"((((l_partkey & 65535) >> $j) & 1) << ${2 * j})",
        s"((((l_suppkey & 65535) >> $j) & 1) << ${2 * j + 1})") }
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(${terms.mkString("\n    + ")} AS BIGINT) AS zkey
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "q83_keep_best" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (SELECT doc_id,
        |            unnest(list_transform(range(1, len(tk) - 1),
        |              i -> array_to_string(tk[i:i+2], ' '))) AS g
        |          FROM toks WHERE len(tk) >= 3),
        |sig AS (SELECT doc_id, min(md5('0|' || g)) AS s0
        |        FROM grams GROUP BY doc_id),
        |edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
        |          FROM sig a JOIN sig b ON a.s0 = b.s0
        |          WHERE a.doc_id <> b.doc_id),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |lab AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster
        |        FROM reach GROUP BY id),
        |q AS (
        |  SELECT doc_id, round(
        |    CAST(0.4 AS DOUBLE) * least(n_tokens / CAST(100.0 AS DOUBLE),
        |      CAST(1.0 AS DOUBLE))
        |    + CAST(0.3 AS DOUBLE) * (n_uniq / n_tokens)
        |    + CAST(0.3 AS DOUBLE) * least((n_stop / n_tokens)
        |      * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)), 6) AS quality
        |  FROM (
        |    SELECT doc_id,
        |      CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE)
        |        AS n_tokens,
        |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        AS n_uniq,
        |      CAST(len(list_filter(string_split(text, ' '),
        |        x -> list_contains(['the','a','and','of','to','in'], x)))
        |        AS DOUBLE) AS n_stop
        |    FROM documents))
        |SELECT doc_id, cluster, quality FROM (
        |  SELECT lab.doc_id, lab.cluster, q.quality,
        |    row_number() OVER (PARTITION BY lab.cluster
        |      ORDER BY q.quality DESC, lab.doc_id) AS rn
        |  FROM lab JOIN q ON lab.doc_id = q.doc_id)
        |WHERE rn = 1 ORDER BY cluster""".stripMargin,
    "q84_knn_join" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |p AS (SELECT q.q_id, e.vec_id, round(
        |    list_sum(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
        |    / nullif(
        |        sqrt(list_sum(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(qe,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
        |        CAST(0.0 AS DOUBLE)),
        |    6) AS cosine
        |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, vec_id) AS rank
        |  FROM p)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine
        |FROM r WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "q88_cosine_pairs_exact" ->
      """SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(
        |      list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE)
        |           * CAST(b.embedding[i] AS DOUBLE)))
        |      / nullif(
        |          sqrt(list_sum(list_transform(a.embedding,
        |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |          * sqrt(list_sum(list_transform(b.embedding,
        |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
        |          CAST(0.0 AS DOUBLE)),
        |      6) AS cosine
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
        |WHERE cosine >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,
    "q85_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
        |d AS (SELECT DISTINCT b.vec_id
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE)
        |         * CAST(b.embedding[i] AS DOUBLE)))
        |    / nullif(
        |        sqrt(list_sum(list_transform(a.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(b.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
        |        CAST(0.0 AS DOUBLE)),
        |    6) >= 0.3)
        |SELECT vec_id, label FROM e
        |WHERE vec_id NOT IN (SELECT vec_id FROM d)
        |ORDER BY vec_id""".stripMargin,
  )
}
