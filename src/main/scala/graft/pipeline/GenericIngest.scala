package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.Exprs
import graft.parse.GraftFunctions

/** The generic-ingest dataflow (reference E2, scraper.py:154-275,
  * 335-393) as one declarative Spark pipeline:
  *
  *   config scan (S1) -> listing pages -> parse_html (P24) -> href
  *   prefix filter (F1) -> uuid/date projection (P1/P2) -> validity
  *   (F6) -> date-mode predicate (F3) -> first-seen dedup (D1) ->
  *   per-municipality limit (L1/L3) -> canonical naming (P7/J2) ->
  *   anti-join against sink inventory (J1/K5) -> partitioned sink (K1).
  *
  * Hermetic: "portals" are HTML files named `{municipality}.html` in
  * `portalDir` (the live-HTTP connector plugs in behind the same
  * DataFrame, SURVEY.md §7.2). Idempotent: re-running against the same
  * sink ingests nothing (K5 exactly-once semantics via bulk inventory
  * listing + left_anti — never per-key existence probes).
  *
  * Scale shape: one shuffle for the per-URL dedup window, one for the
  * anti-join. The inventory grows with everything ever written —
  * corpus-proportional over the crawl's lifetime — so its join
  * strategy is left to stats/AQE (broadcast while it fits, shuffle
  * anti-join once it doesn't) rather than a forced hint; everything
  * else is scan-local projection. Discovery order is an explicit
  * column, never an implicit row order.
  */
object GenericIngest {

  val committeeSuffix: Map[String, String] = Map(
    "Oekonomi" -> "", "Teknik" -> "-teknikmiljoe",
    "Byraad" -> "-byraad", "Plan" -> "-plan")

  /** S1: CSV config scan with header mapping + trim
    * (scraper.py:278-298). */
  def readConfigs(spark: SparkSession, csvPath: String): DataFrame =
    spark.read.option("header", "true").csv(csvPath)
      .select(
        trim(col("Base URL")).as("base_url"),
        trim(col("Start URL")).as("start_url"))
      .filter(col("base_url").isNotNull && (col("base_url") =!= ""))
      .withColumn("municipality", Exprs.municipalityFromUrl(col("base_url")))

  /** Listing pages as (municipality, html) — one file per portal. */
  def readPortalPages(spark: SparkSession, portalDir: String): DataFrame =
    spark.read.option("wholetext", "true").text(portalDir)
      .withColumn("municipality",
        regexp_extract(input_file_name(), "([^/]+)\\.html$", 1))
      .withColumnRenamed("value", "html")

  /** The candidate-document table for one committee source. */
  def candidates(spark: SparkSession, configCsv: String, portalDir: String,
      committee: String, mode: String, limitPerMuni: Int,
      today: java.sql.Date): DataFrame = {
    GraftFunctions.register(spark)
    val configs = readConfigs(spark, configCsv)
    val pages = readPortalPages(spark, portalDir)
      // only configured municipalities are scraped (F4/J4 semantics)
      .join(broadcast(configs.select("municipality", "base_url")),
        Seq("municipality"), "inner")

    val links = pages
      .selectExpr("municipality", "base_url", "parse_html(html, 'a')")
      .select(col("municipality"), col("base_url"),
        col("pos").as("discovery_idx"), col("href"), col("text"))
      .filter(col("href").startsWith("/vis?Referat-")) // F1+F2

    val projected = links
      .withColumn("url", Exprs.urlJoin(col("base_url"), col("href")))
      .withColumn("doc_uuid", Exprs.extractUuid(col("url")))
      .withColumn("meeting_date",
        Exprs.extractUrlDate(Exprs.urlPercentDecode(col("url"))))
      .filter(col("doc_uuid").isNotNull) // F6
      // F3: NEW keeps today-or-later (null dates pass, scraper_utils.py:72-87)
      .filter(
        if (mode == "NEW") col("meeting_date").isNull ||
          col("meeting_date") >= lit(today)
        else lit(true))

    // D1: first-seen per URL in discovery order; then L3: the limit
    // budget counts only surviving rows, per municipality.
    val dedupW = Window.partitionBy(col("municipality"), col("url"))
      .orderBy(col("discovery_idx"))
    val limitW = Window.partitionBy(col("municipality"))
      .orderBy(col("discovery_idx"))
    projected
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .withColumn("k", row_number().over(limitW))
      .filter(col("k") <= limitPerMuni)
      .withColumn("committee", lit(committee))
      .withColumn("filename", Exprs.sanitizeFilename(
        Exprs.canonicalFilename(col("meeting_date"), col("municipality"),
          lit("oekonomiudvalget"), col("doc_uuid"))))
      .withColumn("bucket", concat(lit("raw-files-"),
        regexp_replace(col("municipality"), "_", "-"),
        lit(committeeSuffix.getOrElse(committee, ""))))
      .select("municipality", "committee", "discovery_idx", "url",
        "doc_uuid", "meeting_date", "filename", "bucket")
  }

  /** Connector-backed ingest (E2 over the DSv2 `meetinglist` source):
    * the date bound and per-source limit push INTO the crawl
    * (SupportsPushDownFilters/Limit — older pages are never opened),
    * then the same naming/anti-join/fetch/sink tail as [[run]]. */
  def runFromConnector(spark: SparkSession, portalDir: String,
      sinkDir: String, committee: String = "Oekonomi",
      minDate: Option[java.sql.Date] = None,
      fetcher: graft.fetch.Fetch.Fetcher = graft.fetch.Fetch.StaticFetcher())
      : Long = {
    val cand = connectorCandidates(spark, portalDir, committee, minDate)
    val todo = cand.join(inventory(spark, sinkDir),
      Seq("filename"), "left_anti")
    val fetched = graft.fetch.Fetch.fetchBinary(todo, "url", fetcher)
      .filter(col("status") < 400)
      .drop("status", "content_type")
      .persist() // one crawl serves both the count and the write
    try {
      val n = fetched.count()
      if (n > 0) {
        fetched.write.mode("append")
          .partitionBy("municipality", "committee").parquet(sinkDir)
      }
      n
    } finally fetched.unpersist()
  }

  /** The connector-backed candidate plan [[runFromConnector]] fetches
    * and sinks: DSv2 `meetinglist` scan (date bound and limits push
    * into the crawl) -> validity filter -> canonical naming ->
    * first-seen dedup by filename. Split from the action so plan
    * sweeps (ScaleInvariantsSpec) audit the exact dataflow a
    * production run executes. */
  def connectorCandidates(spark: SparkSession, portalDir: String,
      committee: String = "Oekonomi",
      minDate: Option[java.sql.Date] = None): DataFrame = {
    val base = spark.read.format("meetinglist")
      .option("assumeSortedDesc", "true").load(portalDir)
    val bounded = minDate match {
      case Some(d) => base.filter(col("meeting_date") >= lit(d))
      case None => base
    }
    bounded
      .filter(col("doc_uuid").isNotNull)
      .withColumn("committee", lit(committee))
      .withColumn("filename", graft.expr.Exprs.sanitizeFilename(
        graft.expr.Exprs.canonicalFilename(col("meeting_date"),
          col("municipality"), lit("oekonomiudvalget"), col("doc_uuid"))))
      .dropDuplicates("filename")
  }

  /** Bulk sink inventory (J1's right side): list once, never probe
    * per key (contra reference scraper.py:212-219 head_object loop). */
  def inventory(spark: SparkSession, sinkDir: String): DataFrame = {
    val p = new java.io.File(sinkDir)
    if (!p.exists()) spark.emptyDataFrame.withColumn("filename", lit(""))
      .select("filename").limit(0)
    else spark.read.parquet(sinkDir).select("filename").distinct()
  }

  /** One ingest run: returns the number of newly-ingested documents.
    * Content acquisition goes through the pluggable [[graft.fetch.Fetch.Fetcher]]
    * (per-partition client; hermetic StaticFetcher by default); fetch
    * failures become K7 error side output instead of aborting the run. */
  def run(spark: SparkSession, configCsv: String, portalDir: String,
      sinkDir: String, committee: String = "Oekonomi",
      mode: String = "ALL", limitPerMuni: Int = 100,
      today: java.sql.Date = java.sql.Date.valueOf("2024-01-01"),
      metricsOut: scala.collection.mutable.Map[String, Long] = null,
      fetcher: graft.fetch.Fetch.Fetcher = graft.fetch.Fetch.StaticFetcher(),
      errDir: String = null): Long = {
    val cand = candidates(spark, configCsv, portalDir, committee, mode,
      limitPerMuni, today)
    // A2 progress counters (run_scrapers.py:90-97 tallies) as an
    // `observe` — zero-cost piggyback on the action, no extra pass.
    val obs = new org.apache.spark.sql.Observation()
    val observed = cand.observe(obs,
      count(lit(1)).as("n_candidates"),
      count(col("meeting_date")).as("n_dated"))
    val todo = observed.join(inventory(spark, sinkDir),
      Seq("filename"), "left_anti")
    // acquire AFTER all filters + the anti-join — never fetch a
    // document that would be discarded (the reference's explicit
    // "filter before download" rule, scraper.py:101-105, enforced by
    // plan construction)
    val fetched = graft.fetch.Fetch.fetchBinary(todo, "url", fetcher)
      .persist()
    try {
      val (ok, errs) = graft.fetch.Fetch.partitionByStatus(fetched)
      val n = ok.count()
      if (metricsOut != null) {
        obs.get.foreach { case (k, v) =>
          metricsOut(k) = v.asInstanceOf[Long] }
        metricsOut("n_ingested") = n
        metricsOut("n_fetch_errors") = fetched.count() - n
      }
      if (errDir != null && fetched.count() - n > 0) {
        errs.write.mode("append").parquet(errDir) // K7 side output
      }
      if (n > 0) {
        ok.drop("status", "content_type")
          .write.mode("append")
          .partitionBy("municipality", "committee")
          .parquet(sinkDir)
      }
      n
    } finally fetched.unpersist()
  }
}
