package graft

import java.nio.file.Files

import graft.pipeline.GenericIngest

/** End-to-end tests for the generic-ingest dataflow (E2) against the
  * fixture portals: parse -> project -> filter -> dedup -> limit ->
  * anti-join -> partitioned sink, incl. idempotent re-run (K5). */
class PipelineSpec extends SparkTestBase {

  private val csv = "src/test/resources/fixtures/municipalities.csv"
  private val portals = "src/test/resources/fixtures/portals"

  private def tmpSink(): String =
    Files.createTempDirectory("graft_sink_").resolve("docs").toString

  test("config scan trims whitespace and derives municipality (S1/P10)") {
    val configs = GenericIngest.readConfigs(spark, csv).collect()
    assert(configs.length == 2)
    val munis = configs.map(_.getAs[String]("municipality")).sorted
    assert(munis.sameElements(Array("aarhus", "silkeborg")))
    // trailing whitespace in the fixture start_url must be gone
    assert(configs.forall(r => r.getAs[String]("start_url") ==
      r.getAs[String]("start_url").trim))
  }

  test("candidates: parse, validity filter, first-seen dedup (ALL mode)") {
    val cand = GenericIngest.candidates(spark, csv, portals, "Oekonomi",
      "ALL", 100, java.sql.Date.valueOf("2024-01-01")).collect()
    // aarhus: 3 unique valid Referat links (dup collapsed, bad uuid out,
    // Dagsorden + nav link out); silkeborg: 2 unique
    assert(cand.length == 5)
    val byMuni = cand.groupBy(_.getAs[String]("municipality"))
    assert(byMuni("aarhus").length == 3)
    assert(byMuni("silkeborg").length == 2)
    // canonical filename carries the parsed date
    val f = cand.map(_.getAs[String]("filename"))
    assert(f.exists(_.startsWith("2024-04-08_aarhus_oekonomiudvalget")))
    assert(cand.forall(_.getAs[String]("bucket").startsWith("raw-files-")))
  }

  test("NEW mode keeps only today-or-later meetings (F3)") {
    val cand = GenericIngest.candidates(spark, csv, portals, "Oekonomi",
      "NEW", 100, java.sql.Date.valueOf("2024-04-01")).collect()
    // aarhus 2024-04-08 passes; 2024-03-11 and 2024-02-12 dropped;
    // silkeborg May meetings pass
    assert(cand.length == 3)
    assert(cand.forall(r =>
      !r.getAs[java.sql.Date]("meeting_date").before(
        java.sql.Date.valueOf("2024-04-01"))))
  }

  test("per-municipality limit counts only surviving rows (L1/L3)") {
    val cand = GenericIngest.candidates(spark, csv, portals, "Oekonomi",
      "ALL", 1, java.sql.Date.valueOf("2024-01-01")).collect()
    assert(cand.length == 2) // one per municipality
    // the kept row is the FIRST in discovery order
    val aarhus = cand.find(_.getAs[String]("municipality") == "aarhus").get
    assert(aarhus.getAs[String]("filename")
      .startsWith("2024-04-08_aarhus_oekonomiudvalget"))
  }

  test("ingest run is idempotent: second run ingests nothing (J1/K5)") {
    val sink = tmpSink()
    val n1 = GenericIngest.run(spark, csv, portals, sink)
    assert(n1 == 5)
    val n2 = GenericIngest.run(spark, csv, portals, sink)
    assert(n2 == 0)
    // sink is partitioned by municipality/committee and complete
    val stored = spark.read.parquet(sink)
    assert(stored.count() == 5)
    assert(stored.select("municipality").distinct().count() == 2)
    val dirs = new java.io.File(sink).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("municipality=")))
  }

  test("observe metrics report candidates/dated/ingested counts (A2)") {
    val sink = tmpSink()
    val metrics = scala.collection.mutable.Map.empty[String, Long]
    GenericIngest.run(spark, csv, portals, sink, metricsOut = metrics)
    assert(metrics("n_candidates") == 5)
    assert(metrics("n_dated") == 5)
    assert(metrics("n_ingested") == 5)
  }

  test("partial inventory: only missing documents are fetched (K5)") {
    val sink = tmpSink()
    // pre-ingest with limit 1 per municipality, then full run
    assert(GenericIngest.run(spark, csv, portals, sink,
      limitPerMuni = 1) == 2)
    assert(GenericIngest.run(spark, csv, portals, sink) == 3)
    assert(spark.read.parquet(sink).count() == 5)
  }

  test("fetch failures go to K7 side output and retry on the next run") {
    val sink = tmpSink()
    val errDir = Files.createTempDirectory("graft_err_").resolve("errs").toString
    // silkeborg URLs fail on run 1
    val n1 = GenericIngest.run(spark, csv, portals, sink,
      fetcher = graft.fetch.Fetch.StaticFetcher(failPattern = "silkeborg"),
      errDir = errDir)
    assert(n1 == 3) // aarhus only
    val errs = spark.read.parquet(errDir)
    assert(errs.count() == 2)
    assert(errs.collect().forall(_.getAs[Int]("status") == 404))
    // run 2 with a healthy fetcher: exactly the failed docs are retried
    val n2 = GenericIngest.run(spark, csv, portals, sink)
    assert(n2 == 2)
    val stored = spark.read.parquet(sink)
    assert(stored.count() == 5)
    // content came from the fetcher, not a stub
    val sample = new String(stored.limit(1).collect()(0)
      .getAs[Array[Byte]]("content"), "UTF-8")
    assert(sample.startsWith("PDF-BYTES:"))
  }

  test("RetryingFetcher retries 5xx up to maxAttempts, passes 4xx through") {
    // flaky inner: 503 on the first two calls per url, then 200
    class Flaky extends graft.fetch.Fetch.Fetcher {
      val calls = scala.collection.mutable.Map.empty[String, Int]
      def fetch(url: String): graft.fetch.Fetch.FetchResult = {
        val n = calls.getOrElse(url, 0) + 1
        calls(url) = n
        if (url.contains("gone")) graft.fetch.Fetch.FetchResult(404, "", Array.empty)
        else if (n <= 2) graft.fetch.Fetch.FetchResult(503, "", Array.empty)
        else graft.fetch.Fetch.FetchResult(200, "application/pdf", Array(1))
      }
    }
    val flaky = new Flaky
    val r = graft.fetch.Fetch.RetryingFetcher(flaky, maxAttempts = 3)
    assert(r.fetch("http://x/doc").status == 200)
    assert(flaky.calls("http://x/doc") == 3)
    // 4xx is data, not a transient: exactly one attempt
    assert(r.fetch("http://x/gone").status == 404)
    assert(flaky.calls("http://x/gone") == 1)
    // budget respected: a permanent 5xx stops at maxAttempts
    val always503 = new graft.fetch.Fetch.Fetcher {
      var n = 0
      def fetch(url: String) = {
        n += 1; graft.fetch.Fetch.FetchResult(503, "", Array.empty)
      }
    }
    assert(graft.fetch.Fetch.RetryingFetcher(always503, maxAttempts = 3)
      .fetch("http://x/f").status == 503)
  }
}
