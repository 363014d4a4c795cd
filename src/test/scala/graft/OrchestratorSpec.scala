package graft

import java.nio.file.Files

import graft.pipeline.GenericIngest
import graft.run.Orchestrator
import graft.run.Orchestrator.Job

/** E1 orchestrator: registry pruning (incl. the generic-scraper
  * semi-join probe), failure isolation, A1 report. */
class OrchestratorSpec extends SparkTestBase {

  private val genericMunis = Seq("aarhus", "silkeborg")

  private def jobs(sink: String): Seq[Job] = Seq(
    Job("generic", None, s => GenericIngest.run(s,
      "src/test/resources/fixtures/municipalities.csv",
      "src/test/resources/fixtures/portals", sink)),
    Job("kobenhavn_deep", Some(Seq("kobenhavn")), s =>
      graft.pipeline.DeepScrape.run(s,
        "src/test/resources/fixtures/kkpages", "listing", "kobenhavn",
        sink + "_kk")),
    Job("broken", Some(Seq("atlantis")),
      _ => throw new RuntimeException("portal unreachable")))

  test("prune: site jobs match by name, generic via config probe (J4)") {
    val js = jobs("/tmp/unused")
    assert(Orchestrator.prune(js, None, genericMunis).size == 3)
    assert(Orchestrator.prune(js, Some("kobenhavn"), genericMunis)
      .map(_.name) == Seq("kobenhavn_deep"))
    // generic runs because a config row matches "aarhus"
    assert(Orchestrator.prune(js, Some("AARHUS"), genericMunis)
      .map(_.name) == Seq("generic"))
    assert(Orchestrator.prune(js, Some("nowhere"), genericMunis).isEmpty)
  }

  test("runAll isolates failures and report aggregates A1 counters") {
    val sink = Files.createTempDirectory("graft_orch_").resolve("d").toString
    val results = Orchestrator.runAll(spark, jobs(sink))
    assert(results.map(_.name) == Seq("broken", "generic", "kobenhavn_deep"))
    val byName = results.map(r => r.name -> r).toMap
    assert(byName("generic").ok && byName("generic").ingested == 5)
    assert(byName("kobenhavn_deep").ok && byName("kobenhavn_deep").ingested == 2)
    assert(!byName("broken").ok &&
      byName("broken").error.contains("unreachable"))
    val rep = Orchestrator.report(spark, results).collect()(0)
    assert(rep.getAs[Long]("n_ok") == 2)
    assert(rep.getAs[Long]("n_fail") == 1)
    assert(rep.getAs[Long]("total_ingested") == 7)
  }
}
