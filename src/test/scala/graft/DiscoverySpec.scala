package graft

import java.nio.file.Files

import graft.pipeline.Discovery

/** Tests for the discovery dataflows (S2/S9/S10/F9/K3/K4). */
class DiscoverySpec extends SparkTestBase {
  import spark.implicits._

  test("readPortalList skips blanks, comments and non-http lines (S2)") {
    val p = Files.createTempDirectory("graft_disc_").resolve("urls.txt")
    Files.writeString(p,
      "https://dagsordener.aarhus.dk\n\n# a comment\nftp://nope\n  https://dagsorden.silkeborgkommune.dk  \n")
    val urls = Discovery.readPortalList(spark, p.toString)
      .as[String].collect().sorted
    assert(urls.sameElements(Array(
      "https://dagsorden.silkeborgkommune.dk",
      "https://dagsordener.aarhus.dk")))
  }

  test("candidateUrls is the full stems x prefixes x suffixes product (S9)") {
    val df = Discovery.candidateUrls(spark, Seq("aarhus", "vejle"))
    assert(df.count() == 2 * 3 * 2)
    assert(df.filter($"url" === "https://dagsordener.aarhuskommune.dk")
      .count() == 1)
  }

  test("probePortals keeps status<400 and dedups (S9/F9/D2)") {
    val cands = Discovery.candidateUrls(spark, Seq("aarhus", "vejle"))
    val prober = Discovery.StaticProber(Map(
      "https://dagsordener.aarhus.dk" -> 200,
      "https://dagsorden.aarhus.dk" -> 301, // redirects still accepted
      "https://dagsordener.vejlekommune.dk" -> 403))
    val live = Discovery.probePortals(cands, prober).collect()
    assert(live.map(_.getString(1)).sorted.sameElements(Array(
      "https://dagsorden.aarhus.dk", "https://dagsordener.aarhus.dk")))
  }

  test("findCommitteeId: data-value strategy first (S10)") {
    val html =
      """<ul><li data-value="0b7a27a4-7d09-4a33-bd18-7d059bcf9d81">Økonomiudvalget</li>
        |<li data-value="ffffffff">Teknisk udvalg</li></ul>""".stripMargin
    assert(Discovery.findCommitteeId(html)
      .contains("0b7a27a4-7d09-4a33-bd18-7d059bcf9d81"))
  }

  test("findCommitteeId: parent data-value fallback (S10)") {
    val html =
      """<div data-value="abc123"><span>Økonomiudvalg</span></div>"""
    assert(Discovery.findCommitteeId(html).contains("abc123"))
  }

  test("findCommitteeId: href udvalgId fallback (S10)") {
    val html =
      """<a href="/?request.kriterie.udvalgId=deadbeef-1234">Økonomiudvalget 2025</a>"""
    assert(Discovery.findCommitteeId(html).contains("deadbeef-1234"))
  }

  test("findCommitteeId: none found -> None") {
    assert(Discovery.findCommitteeId("<p>Byrådet</p>").isEmpty)
  }

  test("discoverCommittees + writeConfigCsv roundtrip through S1 (K3)") {
    val portals = Seq(
      ("https://dagsordener.aarhus.dk",
        """<li data-value="abc-111">Økonomiudvalget</li>"""),
      ("https://dagsorden.vejlekommune.dk/",
        """<p>nothing here</p>""")).toDF("base_url", "html")
    val configs = Discovery.discoverCommittees(portals)
    val rows = configs.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(1) ==
      "https://dagsordener.aarhus.dk/?request.kriterie.udvalgId=abc-111")
    // K3 sink -> S1 scan roundtrip (the reference's CSV handshake)
    val out = Files.createTempDirectory("graft_cfg_").resolve("cfg").toString
    Discovery.writeConfigCsv(configs, out)
    val back = graft.pipeline.GenericIngest.readConfigs(spark, out).collect()
    assert(back.length == 1 &&
      back(0).getAs[String]("municipality") == "aarhus")
  }

  test("writeTextLines emits one url per line (K4)") {
    val out = Files.createTempDirectory("graft_txt_").resolve("urls").toString
    Discovery.writeTextLines(Seq("https://a.dk", "https://b.dk").toDF("url"), out)
    val back = Discovery.readPortalList(spark, out).as[String].collect().sorted
    assert(back.sameElements(Array("https://a.dk", "https://b.dk")))
  }
}
