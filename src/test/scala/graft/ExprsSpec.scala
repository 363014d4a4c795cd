package graft

import org.apache.spark.sql.functions._

import graft.expr.Exprs

/** Golden + property tests for the scalar expression library
  * (FIXTURES.md §4 shapes). Property samples are generated with a
  * seeded RNG and evaluated in one DataFrame per property (one Spark
  * job, not one per sample).
  */
class ExprsSpec extends SparkTestBase {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  private def evalOn(input: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(input).toDF("s").select(f(col("s")).as("r")).collect()(0).get(0)

  private def evalMany(inputs: Seq[String],
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    inputs.toDF("s").select(col("s"), f(col("s")).as("r"))
      .collect().toSeq.map(_.get(1))

  // ---- P1 UUID extraction (scraper.py:161-165 shape)
  test("extractUuid pulls the 36-char id from a viewer URL") {
    val url = "https://x.dk/vis?Referat-d.08-04-2024&id=0b7a27a4-7d09-4a33-bd18-7d059bcf9d81"
    assert(evalOn(url, Exprs.extractUuid) == "0b7a27a4-7d09-4a33-bd18-7d059bcf9d81")
  }
  test("extractUuid yields null (not empty string) when absent") {
    assert(evalOn("https://x.dk/vis?nothing", Exprs.extractUuid) == null)
  }

  // ---- P2-P4 date formats
  test("extractUrlDate parses d.dd-MM-yyyy from URL") {
    assert(evalOn("https://x.dk/vis?Referat-d.08-04-2024&id=x",
      Exprs.extractUrlDate).toString == "2024-04-08")
  }
  test("extractUrlDate -> null on malformed date") {
    assert(evalOn("https://x.dk/vis?Referat-d.99-99-9999&id=x",
      Exprs.extractUrlDate) == null)
  }
  test("extractIsoDate prefers text, falls back to aria-label") {
    val r = Seq(("nope", "Møde 2025-11-04 referat")).toDF("t", "a")
      .select(Exprs.extractIsoDate(col("t"), col("a")).as("r"))
      .collect()(0).get(0)
    assert(r.toString == "2025-11-04")
  }
  test("extractDottedDate parses dd.MM.yyyy") {
    assert(evalOn("04.08.2024", Exprs.extractDottedDate).toString == "2024-08-04")
  }

  // ---- P5 Danish months, all 12 (scraper_svendborg.py:141-146)
  test("parseDanishDate handles all 12 month names") {
    val inputs = Exprs.danishMonths.toSeq.sortBy(_._2)
      .map { case (name, _) => s"25. $name 2025" }
    val out = evalMany(inputs, Exprs.parseDanishDate)
    Exprs.danishMonths.toSeq.sortBy(_._2).zip(out).foreach {
      case ((name, m), r) =>
        assert(r != null && r.toString == f"2025-$m%02d-25", s"month $name")
    }
  }
  test("parseDanishDate tolerates trailing time and single-digit day") {
    assert(evalOn("5. november 2025 - 15:30",
      Exprs.parseDanishDate).toString == "2025-11-05")
  }
  test("parseDanishDate -> null on unknown month") {
    assert(evalOn("25. blurgh 2025", Exprs.parseDanishDate) == null)
  }
  test("property: formatDanishDate is the inverse of parseDanishDate") {
    val rnd = new scala.util.Random(42)
    val dates = Seq.fill(60)(java.time.LocalDate.ofEpochDay(rnd.nextInt(25000).toLong))
    val out = dates.map(d => java.sql.Date.valueOf(d)).toDF("d")
      .select(col("d"),
        Exprs.parseDanishDate(Exprs.formatDanishDate(col("d"))).as("r"))
      .collect()
    out.foreach(row =>
      assert(row.get(1) != null && row.get(1).toString == row.get(0).toString))
  }

  // ---- P6
  test("safeMakeDate yields null on out-of-range month, not an error") {
    assert(eval1(Exprs.safeMakeDate(lit(2025), lit(13), lit(10))) == null)
    assert(eval1(Exprs.safeMakeDate(lit(2025), lit(2), lit(28))).toString == "2025-02-28")
  }

  // ---- P7 canonical filename (scraper.py:172,178)
  test("canonicalFilename uses date when present, fallback key when not") {
    val df = Seq((Some(java.sql.Date.valueOf("2025-11-19")), "glostrup"),
      (None, "glostrup")).toDF("d", "m")
    val rows = df.select(Exprs.canonicalFilename(col("d"), col("m"),
      lit("oekonomiudvalget"), lit("abc")).as("f")).collect().map(_.getString(0))
    assert(rows(0) == "2025-11-19_glostrup_oekonomiudvalget.pdf")
    assert(rows(1) == "unknown-abc_glostrup_oekonomiudvalget.pdf")
  }

  // ---- P8 sanitize (scraper_aalborg.py:174): idempotence property
  test("sanitizeFilename strips forbidden chars; property: idempotent") {
    assert(evalOn("""a<b>:c"d/e\f|g?h*i.pdf""",
      Exprs.sanitizeFilename) == "a_b__c_d_e_f_g_h_i.pdf")
    val rnd = new scala.util.Random(7)
    val alphabet = "ab<>:\"/\\|?*._"
    val samples = Seq.fill(80)(
      Seq.fill(rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val once = evalMany(samples, Exprs.sanitizeFilename).map(_.asInstanceOf[String])
    val twice = evalMany(once, Exprs.sanitizeFilename).map(_.asInstanceOf[String])
    once.zip(twice).foreach { case (a, b) => assert(a == b) }
    once.foreach(s => assert(!s.exists("<>:\"/\\|?*".contains(_))))
  }

  // ---- P9 remote key (scraper.py:202-207)
  test("remoteKey embeds URL with / -> @") {
    val r = Seq(("2025-01-01_x_oekonomiudvalget", "https://a.dk/b/c", ".pdf"))
      .toDF("root", "url", "ext")
      .select(Exprs.remoteKey(col("root"), col("url"), col("ext")).as("k"))
      .collect()(0).getString(0)
    assert(r == "2025-01-01_x_oekonomiudvalget&&https:@@a.dk@b@c.pdf")
  }

  // ---- P10 municipality derivation (scraper.py:301-308)
  test("municipalityFromUrl strips dagsorden prefix, kommune and .dk") {
    assert(evalOn("https://dagsordener.aarhus.dk/vis",
      Exprs.municipalityFromUrl) == "aarhus")
    assert(evalOn("https://dagsorden.silkeborgkommune.dk/",
      Exprs.municipalityFromUrl) == "silkeborg")
  }

  // ---- P11 url join (scraper.py:128)
  test("urlJoin resolves root-relative, relative and absolute hrefs") {
    val df = Seq(
      ("https://a.dk/", "/x/y.pdf"),
      ("https://a.dk", "https://b.dk/z"),
      ("https://a.dk/", "page2")).toDF("base", "href")
    val out = df.select(Exprs.urlJoin(col("base"), col("href")).as("u"))
      .collect().map(_.getString(0))
    assert(out.sameElements(Array(
      "https://a.dk/x/y.pdf", "https://b.dk/z", "https://a.dk/page2")))
  }

  // ---- P13 html unescape vs commons-text reference implementation
  test("htmlUnescape matches StringEscapeUtils for portal entities") {
    val samples = Seq("Tom &amp; Jerry", "a &lt;b&gt; c",
      "x &quot;y&quot; &#39;z&#39;", "a&nbsp;b",
      "&amp;lt; stays once-unescaped: &amp;lt;")
    val out = evalMany(samples, Exprs.htmlUnescape)
    samples.zip(out).foreach { case (s, got) =>
      val expected = org.apache.commons.text.StringEscapeUtils
        .unescapeHtml4(s).replace('\u00a0', ' ')
      assert(got == expected, s"input: $s")
    }
  }

  // ---- P15 query param (scraper_aalborg.py:157)
  test("queryParam extracts raw param value") {
    assert(evalOn("https://x.dk/Pdf.aspx?pdfnavn=2024-01-01%20a.pdf&id=9",
      u => Exprs.queryParam(u, "pdfnavn")) == "2024-01-01%20a.pdf")
    assert(evalOn("https://x.dk/Pdf.aspx?other=1",
      u => Exprs.queryParam(u, "pdfnavn")) == null)
  }

  // ---- P14 percent decode
  test("urlPercentDecode decodes %20 and friends") {
    assert(evalOn("2024-01-01%20m%C3%B8de.pdf",
      Exprs.urlPercentDecode) == "2024-01-01 møde.pdf")
  }

  // ---- P19/P18
  test("stripLabel removes Punkt prefix; zeroPad2 pads") {
    assert(evalOn("Punkt  17", c => Exprs.stripLabel(c, "Punkt")) == "17")
    assert(eval1(Exprs.zeroPad2(lit(7))) == "07")
    assert(eval1(Exprs.zeroPad2(lit(12))) == "12")
  }

  // ---- P21 WMF strip (scraper_glostrup.py:69-74)
  test("stripWmfImages drops wmf/emf img tags, keeps others") {
    val html = """<p>a</p><img src="data:image/wmf;base64,AAA"/><img src="data:image/png;base64,BBB"/>"""
    val out = evalOn(html, Exprs.stripWmfImages).asInstanceOf[String]
    assert(!out.contains("wmf") && out.contains("png"))
  }

  // ---- P22 JS URL extraction
  test("extractJsUrl handles window.open and top.location") {
    assert(evalOn("""onclick="window.open('/files/a.pdf')"""",
      Exprs.extractJsUrl) == "/files/a.pdf")
    assert(evalOn("""onclick="top.location='/doc/b.pdf'"""",
      Exprs.extractJsUrl) == "/doc/b.pdf")
    assert(evalOn("nothing here", Exprs.extractJsUrl) == null)
  }

  // ---- P20 extension choice (scraper_glostrup.py:287-293)
  test("chooseExtension prefers content-type, then url suffix") {
    val df = Seq(
      ("application/pdf", "https://x/f"),
      ("application/vnd.openxmlformats-officedocument.wordprocessingml.document", "https://x/f"),
      ("application/octet-stream", "https://x/f.docx"),
      ("application/octet-stream", "https://x/f")).toDF("ct", "u")
    val out = df.select(Exprs.chooseExtension(col("ct"), col("u")).as("e"))
      .collect().map(_.getString(0))
    assert(out.sameElements(Array(".pdf", ".docx", ".docx", ".pdf")))
  }
}
