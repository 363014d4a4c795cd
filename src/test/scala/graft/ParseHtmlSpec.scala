package graft

import org.apache.spark.sql.functions._

import graft.parse.{GraftFunctions, HtmlParser}

/** Tests for the hand-rolled HTML parser, selector engine, and the
  * parse_html Generator (FIXTURES.md §2 portal dialects). */
class ParseHtmlSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"src/test/resources/fixtures/$name")),
      java.nio.charset.StandardCharsets.UTF_8)

  // ---------------------------------------------------- parser core
  test("parser builds a tree and extracts text/attrs") {
    val root = HtmlParser.parse(
      """<div class="a b" id="x"><p>Hello <b>world</b>!</p></div>""")
    val div = HtmlParser.select(root, "div").head
    assert(div.classes == Set("a", "b"))
    assert(div.attr("id").contains("x"))
    assert(div.text == "Hello world!")
  }

  test("parser tolerates void elements, comments and scripts") {
    val root = HtmlParser.parse(
      """<p>a<br>b</p><!-- <a href="x">no</a> --><script>var s="<a href='y'>";</script><a href="/real">R</a>""")
    val links = HtmlParser.select(root, "a")
    assert(links.map(_.attr("href").get) == Seq("/real"))
  }

  test("parser unescapes entities in text and attributes") {
    val root = HtmlParser.parse(
      """<a href="/x?a=1&amp;b=2">Tom &amp; Jerry</a>""")
    val a = HtmlParser.select(root, "a").head
    assert(a.attr("href").contains("/x?a=1&b=2"))
    assert(a.text == "Tom & Jerry")
  }

  test("selector engine: tag, class, id, attr, descendant chains") {
    val html =
      """<table id="resultTable"><tbody>
        |<tr class="odd"><td><a class="row-link" href="/1">x</a></td></tr>
        |<tr><td><a href="/2">y</a></td></tr>
        |</tbody></table>
        |<a class="row-link" href="/outside">z</a>""".stripMargin
    val root = HtmlParser.parse(html)
    assert(HtmlParser.select(root, "#resultTable a").map(_.attr("href").get)
      == Seq("/1", "/2"))
    assert(HtmlParser.select(root, "a.row-link").map(_.attr("href").get)
      == Seq("/1", "/outside"))
    assert(HtmlParser.select(root, "#resultTable tr.odd a.row-link")
      .map(_.attr("href").get) == Seq("/1"))
    assert(HtmlParser.select(root, "[href=/2]").size == 1)
  }

  // ------------------------------------------- portal dialect fixtures
  test("kk listing: rows, doc types and dates (scraper_copenhagen.py:55-103)") {
    val rows = HtmlParser.selectAll(fixture("kk_listing.html"), "tr")
    assert(rows.size == 3)
    val types = rows.map(r =>
      HtmlParser.select(r.parent, "td.views-field-nothing a"))
    val referater = HtmlParser.selectAll(fixture("kk_listing.html"),
      "td.views-field-nothing a").filter(_.text.toLowerCase.contains("referat"))
    assert(referater.size == 2)
    val next = HtmlParser.selectAll(fixture("kk_listing.html"),
      "li.pager__item--next a")
    assert(next.size == 1 && next.head.attr("href").contains("?page=1"))
  }

  test("meetingsplus listing: date from text with aria-label fallback") {
    val links = HtmlParser.selectAll(fixture("meetingsplus_listing.html"),
      "#committeesRecentContent a.accessible-table-cell")
    assert(links.size == 3)
    assert(links(0).text.contains("2025-11-04"))
    assert(links(1).attr("aria-label").exists(_.contains("2025-10-07")))
  }

  test("resulttable listing: rows + next button (scraper_glostrup.py:171-219)") {
    val html = fixture("resulttable_listing.html")
    val rows = HtmlParser.selectAll(html, "#resultTable tbody tr")
    assert(rows.size == 2)
    assert(HtmlParser.selectAll(html, "a.row-link").size == 2)
    assert(HtmlParser.selectAll(html, "#resultTable_next").size == 1)
  }

  test("aalborg meeting: JS url with entities (scraper_aalborg.py:138-159)") {
    val html = fixture("aalborg_meeting.html")
    val btn = HtmlParser.selectAll(html, "button").head
    val onclick = btn.attr("onclick").get
    assert(onclick.contains("&type=referat")) // &amp; unescaped
    assert(onclick.contains("pdfnavn=2024-06-12%20Referat.pdf"))
  }

  // ------------------------------------------------ generator surface
  test("parse_html generator emits one row per match with stable pos") {
    GraftFunctions.register(spark)
    val df = Seq(("m1", fixture("portals/aarhus.html"))).toDF("muni", "html")
      .selectExpr("muni", "parse_html(html, 'a')")
    val out = df.collect()
    assert(out.length == 7) // script-content link excluded
    assert(out.map(_.getInt(1)).toSeq == (0 until 7))
    val hrefs = out.map(r => r.getString(3))
    assert(hrefs.count(_.startsWith("/vis?Referat-")) == 5)
    // attrs map carries all attributes
    val first = out.head.getMap[String, String](5)
    assert(first.keys.toSet.contains("href"))
  }

  test("parse_html with selector pushes the dialect into the plan") {
    GraftFunctions.register(spark)
    val df = Seq((1, fixture("kk_listing.html"))).toDF("id", "html")
      .selectExpr("parse_html(html, 'td.views-field-agenda-meeting-date')")
    val dates = df.select("text").as[String].collect()
    assert(dates.sameElements(Array("04.08.2024", "05.08.2024", "11.09.2024")))
  }

  test("parse_html yields no rows for null html or selector misses") {
    GraftFunctions.register(spark)
    val df = Seq((1, null: String), (2, "<p>no links</p>")).toDF("id", "html")
      .selectExpr("id", "parse_html(html, 'a')")
    assert(df.count() == 0)
  }

  test("parser tolerates malformed HTML: unclosed tags, junk, truncation") {
    import graft.parse.HtmlParser
    val nasty = Seq(
      "<div><a href='/x'>unclosed",
      "<<<>>>&&& <a href=\"/y\">y</a",
      "<table><tr><td><a href='/z'>z</a></table>",
      "plain text only, no tags",
      "")
    nasty.foreach { h =>
      // must not throw; link extraction still finds well-formed anchors
      val links = HtmlParser.selectAll(h, "a")
      assert(links.forall(_.tag == "a"))
    }
    assert(HtmlParser.selectAll("<div><a href='/x'>unclosed", "a")
      .flatMap(_.attr("href")) == Seq("/x"))
  }
}
