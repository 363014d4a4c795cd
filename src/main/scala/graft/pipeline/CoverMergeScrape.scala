package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.doc.DocKernels
import graft.expr.Exprs
import graft.fetch.Fetch
import graft.parse.{GraftFunctions, HtmlParser}

/** The cover-page + per-item-PDF merge dataflow (reference
  * scraper_ringkoebing_skjern.py:33-67,134-243):
  *
  *   meeting page -> Danish-date title parse (P5) -> participants
  *   collect (A4) -> item-PDF links with F7 exclusion predicates ->
  *   binary fetch (S11, per-partition client) -> cover synthesis (B4)
  *   -> ordered PDF merge aggregate (A5/B5) -> partitioned sink.
  *
  * Scale shape: one generator explode per page, one fetch pass over
  * only the links that survive the exclusions, one groupBy-meeting
  * aggregation for the merge.
  */
object CoverMergeScrape {

  /** Participants: the `<li>` items following the "Deltagere" heading
    * (reference scraper_ringkoebing_skjern.py:146-156). */
  private[graft] def participantsOf(html: String): Seq[String] = {
    val root = HtmlParser.parse(html)
    val heading = root.descendants.find(n =>
      (n.tag == "h2" || n.tag == "h3") &&
        n.text.toLowerCase.contains("deltagere"))
    heading.toSeq.flatMap { h =>
      val siblings = h.parent.children
      val after = siblings.drop(siblings.indexOf(h) + 1)
      after.find(_.tag == "ul").toSeq
        .flatMap(_.children.filter(_.tag == "li").map(_.text))
    }
  }

  private val participantsUdf = udf((h: String) =>
    if (h == null) Seq.empty[String] else participantsOf(h))

  /** F7 exclusion predicates on item links
    * (scraper_ringkoebing_skjern.py:160-183). */
  private def keepItemLink(href: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column) =
    href.contains("/Edoc/") && href.endsWith(".pdf") &&
      !lower(text).contains("hent hele") &&
      !lower(text).contains("godkendelse af dagsorden")

  /** One run over a directory of meeting pages. The fetcher supplies
    * the per-item PDF bytes (hermetic in tests). Returns merged-doc
    * count. */
  def run(spark: SparkSession, pagesDir: String, municipality: String,
      sinkDir: String, fetcher: Fetch.Fetcher): Long = {
    GraftFunctions.register(spark)
    val pages = DeepScrape.readPages(spark, pagesDir)

    // h1 title/date per page: parse_html returns one row per h1
    val meta = pages
      .select(col("page"), col("html"),
        expr("parse_html(html, 'h1')")
          .as(Seq("pos", "tag", "href", "text", "attrs")))
      .filter(col("pos") === 0)
      .select(col("page"), col("html"), col("text").as("title"),
        Exprs.parseDanishDate(col("text")).as("meeting_date"),
        participantsUdf(col("html")).as("participants"))

    // item links surviving the F7 exclusions, ordered by position
    val items = meta
      .select(col("page"),
        expr("parse_html(html, 'tr.agenda--tr a')")
          .as(Seq("pos", "tag", "href", "text", "attrs")))
      .filter(keepItemLink(col("href"), col("text")))
      .select(col("page"), col("pos"), col("href"))

    val fetched = Fetch.fetchBinary(items, "href", fetcher)
      .filter(col("status") < 400)
      .select(col("page"), (col("pos") + 1).as("idx"),
        col("content").as("pdf"))

    val covers = meta.select(col("page"), lit(0).as("idx"),
      DocKernels.makeCoverUdf(col("title"),
        date_format(col("meeting_date"), "yyyy-MM-dd"),
        col("participants")).as("pdf"))

    val merged = covers.unionByName(fetched)
      .groupBy(col("page"))
      .agg(DocKernels.mergePdfs(col("idx"), col("pdf")).as("pdf"))
      .join(meta.select(col("page"), col("meeting_date")), Seq("page"))
      .withColumn("municipality", lit(municipality))
      .withColumn("committee", lit("Oekonomi"))
      .withColumn("filename", Exprs.canonicalFilename(col("meeting_date"),
        col("municipality"), lit("oekonomiudvalget"), col("page")))
      .select("municipality", "committee", "filename", "meeting_date", "pdf")

    val todo = merged.join(
      GenericIngest.inventory(spark, sinkDir),
      Seq("filename"), "left_anti")
    val n = todo.count()
    if (n > 0) {
      todo.write.mode("append")
        .partitionBy("municipality", "committee").parquet(sinkDir)
    }
    n
  }
}
