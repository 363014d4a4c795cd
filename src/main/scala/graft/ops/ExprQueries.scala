package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expr.Exprs

/** Oracle-checkable queries exercising the scalar expression library
  * (SURVEY.md §2.3). The synthetic tables carry no URLs/filenames, so
  * each query first SYNTHESIZES the reference-shaped string column
  * deterministically from table data, then applies the engine's
  * extraction/normalization expressions — both halves are mirrored in
  * the DuckDB oracle SQL, so a hash match proves identical semantics.
  */
object ExprQueries {

  /** A deterministic 36-char uuid-shaped string per order key. */
  private def pseudoUuid(keyCol: String) = {
    val h = md5(col(keyCol).cast("string"))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** P1+P2+P12: build a FirstAgenda-style viewer URL, then extract the
    * uuid and the dd-MM-yyyy meeting date back out of it, and rewrite to
    * the direct-PDF endpoint. Reference: scraper.py:161-176,200. */
  def urlExtract(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("url",
        concat(lit("https://dagsordener.demo.dk/vis?Referat-d."),
          date_format(col("o_orderdate"), "dd-MM-yyyy"),
          lit("&id="), pseudoUuid("o_orderkey")))
      .select(
        col("o_orderkey"),
        Exprs.extractUuid(col("url")).as("doc_uuid"),
        Exprs.extractUrlDate(col("url")).as("meeting_date"),
        Exprs.rewriteToPdfUrl(lit("https://dagsordener.demo.dk"),
          Exprs.extractUuid(col("url"))).as("pdf_url"))

  /** P2/P3/P4: all three numeric date formats round-trip through the
    * engine's parsers. Reference: scraper.py:168, scraper_billund.py:105,
    * scraper_copenhagen.py:74. */
  def dateFormats(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("s_dmy", date_format(col("o_orderdate"), "dd-MM-yyyy"))
      .withColumn("s_iso", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .withColumn("s_dot", date_format(col("o_orderdate"), "dd.MM.yyyy"))
      .select(
        col("o_orderkey"),
        to_date(col("s_dmy"), "dd-MM-yyyy").as("d_dmy"),
        Exprs.extractIsoDate(col("s_iso"), lit(null).cast("string")).as("d_iso"),
        Exprs.extractDottedDate(col("s_dot")).as("d_dot"))

  /** P5: Danish month-name dates round-trip (format -> parse).
    * Reference: scraper_svendborg.py:138-148. */
  def danishDates(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("danish", Exprs.formatDanishDate(col("o_orderdate")))
      .select(
        col("o_orderkey"), col("danish"),
        Exprs.parseDanishDate(col("danish")).as("parsed_date"))

  /** P6: guarded make_date — out-of-range month yields null, not error.
    * Reference: scraper.py:173-176. */
  def safeDates(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("m", (col("o_orderkey") % 15 + 1).cast("int"))
      .select(
        col("o_orderkey"),
        Exprs.safeMakeDate(lit(2025), col("m"), lit(10)).as("maybe_date"))

  /** P7+P8+P9: canonical filename synthesis, sanitization, remote-key
    * encoding. Reference: scraper.py:172-207, scraper_aalborg.py:174. */
  def filenames(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("muni", lower(regexp_replace(col("c_name"), "Customer#", "cust")))
      .withColumn("rawname",
        concat(lit("a<b>:"), col("muni"), lit("|x?*.pdf")))
      .withColumn("meeting_date",
        date_add(to_date(lit("2025-01-01")), (col("c_custkey") % 365).cast("int")))
      .select(
        col("c_custkey"),
        Exprs.canonicalFilename(col("meeting_date"), col("muni"),
          lit("oekonomiudvalget"), col("c_custkey").cast("string"))
          .as("filename"),
        Exprs.sanitizeFilename(col("rawname")).as("sanitized"),
        Exprs.remoteKey(col("muni"),
          concat(lit("https://x.dk/doc/"), col("c_custkey").cast("string")),
          lit(".pdf")).as("remote_key"))

  /** P10+P11+P15+P17+P22: host/municipality derivation, URL join,
    * query-param extraction, case folding, JS-URL extraction.
    * Reference: scraper.py:301-308,128; scraper_aalborg.py:138-159. */
  def urlFunctions(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .withColumn("muni", lower(regexp_replace(col("n_name"), "_", "")))
      .withColumn("base", concat(lit("https://dagsorden."), col("muni"),
        lit("kommune.dk/")))
      .withColumn("js", concat(lit("window.open('/files/"), col("muni"),
        lit(".pdf')")))
      .select(
        col("n_nationkey"),
        Exprs.urlHost(col("base")).as("host"),
        Exprs.municipalityFromUrl(col("base")).as("derived_muni"),
        Exprs.urlJoin(col("base"), concat(lit("/agenda?pdfnavn="),
          col("muni"), lit(".pdf&mode=open"))).as("joined_url"),
        Exprs.queryParam(concat(col("base"), lit("x?pdfnavn="), col("muni"),
          lit(".pdf&m=1")), "pdfnavn").as("pdfnavn"),
        upper(col("muni")).as("muni_upper"),
        Exprs.extractJsUrl(col("js")).as("js_url"))

  /** P13+P18+P19: HTML-entity unescape (replace-chain), zero-pad,
    * label-strip. Reference: scraper_aalborg.py:149-150,
    * scraper_svendborg.py:147, scraper_copenhagen.py:136. */
  def textCleanup(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("escaped",
        concat(lit("Referat &amp; dagsorden &lt;"), col("p_name"),
          lit("&gt; &quot;x&quot;")))
      .withColumn("punkt", concat(lit("Punkt  "), col("p_partkey").cast("string")))
      .select(
        col("p_partkey"),
        Exprs.htmlUnescape(col("escaped")).as("unescaped"),
        Exprs.zeroPad2(col("p_partkey") % 31 + 1).as("padded_day"),
        Exprs.stripLabel(col("punkt"), "Punkt").as("item_number"),
        Exprs.chooseExtension(
          when(col("p_partkey") % 2 === 0, lit("application/pdf"))
            .otherwise(lit("application/vnd.openxmlformats-officedocument.wordprocessingml.document")),
          lit("https://x.dk/f")).as("ext"))

  /** P16: base64 round-trip over string payloads.
    * Reference: scraper_svendborg.py:267-268 (CDP base64 output). */
  def base64Roundtrip(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .select(
        col("s_suppkey"),
        base64(col("s_name").cast("binary")).as("b64"),
        unbase64(base64(col("s_name").cast("binary"))).cast("string")
          .as("roundtrip"))
}
