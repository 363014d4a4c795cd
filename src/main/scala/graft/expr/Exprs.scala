package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library — the projection surface of the reference
  * pipeline (SURVEY.md §2.3, P1-P23), re-expressed as codegen-friendly
  * Spark `Column` combinators. Everything here stays inside whole-stage
  * codegen (no UDFs except [[htmlUnescape]]'s worst case), so these run
  * at full Tungsten speed over 100 TB.
  */
object Exprs {

  // ---------------------------------------------------------------- P1/P2
  /** UUID extraction from a meeting URL.
    * Reference: scraper.py:161-165 (`id=([a-f0-9\-]{36})`). */
  def extractUuid(url: Column): Column =
    nullIfEmpty(regexp_extract(url, "id=([a-f0-9\\-]{36})", 1))

  /** dd-MM-yyyy date embedded in a URL path (`...d.08-04-2024...`).
    * Reference: scraper.py:168-176. Unparseable -> null (ANSI off). */
  def extractUrlDate(url: Column): Column =
    try_to_date(nullIfEmpty(regexp_extract(url, "d\\.(\\d{2}-\\d{2}-\\d{4})", 1)),
      "dd-MM-yyyy")

  /** ISO yyyy-MM-dd in free text with an aria-label fallback.
    * Reference: scraper_billund.py:105-115, scraper_aalborg.py:161-169. */
  def extractIsoDate(text: Column, aria: Column): Column =
    try_to_date(coalesce(
      nullIfEmpty(regexp_extract(text, "(\\d{4}-\\d{2}-\\d{2})", 1)),
      nullIfEmpty(regexp_extract(aria, "(\\d{4}-\\d{2}-\\d{2})", 1))),
      "yyyy-MM-dd")

  /** dd.MM.yyyy listing date. Reference: scraper_copenhagen.py:74-78. */
  def extractDottedDate(text: Column): Column =
    try_to_date(nullIfEmpty(regexp_extract(text, "(\\d{2}\\.\\d{2}\\.\\d{4})", 1)),
      "dd.MM.yyyy")

  // ------------------------------------------------------------------ P5
  /** Danish month name -> month number, as a broadcast-free map literal
    * (J3). Reference: scraper_svendborg.py:141-146. */
  val danishMonths: Map[String, Int] = Map(
    "januar" -> 1, "februar" -> 2, "marts" -> 3, "april" -> 4,
    "maj" -> 5, "juni" -> 6, "juli" -> 7, "august" -> 8,
    "september" -> 9, "oktober" -> 10, "november" -> 11, "december" -> 12)

  private val danishMonthMap: Column =
    map(danishMonths.toSeq.sortBy(_._2)
      .flatMap { case (n, m) => Seq(lit(n), lit(m)) }: _*)

  /** Inverse map, for formatting a date back to Danish prose. */
  private val danishMonthName: Column =
    map(danishMonths.toSeq.sortBy(_._2)
      .flatMap { case (n, m) => Seq(lit(m), lit(n)) }: _*)

  /** Parse `"25. november 2025"` (optionally with trailing `" - 15:30"`)
    * to a date; null when the month name is unknown or shape mismatches.
    * Reference: scraper_svendborg.py:138-148, scraper_middelfart.py:132-142. */
  def parseDanishDate(text: Column): Column = {
    val day = nullIfEmpty(
      regexp_extract(text, "(\\d{1,2})\\.\\s+\\p{L}+\\s+\\d{4}", 1))
    val monthName = lower(nullIfEmpty(
      regexp_extract(text, "\\d{1,2}\\.\\s+(\\p{L}+)\\s+\\d{4}", 1)))
    val year = nullIfEmpty(
      regexp_extract(text, "\\d{1,2}\\.\\s+\\p{L}+\\s+(\\d{4})", 1))
    safeMakeDate(year.cast("int"), element_at(danishMonthMap, monthName),
      day.cast("int"))
  }

  /** Format a date as Danish prose (`25. november 2025`) — used by tests
    * and oracle-roundtrip queries. */
  def formatDanishDate(d: Column): Column =
    concat(dayofmonth(d).cast("string"), lit(". "),
      element_at(danishMonthName, month(d)), lit(" "),
      year(d).cast("string"))

  // ------------------------------------------------------------------ P6
  /** Guarded date construction: invalid components -> null, never error.
    * Reference: scraper.py:173-176 (try/except -> None). */
  def safeMakeDate(y: Column, m: Column, d: Column): Column =
    try_to_date(concat(y.cast("string"), lit("-"), m.cast("string"),
      lit("-"), d.cast("string")), "y-M-d")

  // ------------------------------------------------------------------ P7
  /** Canonical document filename: `{yyyy-MM-dd}_{muni}_{committee}.pdf`,
    * falling back to a uuid-keyed name when the date is missing.
    * Reference: scraper.py:172,178; scraper_svendborg.py:147-152. */
  def canonicalFilename(date: Column, muni: Column, committee: Column,
      fallbackKey: Column): Column =
    concat(
      coalesce(date_format(date, "yyyy-MM-dd"),
        concat(lit("unknown-"), fallbackKey)),
      lit("_"), muni, lit("_"), committee, lit(".pdf"))

  // ------------------------------------------------------------------ P8
  /** Strip filesystem-hostile characters. Idempotent.
    * Reference: scraper_aalborg.py:174 (`re.sub(r'[<>:"/\\|?*]', '_')`). */
  def sanitizeFilename(name: Column): Column =
    regexp_replace(name, "[<>:\"/\\\\|?*]", "_")

  // ------------------------------------------------------------------ P9
  /** Remote-key encoding: embed the source URL into the object key as
    * `{root}&&{url with / -> @}{ext}`. Reference: scraper.py:202-207. */
  def remoteKey(root: Column, url: Column, ext: Column): Column =
    concat(root, lit("&&"), translate(url, "/", "@"), ext)

  // ----------------------------------------------------------------- P10
  /** Host portion of a URL (pure-regex, matches urlparse().netloc for
    * http(s) URLs). Reference: scraper.py:301-308. */
  def urlHost(url: Column): Column =
    nullIfEmpty(regexp_extract(url, "^https?://([^/]+)", 1))

  /** Municipality name derived from host: drop `dagsorden(er).` prefix,
    * `.dk` suffix, and a trailing `kommune`. Reference: scraper.py:301-308. */
  def municipalityFromUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(urlHost(url), "^dagsorden(er)?\\.", ""),
        "\\.dk$", ""),
      "kommune$", "")

  // ----------------------------------------------------------------- P11
  /** Relative -> absolute URL join (root-relative hrefs only, which is
    * all the reference encounters). Reference: scraper.py:128. */
  def urlJoin(base: Column, href: Column): Column =
    when(href.startsWith("http"), href)
      .when(href.startsWith("/"),
        concat(regexp_replace(base, "/+$", ""), href))
      .otherwise(concat(regexp_replace(base, "/+$", ""), lit("/"), href))

  // ----------------------------------------------------------------- P12
  /** URL rewrite: `/vis?Referat-...` viewer URL -> direct PDF endpoint.
    * Reference: scraper.py:200, download_single_file.py:25. */
  def rewriteToPdfUrl(base: Column, uuid: Column): Column =
    concat(regexp_replace(base, "/+$", ""), lit("/pdf/GetDagsorden/"), uuid)

  // ----------------------------------------------------------------- P13
  /** HTML-entity unescape for the entities the portals actually emit.
    * Pure column expression (replace chain) so it stays in codegen;
    * full HTML4 entity table lives in tests via commons-text.
    * Reference: scraper_aalborg.py:149-150. */
  def htmlUnescape(c: Column): Column = {
    val steps = Seq("&quot;" -> "\"", "&#39;" -> "'", "&lt;" -> "<",
      "&gt;" -> ">", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
  }

  // ----------------------------------------------------------------- P14
  /** Percent-decode (Spark built-in; null-safe). Reference:
    * scraper_aalborg.py:157-159 (`unquote`). */
  def urlPercentDecode(c: Column): Column = try_url_decode(c)

  // ----------------------------------------------------------------- P15
  /** Extract a single query parameter's raw value. Reference:
    * scraper_aalborg.py:157 (`pdfnavn=([^&]*)`). */
  def queryParam(url: Column, name: String): Column =
    nullIfEmpty(regexp_extract(url, s"[?&]${java.util.regex.Pattern.quote(name)}=([^&]*)", 1))

  // ----------------------------------------------------------------- P18
  /** Zero-pad to two digits (day/month components).
    * Reference: scraper_svendborg.py:147 (`zfill(2)`). */
  def zeroPad2(c: Column): Column = lpad(c.cast("string"), 2, "0")

  // ----------------------------------------------------------------- P19
  /** `"Punkt 1"` -> `"1"`: strip a label prefix and trim.
    * Reference: scraper_copenhagen.py:136. */
  def stripLabel(c: Column, label: String): Column =
    trim(regexp_replace(c, s"^\\s*${java.util.regex.Pattern.quote(label)}\\s*", ""))

  // ----------------------------------------------------------------- P20
  /** Filename extension choice: trust an explicit content-type, else the
    * URL suffix, defaulting to pdf. Reference: scraper_glostrup.py:287-293. */
  def chooseExtension(contentType: Column, url: Column): Column =
    when(contentType.contains("pdf"), lit(".pdf"))
      .when(contentType.contains("wordprocessingml"), lit(".docx"))
      .when(lower(url).endsWith(".docx"), lit(".docx"))
      .otherwise(lit(".pdf"))

  // ----------------------------------------------------------------- P21
  /** Strip WMF/EMF data-URI images from an HTML fragment (renderers
    * can't draw them). Reference: scraper_glostrup.py:69-74. */
  def stripWmfImages(html: Column): Column =
    regexp_replace(html, "<img[^>]*src=\"data:image/(wmf|emf)[^>]*>", "")

  // ----------------------------------------------------------------- P22
  /** URL hidden inside inline JS: `window.open('...')` or
    * `top.location='...'`. Reference: scraper_aalborg.py:138-147,
    * scraper_ringkoebing_skjern.py:95-99. */
  def extractJsUrl(js: Column): Column =
    coalesce(
      nullIfEmpty(regexp_extract(js, "window\\.open\\('([^']+)'", 1)),
      nullIfEmpty(regexp_extract(js, "top\\.location\\s*=\\s*'([^']+)'", 1)))

  // ------------------------------------------------------------ helpers
  /** regexp_extract returns "" on no-match; the reference treats that as
    * missing, so normalize to null for downstream coalesce/filters. */
  def nullIfEmpty(c: Column): Column = when(length(c) > 0, c)
}
