package graft.sources

import java.time.LocalDate
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.parse.HtmlParser

/** DataSource V2 `meetinglist` connector — the idiomatic form of the
  * reference's paginated listing scans (SURVEY.md §2.1 S3-S8, §4):
  * the pagination loop lives INSIDE the source, invisible to the
  * query plan, and Catalyst pushes filters, limits and column pruning
  * into the crawl:
  *
  *  - `SupportsPushDownFilters`: meeting_date range + municipality
  *    equality run during the crawl (the reference encodes these in
  *    the request URL, scraper_copenhagen.py:34-38). With
  *    `assumeSortedDesc=true` (portals list newest-first) a min-date
  *    bound STOPS the crawl — pages older than the bound are never
  *    opened.
  *  - `SupportsPushDownLimit`: stop paging once enough rows are
  *    produced (the reference's early scroll exit, scraper.py:134-137).
  *  - `SupportsPushDownRequiredColumns`: only materialize requested
  *    columns.
  *
  * A "portal" is a directory per municipality of `page_N.html` files;
  * the next page is crawled only while a `li.pager__item--next` link
  * exists — the hermetic stand-in for the HTTP pager, behind the same
  * reader. One InputPartition per municipality = the reference's
  * per-portal isolation, as partition parallelism.
  */
class MeetingListProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "meetinglist"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MeetingListTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new MeetingListTable(properties.get("path"),
      "true" == properties.getOrDefault("assumeSortedDesc", "false"),
      properties.getOrDefault("dialect", "firstagenda"))
}

object MeetingListTable {
  val schema: StructType = StructType(Seq(
    StructField("municipality", StringType, nullable = false),
    StructField("page_idx", IntegerType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("doc_uuid", StringType, nullable = true),
    StructField("meeting_date", DateType, nullable = true)))

  /** Pages opened across all readers (observability + tests of early
    * exit; per-JVM, which equals per-executor in production). */
  val pagesOpened = new AtomicLong(0L)
}

class MeetingListTable(path: String, sortedDesc: Boolean, dialect: String)
    extends Table with SupportsRead {
  override def name(): String = s"meetinglist($path)"
  override def schema(): StructType = MeetingListTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MeetingListScanBuilder(path, sortedDesc, dialect)
}

class MeetingListScanBuilder(path: String, sortedDesc: Boolean,
    dialect: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = Int.MaxValue
  private var required: StructType = MeetingListTable.schema

  private def asLocalDate(v: Any): Option[LocalDate] = v match {
    case d: java.sql.Date => Some(d.toLocalDate)
    case d: LocalDate => Some(d)
    case s: String => scala.util.Try(LocalDate.parse(s)).toOption
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case sources.GreaterThanOrEqual("meeting_date", v) => asLocalDate(v).isDefined
      case sources.GreaterThan("meeting_date", v) => asLocalDate(v).isDefined
      case sources.LessThanOrEqual("meeting_date", v) => asLocalDate(v).isDefined
      case sources.LessThan("meeting_date", v) => asLocalDate(v).isDefined
      case sources.EqualTo("municipality", _: String) => true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = { limit = l; true }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new MeetingListScan(path, sortedDesc, dialect, pushed, limit, required)
}

class MeetingListScan(path: String, sortedDesc: Boolean, dialect: String,
    filters: Array[Filter], limit: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"meetinglist path=$path pushedFilters=${filters.mkString("[", ",", "]")} " +
      s"pushedLimit=${if (limit == Int.MaxValue) "none" else limit}"

  override def planInputPartitions(): Array[InputPartition] = {
    val muniFilter: Option[String] = filters.collectFirst {
      case sources.EqualTo("municipality", m: String) => m }
    val dirs = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).sorted
    dirs.filter(d => muniFilter.forall(_ == d))
      .map(d => MeetingListPartition(s"$path/$d", d): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MeetingListReaderFactory(sortedDesc, dialect, filters, limit,
      required)
}

case class MeetingListPartition(dir: String, municipality: String)
    extends InputPartition

class MeetingListReaderFactory(sortedDesc: Boolean, dialect: String,
    filters: Array[Filter], limit: Int, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new MeetingListReader(p.asInstanceOf[MeetingListPartition], sortedDesc,
      dialect, filters, limit, required)
}

/** Crawls page_0.html, page_1.html, ... while a next-link exists,
  * honoring pushed date bounds, limit, and column pruning. */
class MeetingListReader(part: MeetingListPartition, sortedDesc: Boolean,
    dialect: String, filters: Array[Filter], limit: Int,
    required: StructType)
    extends PartitionReader[InternalRow] {

  private val urlDateRe = "d\\.(\\d{2})-(\\d{2})-(\\d{4})".r
  private val dmyRe = "(\\d{2})-(\\d{2})-(\\d{4})".r
  private val dotRe = "(\\d{2})\\.(\\d{2})\\.(\\d{4})".r
  private val uuidRe = "id=([a-f0-9\\-]{36})".r

  private def dmy(m: scala.util.matching.Regex.Match): Option[LocalDate] =
    scala.util.Try(LocalDate.of(m.group(3).toInt, m.group(2).toInt,
      m.group(1).toInt)).toOption

  private def asLocalDate(v: Any): LocalDate = v match {
    case d: java.sql.Date => d.toLocalDate
    case d: LocalDate => d
    case s: String => LocalDate.parse(s)
  }
  private val minDate: Option[LocalDate] = filters.collectFirst {
    case sources.GreaterThanOrEqual("meeting_date", v) => asLocalDate(v)
    case sources.GreaterThan("meeting_date", v) => asLocalDate(v)
  }

  private def keep(d: Option[LocalDate]): Boolean = filters.forall {
    case sources.GreaterThanOrEqual("meeting_date", v) =>
      d.exists(x => !x.isBefore(asLocalDate(v)))
    case sources.GreaterThan("meeting_date", v) =>
      d.exists(_.isAfter(asLocalDate(v)))
    case sources.LessThanOrEqual("meeting_date", v) =>
      d.exists(x => !x.isAfter(asLocalDate(v)))
    case sources.LessThan("meeting_date", v) =>
      d.exists(_.isBefore(asLocalDate(v)))
    case _ => true
  }

  private var pageIdx = 0
  private var emitted = 0
  private var done = false
  private var queue: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _
  // scroll dialect: cumulative link-count fixpoint state
  private val scrollSeen = scala.collection.mutable.HashSet.empty[String]
  private var scrollCount = 0

  private def loadPage(): Unit = {
    val f = new java.io.File(s"${part.dir}/page_$pageIdx.html")
    if (!f.exists()) { done = true; return }
    MeetingListTable.pagesOpened.incrementAndGet()
    val html = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val root = HtmlParser.parse(html)
    // (href, title, date) triples per dialect
    val parsed: Seq[(String, String, Option[LocalDate])] = dialect match {
      case "resulttable" =>
        // Glostrup/Syddjurs search-result table (scraper_glostrup.py:
        // 171-219): dd-MM-yyyy in the first cell, a.row-link target.
        val trs = HtmlParser.select(root, "#resultTable tr")
        trs.flatMap { tr =>
          val link = HtmlParser.select(tr.parent, "a.row-link")
            .find(_.ancestors.contains(tr))
          val tds = tr.children.filter(_.tag == "td")
          for {
            a <- link
            href <- a.attr("href")
          } yield {
            val date = tds.headOption.map(_.text).flatMap(t =>
              dmyRe.findFirstMatchIn(t).flatMap(m =>
                scala.util.Try(LocalDate.of(m.group(3).toInt,
                  m.group(2).toInt, m.group(1).toInt)).toOption))
            (href, a.text, date)
          }
        }
      case "meetingsplus" =>
        // MeetingsPlus platform (scraper_billund.py:104-126 and its
        // furesoe/norddjurs clones): meeting links carry the
        // dd-MM-yyyy date in the link TEXT; offset pagination probes
        // pages until one comes back empty.
        HtmlParser.select(root, "a.meeting-link").flatMap { a =>
          a.attr("href").map { href =>
            (href, a.text, dmyRe.findFirstMatchIn(a.text).flatMap(dmy))
          }
        }
      case "os2web" =>
        // OS2Web portal (scraper_middelfart.py:108-127): one teaser
        // div per meeting, date dd.MM.yyyy in span.date, link in the
        // teaser heading; li.pager-next drives pagination.
        HtmlParser.select(root, "div.node-teaser").flatMap { t =>
          for {
            a <- HtmlParser.select(t, "a").headOption
            href <- a.attr("href")
          } yield {
            val date = HtmlParser.select(t, "span.date").headOption
              .flatMap(s => dotRe.findFirstMatchIn(s.text).flatMap(dmy))
            (href, a.text, date)
          }
        }
      case "accordion" =>
        // Accordion/JS-expanded page (scraper_aalborg.py:117-173,
        // scraper_hedensted.py): one collapsed section per meeting,
        // dd-MM-yyyy in the section header, attachment links in the
        // (server-rendered but hidden) content div. The whole archive
        // is one page — no pagination.
        HtmlParser.select(root, "div.accordion-item").flatMap { item =>
          val header = HtmlParser.select(item, "h3.accordion-header")
            .headOption
          val date = header.flatMap(h =>
            dmyRe.findFirstMatchIn(h.text).flatMap(dmy))
          HtmlParser.select(item, "a").flatMap { a =>
            a.attr("href").map(href =>
              (href, header.map(_.text).getOrElse(a.text), date))
          }
        }
      case "scroll" =>
        // Infinite-scroll portal (scraper.py:120-149): page_N.html is
        // the DOM after N scroll-and-settle rounds — a cumulative,
        // append-only link list. The fixpoint loop below keeps
        // "scrolling" (opening the next state) while the link count
        // still grows; only newly-appended links are emitted, in
        // first-seen order.
        HtmlParser.select(root, "a.scroll-item").flatMap { a =>
          a.attr("href").map(href =>
            (href, a.text, urlDateRe.findFirstMatchIn(href).flatMap(dmy)))
        }
      case _ => // firstagenda viewer links, date embedded in the href
        HtmlParser.select(root, "a")
          .filter(_.attr("href").exists(_.startsWith("/vis?Referat-")))
          .map { a =>
            val href = a.attr("href").get
            (href, a.text, urlDateRe.findFirstMatchIn(href).flatMap(dmy))
          }
    }
    // scroll: drop links already emitted from an earlier scroll state
    // (HashSet.add returns false for dups; sequential filter keeps
    // the page's first-seen order)
    val fresh =
      if (dialect == "scroll") parsed.filter(p => scrollSeen.add(p._1))
      else parsed
    val rows = fresh.collect {
      case (href, title, date) if keep(date) => buildRow(href, title, date)
    }
    // F8 sentinel: an "Ingen data" result row terminates the scan
    val sentinel = dialect == "resulttable" &&
      HtmlParser.select(root, "#resultTable td").exists(
        _.text.toLowerCase.contains("ingen data"))
    // early stop: pages are newest-first and everything here is already
    // older than the lower bound -> no later page can match
    val allDates = fresh.flatMap(_._3)
    val exhaustedByDate = sortedDesc && minDate.isDefined &&
      allDates.nonEmpty && allDates.forall(_.isBefore(minDate.get))
    val hasNext = dialect match {
      case "resulttable" =>
        // next button present and not disabled (scraper_glostrup.py:206-219)
        HtmlParser.select(root, "#resultTable_next")
          .exists(!_.classes.contains("disabled"))
      case "meetingsplus" =>
        // offset pagination: keep probing while pages yield items
        // (scraper_billund.py:93-103 increments the offset until an
        // empty response)
        parsed.nonEmpty
      case "os2web" => HtmlParser.select(root, "li.pager-next").nonEmpty
      case "accordion" => false // single-page archive
      case "scroll" =>
        // fixpoint on the cumulative link count: another scroll is
        // worthwhile only if this one grew the list (scraper.py:134-137
        // stops when the count settles)
        val grew = parsed.size > scrollCount
        scrollCount = parsed.size
        grew
      case _ => HtmlParser.select(root, "li.pager__item--next").nonEmpty
    }
    queue = (if (sentinel) Seq.empty else rows).iterator
    pageIdx += 1
    if (!hasNext || exhaustedByDate || sentinel) done = true
  }

  private def buildRow(href: String, title: String,
      date: Option[LocalDate]): InternalRow = {
    val uuid = uuidRe.findFirstMatchIn(href).map(_.group(1))
    val row = new GenericInternalRow(required.length)
    required.fields.zipWithIndex.foreach { case (f, i) =>
      f.name match {
        case "municipality" => row.update(i, UTF8String.fromString(part.municipality))
        case "page_idx" => row.update(i, pageIdx)
        case "url" => row.update(i, UTF8String.fromString(href))
        case "title" => row.update(i, UTF8String.fromString(title))
        case "doc_uuid" => row.update(i,
          uuid.map(UTF8String.fromString).orNull)
        case "meeting_date" => row.update(i,
          date.map(d => d.toEpochDay.toInt: java.lang.Integer).orNull)
      }
    }
    row
  }

  override def next(): Boolean = {
    if (emitted >= limit) return false
    while (!queue.hasNext && !done) loadPage()
    if (queue.hasNext) { current = queue.next(); emitted += 1; true }
    else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
