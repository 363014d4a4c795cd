package graft

import org.apache.spark.sql.functions._

import graft.sources.MeetingListTable

/** DSv2 meetinglist connector: crawl correctness + pushdown behavior
  * observed via the pages-opened counter (S3-S8, L2, §4). */
class MeetingListSourceSpec extends SparkTestBase {

  private val portal = "src/test/resources/fixtures/portals2"

  private def read(opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("meetinglist")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(portal)
  }

  private def countingPages[A](f: => A): (A, Long) = {
    val before = MeetingListTable.pagesOpened.get()
    val a = f
    (a, MeetingListTable.pagesOpened.get() - before)
  }

  test("full crawl reads every page and link, dates and uuids parsed") {
    val (rows, pages) = countingPages {
      read().collect()
    }
    assert(rows.length == 8) // aarhus 7 + silkeborg 1
    assert(pages == 4) // aarhus 3 pages + silkeborg 1
    val aarhus = rows.filter(_.getAs[String]("municipality") == "aarhus")
    assert(aarhus.length == 7)
    assert(rows.forall(_.getAs[String]("doc_uuid") != null))
    assert(rows.map(_.getAs[java.sql.Date]("meeting_date").toString)
      .contains("2024-06-10"))
  }

  test("column pruning: a url-only projection still crawls correctly") {
    val urls = read().select("url").collect().map(_.getString(0))
    assert(urls.length == 8)
    assert(urls.forall(_.startsWith("/vis?Referat-")))
  }

  test("date lower bound + assumeSortedDesc stops the crawl early (S7/§4)") {
    val (rows, pages) = countingPages {
      read(Map("assumeSortedDesc" -> "true"))
        .filter(col("meeting_date") >= lit("2024-04-01").cast("date"))
        .collect()
    }
    assert(rows.length == 4) // 3 aarhus (Jun/May/Apr) + 1 silkeborg
    // aarhus: page_0 matches, page_1 all older -> stop; page_2 never
    // opened. 2 (aarhus) + 1 (silkeborg) = 3 < 4 full-crawl pages.
    assert(pages == 3)
  }

  test("without sortedDesc hint the same filter still yields correct rows") {
    val rows = read()
      .filter(col("meeting_date") >= lit("2024-04-01").cast("date"))
      .collect()
    assert(rows.length == 4)
  }

  test("limit pushdown stops paging early (L2)") {
    val (rows, pages) = countingPages {
      read().limit(2).collect()
    }
    assert(rows.length == 2)
    // each partition reader stops after 2 rows -> page_0 per muni at most
    assert(pages <= 2)
  }

  test("municipality equality prunes partitions entirely (F4)") {
    val (rows, pages) = countingPages {
      read().filter(col("municipality") === "silkeborg").collect()
    }
    assert(rows.length == 1)
    assert(pages == 1) // aarhus directory never touched
  }

  test("connector-backed ingest: pushdown crawl -> naming -> sink (E2)") {
    val sink = java.nio.file.Files
      .createTempDirectory("graft_conn_").resolve("docs").toString
    val (n1, pages) = countingPages {
      graft.pipeline.GenericIngest.runFromConnector(spark, portal, sink,
        minDate = Some(java.sql.Date.valueOf("2024-04-01")))
    }
    assert(n1 == 4)
    assert(pages == 3) // date bound stopped the aarhus crawl early
    // idempotent second run
    assert(graft.pipeline.GenericIngest.runFromConnector(spark, portal,
      sink, minDate = Some(java.sql.Date.valueOf("2024-04-01"))) == 0)
    val stored = spark.read.parquet(sink).collect()
    assert(stored.map(_.getAs[String]("filename")).sorted.head ==
      "2024-04-08_aarhus_oekonomiudvalget.pdf")
  }

  test("resulttable dialect parses rows and stops at the disabled next (S6)") {
    val (rows, pages) = countingPages {
      spark.read.format("meetinglist")
        .option("dialect", "resulttable")
        .load("src/test/resources/fixtures/portals3")
        .filter(col("municipality") === "glostrup")
        .collect()
    }
    assert(rows.length == 3)
    assert(pages == 2) // page_2 exists but next is disabled on page_1
    assert(rows.map(_.getAs[java.sql.Date]("meeting_date").toString).sorted
      .sameElements(Array("2025-09-17", "2025-10-22", "2025-11-19")))
    assert(rows.forall(_.getAs[String]("url").startsWith("/docs/")))
  }

  test("'Ingen data' sentinel terminates the scan with zero rows (F8)") {
    val (rows, pages) = countingPages {
      spark.read.format("meetinglist")
        .option("dialect", "resulttable")
        .load("src/test/resources/fixtures/portals3")
        .filter(col("municipality") === "tom")
        .collect()
    }
    assert(rows.isEmpty)
    assert(pages == 1) // sentinel stops despite the enabled next button
  }

  test("meetingsplus dialect: date from link text, stop on empty page (S4)") {
    val (rows, pages) = countingPages {
      spark.read.format("meetinglist")
        .option("dialect", "meetingsplus")
        .load("src/test/resources/fixtures/portals4")
        .collect()
    }
    assert(rows.length == 3)
    assert(pages == 3) // page_2 opened, found empty, crawl stops
    assert(rows.map(_.getAs[java.sql.Date]("meeting_date").toString).sorted
      .sameElements(Array("2024-04-08", "2024-05-13", "2024-06-10")))
    assert(rows.forall(_.getAs[String]("doc_uuid").startsWith("aaaaaaaa-")))
  }

  test("meetingsplus + sortedDesc: date bound stops before the empty page") {
    val (rows, pages) = countingPages {
      spark.read.format("meetinglist")
        .option("dialect", "meetingsplus")
        .option("assumeSortedDesc", "true")
        .load("src/test/resources/fixtures/portals4")
        .filter(col("meeting_date") >= lit("2024-05-01").cast("date"))
        .collect()
    }
    assert(rows.length == 2)
    assert(pages == 2) // page_1 is all-older -> stop; page_2 never opened
  }

  test("os2web dialect: teaser rows, dd.MM.yyyy dates, pager-next (S7)") {
    val (rows, pages) = countingPages {
      spark.read.format("meetinglist")
        .option("dialect", "os2web")
        .load("src/test/resources/fixtures/portals5")
        .collect()
    }
    assert(rows.length == 3)
    assert(pages == 2) // page_1 has no pager-next
    assert(rows.map(_.getAs[java.sql.Date]("meeting_date").toString).sorted
      .sameElements(Array("2025-09-17", "2025-10-22", "2025-11-19")))
    assert(rows.forall(_.getAs[String]("url").startsWith("/nyheder/")))
  }

  test("accordion dialect: one row per attachment, header date, single page (S8)") {
    val (rows, pages) = countingPages {
      spark.read.format("meetinglist")
        .option("dialect", "accordion")
        .load("src/test/resources/fixtures/portals6")
        .collect()
    }
    assert(rows.length == 3) // 2 attachments + 1
    assert(pages == 1) // no pagination: page_1 never probed
    assert(rows.count(
      _.getAs[java.sql.Date]("meeting_date").toString == "2024-06-10") == 2)
    assert(rows.forall(_.getAs[String]("doc_uuid").startsWith("cccccccc-")))
    assert(rows.forall(
      _.getAs[String]("title").startsWith("Oekonomiudvalget")))
  }

  test("scroll dialect: link-count fixpoint stops the crawl (S5)") {
    val (rows, pages) = countingPages {
      spark.read.format("meetinglist")
        .option("dialect", "scroll")
        .load("src/test/resources/fixtures/portals7")
        .collect()
    }
    // 3 initial links + 2 appended by the first scroll, each emitted once
    assert(rows.length == 5)
    assert(rows.map(_.getAs[String]("doc_uuid")).distinct.length == 5)
    // page_0 (initial) + page_1 (grew 3->5) + page_2 (settled at 5);
    // page_3's poison link proves the fixpoint stopped the crawl
    assert(pages == 3)
    assert(!rows.exists(_.getAs[String]("title").contains("POISON")))
    // first-seen order is preserved: appended links carry later pages
    val byUuid = rows.map(r => r.getAs[String]("doc_uuid") ->
      r.getAs[Int]("page_idx")).toMap
    assert(byUuid("dddddddd-0001-4a33-bd18-7d059bcf9d81") == 0)
    assert(byUuid("dddddddd-0004-7d66-ea4b-a0382ef2c0b4") == 1)
  }

  test("scroll dialect + limit pushdown stops scrolling early") {
    val (rows, pages) = countingPages {
      spark.read.format("meetinglist")
        .option("dialect", "scroll")
        .load("src/test/resources/fixtures/portals7")
        .limit(3).collect()
    }
    assert(rows.length == 3)
    assert(pages == 1) // the initial state already satisfied the limit
  }

  test("pushed filters and limit are visible in the scan description") {
    val df = read().filter(col("meeting_date") >= lit("2024-04-01").cast("date"))
      .limit(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") || plan.contains("meetinglist"))
  }
}
