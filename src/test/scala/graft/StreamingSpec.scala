package graft

import java.nio.file.{Files, Path}

import graft.streaming.IncrementalIngest

/** Structured Streaming incremental ingest (§2.11): AvailableNow
  * batch-per-run, checkpointed file progress, idempotent sink. */
class StreamingSpec extends SparkTestBase {

  private def writeCsv(dir: Path, name: String, rows: Seq[(String, String)]): Unit = {
    val body = "municipality,url\n" +
      rows.map { case (m, u) => s"$m,$u" }.mkString("\n")
    Files.writeString(dir.resolve(name), body)
  }

  private def url(muni: String, date: String, uuid: String) =
    s"https://dagsordener.$muni.dk/vis?Referat-d.$date&id=$uuid"

  test("incremental runs ingest only new documents across batches") {
    val base = Files.createTempDirectory("graft_stream_")
    val incoming = Files.createDirectory(base.resolve("incoming"))
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString

    val u1 = url("aarhus", "08-04-2024", "0b7a27a4-7d09-4a33-bd18-7d059bcf9d81")
    val u2 = url("aarhus", "11-03-2024", "1c8b38b5-8e10-5b44-ce29-8e160cd0ae92")
    val u3 = url("vejle", "05-05-2024", "4fbe6be8-b143-8e77-fb5c-b1493f03d1c5")

    // run 1: two docs (one duplicated in-batch)
    writeCsv(incoming, "batch1.csv", Seq(
      ("aarhus", u1), ("aarhus", u1), ("aarhus", u2)))
    val n1 = IncrementalIngest.runOnce(spark, incoming.toString, sink, ckpt)
    assert(n1 == 2)

    // run 2: a new file with one old and one new doc -> only the new lands
    writeCsv(incoming, "batch2.csv", Seq(("aarhus", u1), ("vejle", u3)))
    val n2 = IncrementalIngest.runOnce(spark, incoming.toString, sink, ckpt)
    assert(n2 == 1)

    // run 3: nothing new
    val n3 = IncrementalIngest.runOnce(spark, incoming.toString, sink, ckpt)
    assert(n3 == 0)

    val stored = spark.read.parquet(sink)
    assert(stored.count() == 3)
    assert(stored.select("municipality").distinct().count() == 2)
  }

  test("NEW mode drops meetings before the watermark date (F3 streaming)") {
    val base = Files.createTempDirectory("graft_stream_new_")
    val incoming = Files.createDirectory(base.resolve("incoming"))
    writeCsv(incoming, "b.csv", Seq(
      ("aarhus", url("aarhus", "08-04-2024", "0b7a27a4-7d09-4a33-bd18-7d059bcf9d81")),
      ("aarhus", url("aarhus", "11-03-2024", "1c8b38b5-8e10-5b44-ce29-8e160cd0ae92"))))
    val n = IncrementalIngest.runOnce(spark, incoming.toString,
      base.resolve("sink").toString, base.resolve("ckpt").toString,
      mode = "NEW", today = java.sql.Date.valueOf("2024-04-01"))
    assert(n == 1) // only the 2024-04-08 meeting is today-or-later
  }
}
