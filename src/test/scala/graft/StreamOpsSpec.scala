package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps
import graft.streaming.StreamOps.KeyedRow

/** Watermarked windowed aggregation + keyed-state dedup over
  * MemoryStream micro-batches. */
class StreamOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark keeps the first row per key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val dedup = StreamOps.dedupWithinWatermark(
      in.toDF().toDF("ts", "url"), Seq("url"))
    val q = dedup.writeStream.format("memory").queryName("wmdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), "/a"),
        (ts("2024-01-01 10:05:00"), "/a"), // dup within watermark
        (ts("2024-01-01 10:10:00"), "/b"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 10:20:00"), "/a")) // still within horizon
      q.processAllAvailable()
      val urls = spark.table("wmdedup").collect().map(_.getString(1))
      assert(urls.sorted.sameElements(Array("/a", "/b")))
    } finally q.stop()
  }

  test("sketch near-dedup collapses identical text, keeps distinct text") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val dedup = StreamOps.nearDedupWithinWatermark(
      in.toDF().toDF("ts", "url", "text"), "text")
    val q = dedup.writeStream.format("memory").queryName("neardedup")
      .outputMode(OutputMode.Append()).start()
    try {
      val body = "byrådet vedtog budgettet for næste år uden ændringer"
      in.addData(
        (ts("2024-01-01 10:00:00"), "/a", body),
        (ts("2024-01-01 10:05:00"), "/mirror/a", body), // same sketch
        (ts("2024-01-01 10:10:00"), "/b", "helt andet indhold om noget andet"))
      q.processAllAvailable()
      val urls = spark.table("neardedup").collect().map(_.getString(1))
      assert(urls.sorted.sameElements(Array("/a", "/b")))
    } finally q.stop()
  }

  test("stream-stream join matches only updates within the time skew") {
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Timestamp, Long)]
    val upd = MemoryStream[(Timestamp, Long, Double)]
    val joined = StreamOps.enrichJoin(
      ev.toDF().toDF("ts", "user_id"),
      upd.toDF().toDF("uts", "u_user_id", "price"))
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      upd.addData(
        (ts("2024-01-01 09:00:00"), 1L, 3.0),  // too old for the event
        (ts("2024-01-01 10:00:00"), 1L, 5.0),  // within 1 h
        (ts("2024-01-01 10:00:00"), 2L, 9.0))  // other key
      ev.addData((ts("2024-01-01 10:30:00"), 1L))
      q.processAllAvailable()
      val out = spark.table("enriched").collect()
        .map(r => (r.getLong(1), r.getDouble(3)))
      assert(out.toSet == Set((1L, 5.0)))
    } finally q.stop()
  }

  test("streaming session windows merge within the gap and close on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = StreamOps.sessionCounts(in.toDF().toDF("ts", "user_id"))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:10:00"), 1L), // merges: gap < 30 min
        (ts("2024-01-01 11:30:00"), 1L)) // new session
      q.processAllAvailable()
      // push the watermark far past both session ends
      in.addData((ts("2024-01-01 15:00:00"), 2L))
      q.processAllAvailable()
      val out = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
        .toSet
      assert(out.contains((1L, "2024-01-01 10:00:00.0", 2L)))
      assert(out.contains((1L, "2024-01-01 11:30:00.0", 1L)))
    } finally q.stop()
  }

  test("windowed counts finalize closed windows under the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = StreamOps.windowedEventCounts(
      in.toDF().toDF("ts", "event_type"))
    val q = agg.writeStream.format("memory").queryName("wincounts")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:05:00"), "click"),
        (ts("2024-01-01 10:15:00"), "click"),
        (ts("2024-01-01 10:20:00"), "view"))
      q.processAllAvailable()
      // advance watermark past 11:30 -> the 10:00 window closes
      in.addData((ts("2024-01-01 12:00:00"), "click"))
      q.processAllAvailable()
      val out = spark.table("wincounts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(out.contains(("2024-01-01 10:00:00.0", "click", 2L)))
      assert(out.contains(("2024-01-01 10:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("streamingHeavyHitters keeps MG guarantees across micro-batches") {
    import graft.streaming.StreamOps.{HeavyHit, TermRow}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TermRow]
    val hh = StreamOps.streamingHeavyHitters(in.toDS(), k = 4)
    val q = hh.writeStream.format("memory").queryName("hhstream")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: "hot" dominates; batch 2 continues the skew
      val b1 = Seq.fill(12)("hot") ++ Seq("a", "b", "c", "d", "e")
      val b2 = Seq.fill(8)("hot") ++ Seq("f", "g", "warm", "warm", "warm")
      in.addData(b1.map(TermRow("s1", _)): _*)
      q.processAllAvailable()
      in.addData(b2.map(TermRow("s1", _)): _*)
      q.processAllAvailable()
      // last batch's emitted summary for s1
      val batches = spark.table("hhstream").as[HeavyHit].collect()
      val last = batches.groupBy(_.term).map { case (t, xs) =>
        t -> xs.map(_.count).max
      }
      val n = (b1 ++ b2).length.toDouble
      val trueHot = (b1 ++ b2).count(_ == "hot").toLong
      // classic guarantee: freq > N/k must be present, estimate within
      // [true - N/k, true]
      assert(trueHot > n / 4)
      val est = last.getOrElse("hot", 0L)
      assert(est <= trueHot && est >= trueHot - (n / 4).ceil.toLong,
        s"hot estimate $est vs true $trueHot")
      // state never exceeds k counters: two batches emit at most 2k rows
      assert(batches.length <= 2 * 4)
    } finally q.stop()
  }

  test("streamingFunnel advances per-user stages across micro-batches") {
    import graft.streaming.StreamOps.{FunnelEvent, FunnelProgress}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamOps.streamingFunnel(in.toDS())
      .writeStream.format("memory").queryName("funnelstream")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: user 1 signs up and views (out of order in the batch);
      // user 2 views without signing up (no progress)
      in.addData(
        FunnelEvent(1L, "view", 200L), FunnelEvent(1L, "signup", 100L),
        FunnelEvent(2L, "view", 100L))
      q.processAllAvailable()
      val after1 = spark.table("funnelstream").as[FunnelProgress]
        .collect()
      assert(after1.toSet == Set(FunnelProgress(1L, 2, "view")))
      // batch 2: user 1 clicks then purchases; user 2 finally signs up
      // (the earlier view is gone — O(1) state, documented); a stale
      // click at ts <= the view ts must NOT advance user 1 twice
      in.addData(
        FunnelEvent(1L, "click", 150L), FunnelEvent(1L, "click", 300L),
        FunnelEvent(1L, "purchase", 400L), FunnelEvent(2L, "signup", 500L))
      q.processAllAvailable()
      val latest = spark.table("funnelstream").as[FunnelProgress]
        .collect().groupBy(_.userId)
        .map { case (u, xs) => u -> xs.maxBy(_.stage) }
      assert(latest(1L) == FunnelProgress(1L, 4, "purchase"))
      assert(latest(2L) == FunnelProgress(2L, 1, "signup"))
    } finally q.stop()
  }

  test("streamingAnomalies flags a spike against prior-bucket stats only") {
    import graft.streaming.StreamOps.{AnomalyFlag, BucketCount}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[BucketCount]
    val q = StreamOps.streamingAnomalies(in.toDS())
      .writeStream.format("memory").queryName("anomstream")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: a stable baseline - no flags possible for the first
      // two buckets (n < 2 guard), none after (zero variance but every
      // count equals the mean)
      in.addData((1L to 6L).map(b => BucketCount("click", b, 10L)): _*)
      q.processAllAvailable()
      assert(spark.table("anomstream").as[AnomalyFlag].collect().isEmpty)
      // batch 2: a 10x spike arrives - flagged against the stats of
      // the six earlier buckets; the next normal bucket is NOT flagged
      // even though the spike inflated the variance
      in.addData(BucketCount("click", 7L, 100L),
        BucketCount("click", 8L, 10L))
      q.processAllAvailable()
      val flags = spark.table("anomstream").as[AnomalyFlag].collect()
      assert(flags.toSet == Set(AnomalyFlag("click", 7L, 100L, 6L)))
      // independent keys keep independent state
      in.addData(BucketCount("view", 1L, 1000L))
      q.processAllAvailable()
      assert(spark.table("anomstream").as[AnomalyFlag].collect().length
        == 1) // n=0 for the new key: no flag
    } finally q.stop()
  }

  test("flatMapGroupsWithState dedups keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedRow]
    val deduped = StreamOps.firstSeenDedup(in.toDS())
    val q = deduped.writeStream.format("memory").queryName("dedupstream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(KeyedRow("a.pdf", "v1"), KeyedRow("a.pdf", "v1-dup"),
        KeyedRow("b.pdf", "v2"))
      q.processAllAvailable()
      in.addData(KeyedRow("a.pdf", "v1-batch2"), KeyedRow("c.pdf", "v3"))
      q.processAllAvailable()
      val out = spark.table("dedupstream").as[KeyedRow].collect()
      assert(out.map(_.key).sorted.sameElements(
        Array("a.pdf", "b.pdf", "c.pdf")))
      // the FIRST payload won for a.pdf
      assert(out.find(_.key == "a.pdf").get.payload == "v1")
    } finally q.stop()
  }
}
