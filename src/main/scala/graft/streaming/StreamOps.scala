package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operator surface beyond the batch-per-run ingest
  * (SURVEY.md §2.11 Spark mapping): watermarked windowed aggregation
  * and custom keyed state via flatMapGroupsWithState.
  *
  * At scale: both shuffle once on their key; state lives in the state
  * store (RocksDB in production), bounded by the watermark/timeout.
  */
object StreamOps {

  /** Tumbling-window event counts with a watermark bounding state:
    * late events beyond `lateness` are dropped, closed windows are
    * emitted finally (append mode). */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))

  /** Streaming gap-based sessions: the streaming twin of
    * `Temporal.sessionize` — same `session_window` operator, with a
    * watermark so merged sessions close (and emit finally, append
    * mode) once the watermark passes their end. State per open
    * session, bounded by the watermark. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Watermarked stream-stream inner join: events enrich against an
    * update stream on the key, accepting updates at most `skew` older
    * than the event. The time-range predicate plus watermarks on BOTH
    * sides is what lets Spark evict join state — the requirement for
    * joining two unbounded inputs. */
  def enrichJoin(events: DataFrame, updates: DataFrame,
      skew: String = "1 hour", lateness: String = "10 minutes"): DataFrame = {
    val e = events.withWatermark("ts", lateness)
    val u = updates.withWatermark("uts", lateness)
    e.join(u, expr(
      s"user_id = u_user_id AND uts BETWEEN ts - INTERVAL $skew AND ts"))
      .select(col("ts"), col("user_id"), col("uts"), col("price"))
  }

  /** Built-in watermark-bounded streaming dedup: first row per key is
    * emitted, later duplicates are dropped while the key is inside the
    * watermark horizon, and state self-expires with the watermark —
    * the zero-custom-code form of [[firstSeenDedup]] for pipelines
    * whose duplicate window is time-bounded (the reference's
    * re-crawl-within-a-run case, scraper.py:116-132). */
  def dedupWithinWatermark(rows: DataFrame, keyCols: Seq[String],
      lateness: String = "1 hour"): DataFrame =
    rows.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-dedup within the watermark horizon: dedup on the
    * 64-bit SimHash sketch of the text instead of the exact content.
    * [[graft.ops.Dedup.simHash]] is a stateless scan projection (fold
    * expressions, no window/self-join), so it composes with streaming
    * where the banded-LSH paths cannot; sketch-identical documents
    * (byte-identical or near-identical enough to tie every bit vote)
    * collapse to their first arrival. State = one sketch key per doc
    * inside the horizon, evicted with the watermark. */
  def nearDedupWithinWatermark(rows: DataFrame, textCol: String,
      lateness: String = "1 hour"): DataFrame =
    dedupWithinWatermark(
      rows.withColumn("simhash", graft.ops.Dedup.simHash(col(textCol))),
      Seq("simhash"), lateness)
      .drop("simhash")

  final case class SeenKey(key: String)
  final case class KeyedRow(key: String, payload: String)

  /** Cross-batch first-seen dedup with explicit keyed state: emits a
    * row only the first time its key is seen (the streaming form of
    * the sink-existence dedup, scraper_utils.py:56-61). Pass a
    * `stateTtl` in production to bound the store via processing-time
    * timeouts; None keeps state forever (fine for bounded key spaces
    * and for deterministic tests — timeout batches would otherwise
    * fire continuously). */
  def firstSeenDedup(rows: Dataset[KeyedRow],
      stateTtl: Option[String] = None): Dataset[KeyedRow] = {
    import rows.sparkSession.implicits._
    val conf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, KeyedRow](
        OutputMode.Append(), conf) {
        (key: String, it: Iterator[KeyedRow], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // key already emitted
          else {
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            it.take(1) // first occurrence only, in-batch dups dropped too
          }
      }
  }

  final case class TermRow(key: String, term: String)
  final case class HeavyHit(key: String, term: String, count: Long)

  /** Misra-Gries update: k counters regardless of stream length —
    * the state-store entry stays O(k) forever. Same semantics as the
    * batch [[graft.ops.Sketches.MisraGries]] Aggregator's reduce. */
  private def mgAdd(m: Map[String, Long], t: String,
      k: Int): Map[String, Long] =
    if (m.contains(t)) m.updated(t, m(t) + 1L)
    else if (m.size < k) m.updated(t, 1L)
    else m.collect { case (x, c) if c > 1L => x -> (c - 1L) }

  /** Streaming heavy hitters: a Misra-Gries summary maintained as
    * keyed state across micro-batches. Emits each group's CURRENT
    * summary every batch (update mode), largest counters first. The
    * classic guarantee survives streaming because MG is
    * insertion-incremental: after any prefix of the stream, every term
    * with true frequency > N/k is present, with estimate in
    * [true - N/k, true].
    *
    * At scale: one shuffle on the group key per batch; state is O(k)
    * per key (never the term vocabulary), so the state store is
    * bounded by keys x k — the property that lets this run forever on
    * an unbounded stream. */
  def streamingHeavyHitters(rows: Dataset[TermRow],
      k: Int = 8): Dataset[HeavyHit] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[Map[String, Long], HeavyHit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[TermRow],
            state: GroupState[Map[String, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, Long])
          it.foreach(r => m = mgAdd(m, r.term, k))
          state.update(m)
          m.toSeq.sortBy { case (t, c) => (-c, t) }
            .map { case (t, c) => HeavyHit(key, t, c) }.iterator
      }
  }

  final case class FunnelEvent(userId: Long, eventType: String, tsNs: Long)
  final case class FunnelState(stage: Int, tsNs: Long)
  final case class FunnelProgress(userId: Long, stage: Int,
      stageName: String)

  /** Streaming ordered funnel — the unbounded twin of
    * [[graft.ops.EventAnalytics.funnel]]: per-user keyed state is the
    * highest completed stage and its timestamp (two fields, O(1)
    * forever); each batch advances the state machine over its events
    * in timestamp order and emits the user's current stage (update
    * mode). Within a batch, out-of-order events are handled by the
    * sort; an event arriving in a LATER batch than a ts-later event
    * it should have preceded is missed — the inherent tradeoff of
    * O(1) state (buffering to the watermark is the alternative, at
    * O(events-in-window) state per user). */
  def streamingFunnel(events: Dataset[FunnelEvent],
      stages: Seq[String] = Seq("signup", "view", "click", "purchase"))
      : Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val stageOf = stages.zipWithIndex.toMap
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FunnelEvent],
            state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          it.toSeq.sortBy(e => (e.tsNs, e.eventType)).foreach { e =>
            if (st.stage < stages.length &&
                stageOf.get(e.eventType).contains(st.stage) &&
                (st.stage == 0 || e.tsNs > st.tsNs))
              st = FunnelState(st.stage + 1, e.tsNs)
          }
          state.update(st)
          if (st.stage == 0) Iterator.empty
          else Iterator.single(
            FunnelProgress(user, st.stage, stages(st.stage - 1)))
      }
  }

  final case class BucketCount(key: String, bucket: Long, cnt: Long)
  final case class AnomalyStats(n: Long, total: Long, sumsq: Long)
  final case class AnomalyFlag(key: String, bucket: Long, cnt: Long,
      nSoFar: Long)

  /** Streaming volume-anomaly detection — the unbounded twin of
    * [[graft.ops.EventAnalytics.hourlyAnomalies]]: per key the state
    * is just (n, total, sumsq) — three longs, O(1) forever — updated
    * as finalized bucket counts arrive; a bucket is flagged against
    * the statistics of the buckets seen BEFORE it using the same
    * cleared-denominator integer test as the batch operator
    * (|c·n − total|² > 9·(n·sumsq − total²)). Emits flags in update
    * mode; n >= 2 guards the degenerate start. Upstream, the bucket
    * counts themselves come from a watermarked windowed count — the
    * standard two-stage shape (window agg, then keyed state). */
  def streamingAnomalies(buckets: Dataset[BucketCount])
      : Dataset[AnomalyFlag] = {
    import buckets.sparkSession.implicits._
    buckets.groupByKey(_.key)
      .flatMapGroupsWithState[AnomalyStats, AnomalyFlag](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[BucketCount],
            state: GroupState[AnomalyStats]) =>
          var st = state.getOption.getOrElse(AnomalyStats(0L, 0L, 0L))
          val flags = scala.collection.mutable.ArrayBuffer.empty[AnomalyFlag]
          // deterministic in-batch order: process buckets by id
          it.toSeq.sortBy(b => (b.bucket, b.cnt)).foreach { b =>
            val dev = b.cnt * st.n - st.total
            if (st.n >= 2 &&
                dev * dev > 9L * (st.n * st.sumsq - st.total * st.total))
              flags += AnomalyFlag(key, b.bucket, b.cnt, st.n)
            st = AnomalyStats(st.n + 1, st.total + b.cnt,
              st.sumsq + b.cnt * b.cnt)
          }
          state.update(st)
          flags.iterator
      }
  }
}
