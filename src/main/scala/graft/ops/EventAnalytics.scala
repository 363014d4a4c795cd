package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Event-stream analytics over the `events` table: ordered-funnel
  * completion, KMV distinct sketching, sequence mining, and retention
  * cohorts — the product-analytics operator family (mirrors the
  * reference's progress/counter reporting generalized to event data;
  * cf. scraper.py's per-run counters).
  *
  * Timestamps arrive as exact nanosecond BIGINTs (the
  * `nanosAsLong` read path), so every ordering and bucket boundary is
  * integer arithmetic — `ts div N` here, `epoch_ns(ts) // N` in the
  * DuckDB oracles — never a double of 1e18 magnitude, which would
  * round past 2^53 and shift bucket edges.
  */
object EventAnalytics {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"))

  /** Ordered funnel: how many users completed each prefix of
    * signup → view → click → purchase, where each step must occur
    * strictly after the user's previous step. Stages chain through
    * per-user min-timestamp aggregates; after the first shuffle on
    * user_id every later join/aggregate is co-partitioned, so the
    * funnel costs one corpus shuffle regardless of stage count. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    def stage(prev: DataFrame, prevCol: String, tpe: String,
        out: String): DataFrame =
      e.filter(col("event_type") === tpe)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(out))
    val t1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = stage(t1.select(col("user_id"), col("t1")), "t1", "view", "t2")
    val t3 = stage(t2.select(col("user_id"), col("t2")), "t2", "click", "t3")
    val t4 = stage(t3.select(col("user_id"), col("t3")), "t3", "purchase",
      "t4")
    t1.agg(count(lit(1)).as("n_users"))
      .select(lit("1_signup").as("step"), col("n_users"))
      .unionAll(t2.agg(count(lit(1)).as("n_users"))
        .select(lit("2_view").as("step"), col("n_users")))
      .unionAll(t3.agg(count(lit(1)).as("n_users"))
        .select(lit("3_click").as("step"), col("n_users")))
      .unionAll(t4.agg(count(lit(1)).as("n_users"))
        .select(lit("4_purchase").as("step"), col("n_users")))
      .orderBy(col("step"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per event_type,
    * reported against the exact count: keep each group's k smallest
    * md5-fraction draws over its distinct users; the estimate is
    * (k-1) / r_k with r_k the k-th smallest fraction (exact count
    * when the group holds fewer than k distinct values — the
    * standard small-set fallback). Every draw is the md5-nibble
    * fraction both engines decode identically, so the sketch is
    * hash-checkable — unlike HLL, whose register layout is
    * engine-private. Scale shape: distinct (type, user) pairs reduce
    * through the mergeable [[Sketches.BottomKScored]] buffer — k-entry
    * partial state map-side, never a per-type sort task — the same
    * buffer the streaming variant keeps. */
  def kmvDistinct(s: SparkSession, d: String, k: Int = 32): DataFrame = {
    val users = ev(s, d)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("fr", Curation.md5Frac32(col("user_id")))
    // The udaf below binds user_id to Scored.id: Long. A generator
    // shipping user_id as STRING/DOUBLE would implicit-cast silently —
    // nulled or reordered ids would corrupt the (fr, user_id)
    // tie-break instead of failing loudly, the same representational
    // drift Tables.events guards for ts. Pin the contract here.
    val uidType = users.schema("user_id").dataType
    require(uidType == org.apache.spark.sql.types.LongType,
      s"events.user_id has type $uidType; kmvDistinct requires BIGINT " +
        "(BottomKScored binds Scored.id: Long)")
    // the k smallest draws per type via the mergeable bottom-k
    // Aggregator — k-entry partial buffers map-side, k rows shuffled
    // per partition per type — NOT a rank window, which would funnel
    // every distinct user of a type through one task's sort (r14; the
    // selection and (fr, user_id) tie-break are identical, so the
    // estimate and its oracle hash are unchanged). This is also just
    // what a KMV sketch IS: the same buffer the streaming variant
    // keeps.
    val bk = udaf(new Sketches.BottomKScored(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
    users
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"),
        bk(col("user_id"), col("fr")).as("sk"))
      .select(col("event_type"), col("n_exact"),
        round(when(size(col("sk")) < k, col("n_exact").cast("double"))
          .otherwise(lit((k - 1).toDouble)
            / element_at(col("sk"), k).getField("score")), 6)
          .as("kmv_est"))
      .orderBy(col("event_type"))
  }

  /** Sequence mining: the top event-type trigrams by frequency across
    * user journeys, consecutive in (ts, event_id) order within each
    * user. The lead-window device over the per-user stream; counting
    * is map-side combined over the type³ key space; selection is a
    * bounded top-k with a total (cnt DESC, a, b, c) order. */
  def eventTrigrams(s: SparkSession, d: String,
      topK: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .select(col("user_id"), col("event_type").as("a"),
        lead(col("event_type"), 1).over(w).as("b"),
        lead(col("event_type"), 2).over(w).as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"), col("c"))
      .limit(topK)
  }

  /** Retention cohorts: users grouped by first-seen day; for each
    * (cohort day, day offset) the number of cohort users active that
    * day. All integer nanosecond arithmetic; two shuffles (per-user
    * min, then cohort-offset counts over distinct user-days). */
  def retentionCohorts(s: SparkSession, d: String): DataFrame = {
    val days = ev(s, d)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Conversion latency percentiles: per user, the time from first
    * signup to the first purchase strictly after it; p50/p90/p99 as
    * EXACT rank-at-ceil(q·n) order statistics (the q108 discipline —
    * interpolation rules differ between engines, ranks don't). The
    * heavy work (two min-aggs) is user-partitioned shuffles; the rank
    * pass runs over the whole-seconds VALUE MARGINAL — bounded by the
    * latency range (cf. the q133 device), so no window ever sees the
    * user-sized table, let alone the event stream. One row:
    * (n_converted, p50_s, p90_s, p99_s). */
  def conversionLatency(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val t1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val marg = e.filter(col("event_type") === "purchase")
      .join(t1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts") - col("t1")).as("lat"))
      .select(expr("lat DIV 1000000000").as("lat_s"))
      .groupBy(col("lat_s")).agg(count(lit(1)).as("c"))
      .transform(GraftSession.cut(_))
    val w = Window.orderBy(col("lat_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = marg.agg(sum(col("c")).as("n"))
    // the value at global rank r depends only on the value ordering,
    // so the per-user tiebreak of the row formulation drops out
    def atRank(q: Double): Column =
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("lat_s")))
    marg.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(n))
      .agg(max(col("n")).as("n_converted"),
        atRank(0.5).as("p50_s"), atRank(0.9).as("p90_s"),
        atRank(0.99).as("p99_s"))
  }

  /** EWMA smoothing level per event type over its hourly counts
    * (alpha = 0.25 — an exact binary fraction, so each fold step is
    * one IEEE multiply-add both engines reproduce bit-for-bit). The
    * fold runs in hour order over the per-type bucket list via
    * sort_array+aggregate seeded with the first bucket, mirroring
    * DuckDB's list_reduce seeding. Hour-bucket lists are bounded by
    * the time range, not event volume. */
  def ewmaLevel(s: SparkSession, d: String): DataFrame = {
    val hourly = ev(s, d)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    hourly.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("hour"), col("cnt"))))
        .as("xs"))
      .select(col("event_type"), size(col("xs")).as("n_buckets"),
        round(expr("aggregate(slice(xs, 2, size(xs) - 1), " +
          "CAST(xs[0].cnt AS DOUBLE), " +
          "(acc, x) -> CAST(0.25 AS DOUBLE) * CAST(x.cnt AS DOUBLE) " +
          "+ CAST(0.75 AS DOUBLE) * acc)"), 6).as("ewma_level"))
      .orderBy(col("event_type"))
  }

  /** Volume-anomaly detection: hour buckets whose event count sits
    * more than 3 population standard deviations from the hour-bucket
    * mean of their event type. The z-score test is cross-multiplied
    * into exact integer arithmetic — |c·n − total|² > 9·(n·sumsq −
    * total²) is z² > 9 with every division cleared — so the flagged
    * set hash-matches DuckDB exactly, with no float variance formula
    * to disagree over. The quadratic terms are computed in
    * DECIMAL(38,0) here and HUGEINT in the oracle (both exact 128-bit
    * paths): with H hour buckets of count ~c per type, the largest
    * term is ~9·(c·H)², in range while c·H < 1e19 — wildly past any
    * real corpus, and far past the BIGINT bound of c·H < 3e9 that the
    * cleared form would otherwise hit (where ANSI engines abort the
    * query rather than mis-flag). Scale shape: one shuffle to hourly
    * counts (map-side combined), a per-type stats table of #types
    * rows broadcast back. */
  def hourlyAnomalies(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(38,0)"
    val hourly = ev(s, d)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("total"),
        // cast-then-multiply: cnt² must not round-trip through BIGINT
        sum(col("cnt").cast(dec) * col("cnt")).as("sumsq"))
    hourly.join(broadcast(stats), "event_type")
      .filter(col("n") >= lit(2L))
      .withColumn("dev",
        col("cnt").cast(dec) * col("n") - col("total"))
      .filter(col("dev") * col("dev") >
        lit(9L) * (col("n").cast(dec) * col("sumsq")
          - col("total").cast(dec) * col("total")))
      .select(col("event_type"), col("hour"), col("cnt"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Per-event-type OLS TREND over the hourly count series: slope and
    * intercept of count-vs-hour, the "is this event type growing or
    * decaying, and how fast" statistic behind rate alerts and capacity
    * forecasts. The fit is closed-form least squares on integer
    * sufficient statistics — x is the hour index REBASED to each
    * type's first hour (so products stay ~2^48, far from BIGINT
    * range), y the hourly count; n, Σx, Σy, Σxy, Σx² are exact BIGINT
    * sums, and slope/intercept are single double divisions of those
    * integers:
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
    * so both engines divide the SAME two integers — cross-engine exact
    * with no float fold anywhere. den = 0 (a single occupied hour)
    * yields NULL via nullif on both sides.
    *
    * Scale shape: one map-side-combined (type, hour) count, one
    * keyed MIN for the rebase, one 5-sum aggregate per type — state is
    * types x 5 longs, never a series in memory. */
  def trendSlope(s: SparkSession, d: String): DataFrame = {
    // cut: hour buckets feed the rebase MIN and the stats aggregate
    val hours = GraftSession.cut(Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("h"))
      .agg(count(lit(1)).as("y")))
    val base = hours.groupBy(col("event_type")).agg(min(col("h")).as("h0"))
    val st = hours.join(base, "event_type")
      .select(col("event_type"), (col("h") - col("h0")).as("x"), col("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val den = nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0L))
    st.select(col("event_type"), col("n").as("n_hours"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / den.cast("double"), 6).as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / den.cast("double"), 6).as("intercept"))
      .orderBy(col("event_type"))
  }

  /** Population Stability Index of each event type's HOUR-OF-DAY
    * profile, early half vs late half of the stream — the standard
    * ML-monitoring drift score (PSI < 0.1 stable, > 0.25 shifted),
    * here answering "did this event type's daily rhythm change".
    * The stream splits at the global midpoint hour ((min+max+1) DIV 2,
    * exact integer, broadcast from one min/max agg); each half's
    * 24-bucket distribution gets add-one smoothing ((cnt+1)/(n+24), so
    * empty buckets never divide by zero), and
    *   psi = Σ_b (p_b − q_b) · ln(p_b / q_b)
    * folds in BUCKET order (the q106 device, 24-entry lists) so the
    * DuckDB mirror hash-matches. State is types x 24 cells — constant
    * per type regardless of stream size. */
  def psiDrift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), expr("ts div 3600000000000").as("h"))
    val mm = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    // cut: the types x 24 cells feed the totals and the psi fold
    val cells = GraftSession.cut(ev.crossJoin(broadcast(mm))
      .select(col("event_type"), (col("h") % 24).as("b"),
        (col("h") < expr("(h0 + h1 + 1) DIV 2")).as("early"))
      .groupBy(col("event_type"), col("b"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("ce"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("cl")))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("ce")).as("ne"), sum(col("cl")).as("nl"))
    val term = {
      val p = (col("ce") + 1L).cast("double") /
        (col("ne") + 24L).cast("double")
      val q = (col("cl") + 1L).cast("double") /
        (col("nl") + 24L).cast("double")
      ((p - q) * log(p / q)).as("t")
    }
    cells.join(totals, "event_type")
      .select(col("event_type"), col("b"), col("ne"), col("nl"), term)
      .groupBy(col("event_type"))
      .agg(first(col("ne")).as("n_early"), first(col("nl")).as("n_late"),
        round(aggregate(
          transform(sort_array(collect_list(struct(col("b"), col("t")))),
            st => st.getField("t")),
          lit(0.0), (acc, v) => acc + v), 6).as("psi"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracle for [[psiDrift]]. */
  def psiDriftSql: String =
    """WITH ev AS (SELECT event_type,
      |    epoch_ns(ts) // 3600000000000 AS h FROM events),
      |mm AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
      |cells AS (
      |  SELECT event_type, b,
      |    CAST(SUM(early) AS BIGINT) AS ce,
      |    CAST(SUM(1 - early) AS BIGINT) AS cl
      |  FROM (SELECT event_type, h % 24 AS b,
      |          CASE WHEN h < (h0 + h1 + 1) // 2 THEN 1 ELSE 0 END
      |            AS early
      |        FROM ev, mm) s
      |  GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(SUM(ce) AS BIGINT) AS ne,
      |               CAST(SUM(cl) AS BIGINT) AS nl
      |        FROM cells GROUP BY 1)
      |SELECT c.event_type, t.ne AS n_early, t.nl AS n_late,
      |  round(list_sum(list(
      |    ((CAST(ce + 1 AS DOUBLE) / CAST(ne + 24 AS DOUBLE))
      |     - (CAST(cl + 1 AS DOUBLE) / CAST(nl + 24 AS DOUBLE)))
      |    * ln((CAST(ce + 1 AS DOUBLE) / CAST(ne + 24 AS DOUBLE))
      |       / (CAST(cl + 1 AS DOUBLE) / CAST(nl + 24 AS DOUBLE)))
      |    ORDER BY b)), 6) AS psi
      |FROM cells c JOIN tot t ON t.event_type = c.event_type
      |GROUP BY c.event_type, t.ne, t.nl
      |ORDER BY c.event_type""".stripMargin

  /** Goodness of fit for the q146 trend: R² per event type from the
    * same exact BIGINT sufficient statistics plus Σy² —
    * R² = (nΣxy−ΣxΣy)² / ((nΣxx−(Σx)²)(nΣyy−(Σy)²)). The inner
    * terms stay exact integers; only the final square-and-divide runs
    * in doubles, written identically on both engines. A slope without
    * its R² is how dashboards lie — this is the honesty column. */
  def trendR2(s: SparkSession, d: String): DataFrame = {
    val hours = GraftSession.cut(Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("h"))
      .agg(count(lit(1)).as("y")))
    val base = hours.groupBy(col("event_type")).agg(min(col("h")).as("h0"))
    val st = hours.join(base, "event_type")
      .select(col("event_type"), (col("h") - col("h0")).as("x"), col("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val d1 = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val d2 = (col("n") * col("syy") - col("sy") * col("sy"))
      .cast("double")
    st.select(col("event_type"), col("n").as("n_hours"),
        round(num * num / nullif(d1 * d2, lit(0.0)), 6).as("r2"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracle for [[trendR2]]. */
  def trendR2Sql: String =
    """WITH hrs AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
      |         COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |base AS (SELECT event_type, MIN(h) AS h0 FROM hrs GROUP BY 1),
      |st AS (
      |  SELECT hrs.event_type, COUNT(*) AS n,
      |    CAST(SUM(h - h0) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM((h - h0) * y) AS BIGINT) AS sxy,
      |    CAST(SUM((h - h0) * (h - h0)) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM hrs JOIN base ON base.event_type = hrs.event_type
      |  GROUP BY 1)
      |SELECT event_type, n AS n_hours,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |      * CAST(n * sxy - sx * sy AS DOUBLE)
      |    / nullif(CAST(n * sxx - sx * sx AS DOUBLE)
      |      * CAST(n * syy - sy * sy AS DOUBLE), 0.0), 6) AS r2
      |FROM st ORDER BY event_type""".stripMargin

  /** DuckDB oracle for [[trendSlope]]. */
  def trendSlopeSql: String =
    """WITH hrs AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
      |         COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |base AS (SELECT event_type, MIN(h) AS h0 FROM hrs GROUP BY 1),
      |st AS (
      |  SELECT hrs.event_type, COUNT(*) AS n,
      |    CAST(SUM(h - h0) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM((h - h0) * y) AS BIGINT) AS sxy,
      |    CAST(SUM((h - h0) * (h - h0)) AS BIGINT) AS sxx
      |  FROM hrs JOIN base ON base.event_type = hrs.event_type
      |  GROUP BY 1)
      |SELECT event_type, n AS n_hours,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(nullif(n * sxx - sx * sx, 0) AS DOUBLE), 6) AS slope,
      |  round(CAST(sy * sxx - sx * sxy AS DOUBLE)
      |    / CAST(nullif(n * sxx - sx * sx, 0) AS DOUBLE), 6) AS intercept
      |FROM st ORDER BY event_type""".stripMargin

  /** Gap-based sessionization, reported as the session-length
    * distribution: a user's events split into sessions wherever the
    * inactivity gap exceeds `gapNs` (default 30 min), then sessions
    * roll up by event count — (n_events, n_sessions, total_dur_ns),
    * all exact nanosecond integers. The session id is the classic
    * running sum of new-session markers (lag + cumulative SUM over an
    * explicit ROWS frame, so both engines fold the same frame).
    * Scale shape: ONE shuffle on user_id; both windows and the
    * per-session aggregate are co-partitioned on it, and the final
    * distribution rollup is map-side combined over a key space
    * bounded by the longest session, not event volume. */
  def sessionLengths(s: SparkSession, d: String,
      gapNs: Long = 1800000000000L): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    ev(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_s", when(col("prev").isNull ||
        col("ts") - col("prev") > gapNs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts")) - min(col("ts"))).as("dur"))
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("dur")).as("total_dur_ns"))
      .orderBy(col("n_events"))
  }

  /** DuckDB oracle for [[sessionLengths]]. */
  def sessionLengthsSql(gapNs: Long = 1800000000000L): String =
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts, event_id
       |            FROM events),
       |m AS (SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > $gapNs
       |         THEN 1 ELSE 0 END AS new_s,
       |    event_id
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sid AS (SELECT user_id, ts,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM m),
       |sess AS (SELECT user_id, sid, COUNT(*) AS n_events,
       |    CAST(MAX(ts) - MIN(ts) AS BIGINT) AS dur
       |  FROM sid GROUP BY 1, 2)
       |SELECT n_events, COUNT(*) AS n_sessions,
       |  CAST(SUM(dur) AS BIGINT) AS total_dur_ns
       |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin

  /** First-order Markov transition matrix over event types: for each
    * consecutive (a → b) pair within a user's (ts, event_id)-ordered
    * stream, the transition count and row-normalized probability —
    * the standard user-journey / next-event model. The per-source
    * totals table is #types rows, broadcast; prob is one exact
    * integer ratio rounded at 6, so the matrix hash-matches. One
    * user_id shuffle for the lead window, then a map-side-combined
    * count over the type² key space. */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // cut: the type²-sized pair counts feed the totals and the
    // output — one events scan + window, not two
    val pairs = GraftSession.cut(ev(s, d)
      .select(col("user_id"), col("event_type").as("a"),
        lead(col("event_type"), 1).over(w).as("b"))
      .filter(col("b").isNotNull)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cnt")))
    val totals = pairs.groupBy(col("a")).agg(sum(col("cnt")).as("ta"))
    pairs.join(broadcast(totals), "a")
      .select(col("a"), col("b"), col("cnt"),
        round(col("cnt").cast("double") / col("ta").cast("double"), 6)
          .as("prob"))
      .orderBy(col("a"), col("b"))
  }

  /** DuckDB oracle for [[eventTransitions]]. */
  def eventTransitionsSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts,
      |            event_id FROM events),
      |pairs AS (
      |  SELECT a, b, COUNT(*) AS cnt FROM (
      |    SELECT event_type AS a,
      |      lead(event_type) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS b
      |    FROM ev) s
      |  WHERE b IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT a, CAST(SUM(cnt) AS BIGINT) AS ta
      |        FROM pairs GROUP BY 1)
      |SELECT pairs.a, b, cnt,
      |  round(CAST(cnt AS DOUBLE) / CAST(ta AS DOUBLE), 6) AS prob
      |FROM pairs JOIN tot ON tot.a = pairs.a
      |ORDER BY pairs.a, b""".stripMargin

  /** User-growth curve: per day, the count of first-seen users and
    * the running cumulative user base — the adoption report every
    * product dashboard opens with. First-seen day is one keyed MIN
    * over users; the cumulative sum's global window runs over the
    * DAYS table (time-range sized, dozens-to-thousands of rows — the
    * one place a single-partition window is the right plan), with an
    * explicit ROWS frame both engines fold identically. */
  def userGrowth(s: SparkSession, d: String): DataFrame = {
    val firstDay = ev(s, d)
      .groupBy(col("user_id"))
      .agg(min(expr("ts div 86400000000000")).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstDay.groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  /** DuckDB oracle for [[userGrowth]]. */
  def userGrowthSql: String =
    """WITH fd AS (
      |  SELECT user_id, MIN(epoch_ns(ts) // 86400000000000) AS day
      |  FROM events GROUP BY 1),
      |daily AS (SELECT day, COUNT(*) AS new_users FROM fd GROUP BY 1)
      |SELECT day, new_users,
      |  CAST(SUM(new_users) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum_users
      |FROM daily ORDER BY day""".stripMargin

  /** Wilson 95% confidence intervals on each funnel step's
    * conversion rate — the uncertainty a dashboard must show before
    * anyone acts on a step-to-step drop (at small n the naive rate
    * is noise; Wilson stays inside [0,1] where the normal interval
    * leaks). Step counts come from [[funnel]]; the lead window runs
    * over its FOUR rows. z is the exact double literal 1.959964 on
    * both engines and every input to the float formula is an exact
    * integer count, so the interval hash-matches. */
  def funnelWilson(s: SparkSession, d: String,
      z: Double = 1.959964): DataFrame = {
    val w = Window.orderBy(col("step"))
    val pairs = funnel(s, d)
      .withColumn("k", lead(col("n_users"), 1).over(w))
      .filter(col("k").isNotNull)
    val n = col("n_users").cast("double")
    val k = col("k").cast("double")
    val p = k / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / n
      + z2 / (lit(4.0) * n * n)) / denom
    pairs.select(col("step").as("from_step"),
      col("n_users").as("n"), col("k"),
      round(p, 6).as("rate"),
      round(center - half, 6).as("ci_lo"),
      round(center + half, 6).as("ci_hi"))
      .orderBy(col("from_step"))
  }

  /** DuckDB oracle for [[funnelWilson]]. */
  def funnelWilsonSql(z: Double = 1.959964): String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
       |            FROM events),
       |t1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev
       |       WHERE event_type = 'signup' GROUP BY 1),
       |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2
       |  FROM ev e JOIN t1 ON t1.user_id = e.user_id
       |  WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY 1),
       |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3
       |  FROM ev e JOIN t2 ON t2.user_id = e.user_id
       |  WHERE e.event_type = 'click' AND e.ts > t2.t2 GROUP BY 1),
       |t4 AS (SELECT e.user_id, MIN(e.ts) AS t4
       |  FROM ev e JOIN t3 ON t3.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts > t3.t3 GROUP BY 1),
       |c AS (
       |  SELECT '1_signup' AS step, (SELECT COUNT(*) FROM t1) AS n
       |  UNION ALL SELECT '2_view', (SELECT COUNT(*) FROM t2)
       |  UNION ALL SELECT '3_click', (SELECT COUNT(*) FROM t3)
       |  UNION ALL SELECT '4_purchase', (SELECT COUNT(*) FROM t4)),
       |pr AS (SELECT step, n, lead(n) OVER (ORDER BY step) AS k
       |       FROM c)
       |SELECT step AS from_step, n, k,
       |  round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       |  round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
       |      + ${z * z} / (2.0 * CAST(n AS DOUBLE)))
       |      / (1.0 + ${z * z} / CAST(n AS DOUBLE))
       |    - $z * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
       |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
       |        / CAST(n AS DOUBLE)
       |      + ${z * z} / (4.0 * CAST(n AS DOUBLE)
       |        * CAST(n AS DOUBLE)))
       |      / (1.0 + ${z * z} / CAST(n AS DOUBLE)), 6) AS ci_lo,
       |  round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
       |      + ${z * z} / (2.0 * CAST(n AS DOUBLE)))
       |      / (1.0 + ${z * z} / CAST(n AS DOUBLE))
       |    + $z * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
       |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
       |        / CAST(n AS DOUBLE)
       |      + ${z * z} / (4.0 * CAST(n AS DOUBLE)
       |        * CAST(n AS DOUBLE)))
       |      / (1.0 + ${z * z} / CAST(n AS DOUBLE)), 6) AS ci_hi
       |FROM pr WHERE k IS NOT NULL ORDER BY from_step""".stripMargin

  /** Peak-hour profile: each event type's argmax hour-of-day with
    * its share of the type's volume — the seasonal fingerprint q150
    * monitors, reduced to the headline number. Tie-break is explicit
    * (count DESC, hour ASC) via a row_number over each type's ≤ 24
    * profile rows, so both engines pick the same peak. */
  def peakHours(s: SparkSession, d: String): DataFrame = {
    val prof = ev(s, d)
      .groupBy(col("event_type"),
        (expr("ts div 3600000000000") % 24).as("hod"))
      .agg(count(lit(1)).as("cnt"))
    val tot = prof.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cnt").desc, col("hod"))
    prof.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(tot), "event_type")
      .select(col("event_type"), col("hod").as("peak_hour"),
        col("cnt").as("peak_cnt"),
        round(col("cnt").cast("double") / col("n").cast("double"), 6)
          .as("share"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracle for [[peakHours]]. */
  def peakHoursSql: String =
    """WITH prof AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) // 3600000000000) % 24 AS hod,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
      |        FROM prof GROUP BY 1),
      |r AS (SELECT event_type, hod, cnt,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY cnt DESC, hod) AS rn
      |  FROM prof)
      |SELECT r.event_type, hod AS peak_hour, cnt AS peak_cnt,
      |  round(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
      |FROM r JOIN tot ON tot.event_type = r.event_type
      |WHERE rn = 1 ORDER BY r.event_type""".stripMargin

  /** Windowed ordered funnel: q120's signup → view → click →
    * purchase chain with a DEADLINE — each step must land within
    * `windowNs` (default 24 h) of the user's FIRST signup, the form
    * a conversion-rate SLA actually uses (the unbounded funnel
    * overcounts stragglers). Same one-shuffle stage chaining as
    * [[funnel]]; the deadline is one exact integer comparison pushed
    * into each stage join. */
  def windowedFunnel(s: SparkSession, d: String,
      windowNs: Long = 86400000000000L): DataFrame = {
    val e = ev(s, d)
    def stage(prev: DataFrame, prevCol: String, tpe: String,
        out: String): DataFrame =
      e.filter(col("event_type") === tpe)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevCol) &&
          col("ts") - col("t1") <= windowNs)
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as(out), min(col("t1")).as("t1"))
    val t1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .withColumn("s1", col("t1"))
    val t2 = stage(t1.select(col("user_id"), col("s1").as("p"),
      col("t1")), "p", "view", "t2")
    val t3 = stage(t2.select(col("user_id"), col("t2").as("p"),
      col("t1")), "p", "click", "t3")
    val t4 = stage(t3.select(col("user_id"), col("t3").as("p"),
      col("t1")), "p", "purchase", "t4")
    t1.agg(count(lit(1)).as("n_users"))
      .select(lit("1_signup").as("step"), col("n_users"))
      .unionAll(t2.agg(count(lit(1)).as("n_users"))
        .select(lit("2_view").as("step"), col("n_users")))
      .unionAll(t3.agg(count(lit(1)).as("n_users"))
        .select(lit("3_click").as("step"), col("n_users")))
      .unionAll(t4.agg(count(lit(1)).as("n_users"))
        .select(lit("4_purchase").as("step"), col("n_users")))
      .orderBy(col("step"))
  }

  /** DuckDB oracle for [[windowedFunnel]]. */
  def windowedFunnelSql(windowNs: Long = 86400000000000L): String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
       |            FROM events),
       |t1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev
       |       WHERE event_type = 'signup' GROUP BY 1),
       |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2, MIN(t1.t1) AS t1
       |  FROM ev e JOIN t1 ON t1.user_id = e.user_id
       |  WHERE e.event_type = 'view' AND e.ts > t1.t1
       |    AND e.ts - t1.t1 <= $windowNs
       |  GROUP BY 1),
       |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3, MIN(t2.t1) AS t1
       |  FROM ev e JOIN t2 ON t2.user_id = e.user_id
       |  WHERE e.event_type = 'click' AND e.ts > t2.t2
       |    AND e.ts - t2.t1 <= $windowNs
       |  GROUP BY 1),
       |t4 AS (SELECT e.user_id, MIN(e.ts) AS t4
       |  FROM ev e JOIN t3 ON t3.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts > t3.t3
       |    AND e.ts - t3.t1 <= $windowNs
       |  GROUP BY 1)
       |SELECT '1_signup' AS step, (SELECT COUNT(*) FROM t1) AS n_users
       |UNION ALL SELECT '2_view', (SELECT COUNT(*) FROM t2)
       |UNION ALL SELECT '3_click', (SELECT COUNT(*) FROM t3)
       |UNION ALL SELECT '4_purchase', (SELECT COUNT(*) FROM t4)
       |ORDER BY step""".stripMargin

  /** DAU / WAU / stickiness per day: daily active users, 7-day
    * rolling active users, and their ratio — the engagement triple on
    * every growth dashboard. Rolling DISTINCT does not merge, so WAU
    * is computed exactly by fanning each (user, day) out to the ≤ 7
    * window days it supports (a bounded explode on the user-day
    * table, which is already deduped and tiny relative to the event
    * stream) and distinct-counting per window day. Days with no
    * activity are not reported (join back on the dau table). */
  def dauWau(s: SparkSession, d: String): DataFrame = {
    val ud = GraftSession.cut(ev(s, d)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct())
    val dau = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6L)).as("wd"))
      .distinct()
      .groupBy(col("wd")).agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("day") === wau("wd"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("stickiness"))
      .orderBy(col("day"))
  }

  /** DuckDB oracle for [[dauWau]]. */
  def dauWauSql: String =
    """WITH ud AS (SELECT DISTINCT user_id,
      |    epoch_ns(ts) // 86400000000000 AS day FROM events),
      |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
      |wau AS (SELECT wd, COUNT(*) AS wau FROM (
      |    SELECT DISTINCT user_id,
      |      unnest(generate_series(day, day + 6)) AS wd
      |    FROM ud) GROUP BY 1)
      |SELECT day, dau, wau,
      |  round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6)
      |    AS stickiness
      |FROM dau JOIN wau ON wau.wd = dau.day
      |ORDER BY day""".stripMargin

  /** Lag-1 autocorrelation of each event type's hourly count series —
    * the burstiness / self-similarity signal behind traffic
    * forecasting. The series is DENSIFIED over the type's full
    * [min_hour, max_hour] span (missing hours count 0, via
    * sequence+explode here, generate_series in the oracle) so the
    * lag pairs are true consecutive hours. Pearson r over the
    * (y_t, y_{t+1}) pairs is assembled from five exact BIGINT sums;
    * the two variance terms stay separate under their own
    * correctly-rounded IEEE sqrt (never multiplied as integers, which
    * would square the magnitude toward overflow), so both engines
    * compute round(num / (sqrt(d1)·sqrt(d2)), 6) from identical
    * integers. Degenerate spans (a single hour, or zero variance)
    * yield NULL via nullif. Scale shape: hourly counts are map-side
    * combined; the dense series is hours × types rows — time-range
    * sized, not event-volume sized. */
  def lag1Autocorr(s: SparkSession, d: String): DataFrame = {
    // cut: the hour-bucket table feeds the span and the densify join
    val hours = GraftSession.cut(ev(s, d)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("h"))
      .agg(count(lit(1)).as("cnt")))
    val span = hours.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val dense = span
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hours, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("cnt"), lit(0L)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val st = dense
      .withColumn("z", lead(col("y"), 1).over(w))
      .filter(col("z").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sx"),
        sum(col("z")).as("sz"), sum(col("y") * col("z")).as("sxz"),
        sum(col("y") * col("y")).as("sxx"),
        sum(col("z") * col("z")).as("szz"))
    st.select(col("event_type"), col("n").as("n_pairs"),
        round((col("n") * col("sxz") - col("sx") * col("sz"))
            .cast("double")
          / nullif(
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double"))
            * sqrt((col("n") * col("szz") - col("sz") * col("sz"))
              .cast("double")), lit(0.0)), 6).as("r1"))
      .orderBy(col("event_type"))
  }

  /** Fano-factor burstiness per event type: variance/mean of the
    * DENSIFIED hourly count series (missing hours count as 0, the
    * [[lag1Autocorr]] densify device — burstiness over observed
    * buckets only would understate by construction). F = 1 is the
    * Poisson baseline; F > 1 is overdispersion (bursty arrivals, the
    * thing that decides whether a per-hour partition layout has hot
    * shards). Exact BIGINT sufficient statistics, F as ONE rounded
    * division of (n·Σy² − (Σy)²) by (n·Σy). */
  def fanoBurstiness(s: SparkSession, d: String): DataFrame = {
    val hours = GraftSession.cut(ev(s, d)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("h"))
      .agg(count(lit(1)).as("cnt")))
    val span = hours.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val st = span
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hours, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
    st.select(col("event_type"), col("n").as("n_hours"),
        round(col("sy").cast("double") / col("n").cast("double"), 6)
          .as("mean_rate"),
        round((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double")
          / nullif((col("n") * col("sy")).cast("double"), lit(0.0)), 6)
          .as("fano"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracle for [[fanoBurstiness]]. */
  def fanoBurstinessSql: String =
    """WITH hrs AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
      |         FROM hrs GROUP BY 1),
      |dense AS (
      |  SELECT g.event_type, COALESCE(hrs.cnt, 0) AS y
      |  FROM (SELECT event_type, unnest(generate_series(h0, h1)) AS h
      |        FROM span) g
      |  LEFT JOIN hrs ON hrs.event_type = g.event_type
      |    AND hrs.h = g.h),
      |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM dense GROUP BY 1)
      |SELECT event_type, n AS n_hours,
      |  round(CAST(sy AS DOUBLE) / n, 6) AS mean_rate,
      |  round(CAST(n * syy - sy * sy AS DOUBLE)
      |    / nullif(CAST(n * sy AS DOUBLE), 0.0), 6) AS fano
      |FROM st ORDER BY event_type""".stripMargin

  /** DuckDB oracle for [[lag1Autocorr]]. */
  def lag1AutocorrSql: String =
    """WITH hrs AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
      |         FROM hrs GROUP BY 1),
      |dense AS (
      |  SELECT g.event_type, g.h, COALESCE(hrs.cnt, 0) AS y
      |  FROM (SELECT event_type, unnest(generate_series(h0, h1)) AS h
      |        FROM span) g
      |  LEFT JOIN hrs ON hrs.event_type = g.event_type
      |    AND hrs.h = g.h),
      |prs AS (SELECT event_type, y,
      |    lead(y) OVER (PARTITION BY event_type ORDER BY h) AS z
      |  FROM dense),
      |st AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS sx, CAST(SUM(z) AS BIGINT) AS sz,
      |    CAST(SUM(y * z) AS BIGINT) AS sxz,
      |    CAST(SUM(y * y) AS BIGINT) AS sxx,
      |    CAST(SUM(z * z) AS BIGINT) AS szz
      |  FROM prs WHERE z IS NOT NULL GROUP BY 1)
      |SELECT event_type, n AS n_pairs,
      |  round(CAST(n * sxz - sx * sz AS DOUBLE)
      |    / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |           * sqrt(CAST(n * szz - sz * sz AS DOUBLE)), 0.0), 6)
      |    AS r1
      |FROM st ORDER BY event_type""".stripMargin

  /** Event-time out-of-orderness census — the number a streaming
    * watermark is sized from: per event type, over each user's
    * ARRIVAL stream (event_id is the ingest sequence), how often the
    * event time runs backwards and by how much. `n_inversions` counts
    * consecutive arrival pairs whose ts decreases, `max_backstep_ns`
    * is the largest backward jump (exact BIGINT nanos — exactly the
    * minimum watermark delay that would have kept every event of that
    * type), and the fraction is the only float. One lag window per
    * user stream (the trigram device), map-side-combined counts. */
  def outOfOrderCensus(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id"))
    ev(s, d)
      .select(col("event_type"), col("ts"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .filter(col("prev_ts").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("ts") < col("prev_ts"), 1L).otherwise(0L))
          .as("n_inversions"),
        coalesce(max(when(col("ts") < col("prev_ts"),
          col("prev_ts") - col("ts"))), lit(0L)).as("max_backstep_ns"))
      .select(col("event_type"), col("n_pairs"), col("n_inversions"),
        round(col("n_inversions").cast("double")
          / col("n_pairs").cast("double"), 6).as("inversion_frac"),
        col("max_backstep_ns"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracle for [[outOfOrderCensus]]. */
  def outOfOrderCensusSql: String =
    """WITH p AS (SELECT event_type, epoch_ns(ts) AS ts,
      |    lag(epoch_ns(ts), 1) OVER (PARTITION BY user_id
      |      ORDER BY event_id) AS prev_ts
      |  FROM events),
      |g AS (SELECT event_type, COUNT(*) AS n_pairs,
      |    COALESCE(SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END), 0)
      |      AS n_inversions,
      |    COALESCE(MAX(CASE WHEN ts < prev_ts THEN prev_ts - ts END),
      |      0) AS max_backstep_ns
      |  FROM p WHERE prev_ts IS NOT NULL GROUP BY event_type)
      |SELECT event_type, n_pairs,
      |  CAST(n_inversions AS BIGINT) AS n_inversions,
      |  round(CAST(n_inversions AS DOUBLE) / CAST(n_pairs AS DOUBLE),
      |    6) AS inversion_frac,
      |  CAST(max_backstep_ns AS BIGINT) AS max_backstep_ns
      |FROM g ORDER BY event_type""".stripMargin
}
