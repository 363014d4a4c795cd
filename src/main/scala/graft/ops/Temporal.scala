package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Relational.dsum

/** Temporal operators over the event stream, designed for the 100 TB
  * case: every operator is a single hash-shuffle on the entity key (or a
  * broadcast), never a per-row probe or an all-pairs time join.
  *
  * The events table's `ts` column is parquet TIMESTAMP(NANOS), read as
  * a nanosecond LONG (`spark.sql.legacy.parquet.nanosAsLong`); integer
  * `DIV` keeps the arithmetic exact (doubles cannot represent ~1e18).
  */
object Temporal {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  /** 2024-01-01T00:00:00Z in epoch nanoseconds (events start here). */
  private val BaseNs = 1704067200L * 1000 * 1000 * 1000

  /** Gap-based sessionization with Spark's native `session_window`:
    * events of one user closer than `gap` belong to one session. The
    * aggregation shuffles once on (user, merged-window) with map-side
    * partial merge — the same operator Structured Streaming uses for
    * stateful session windows, here in batch mode.
    * Reference analog: per-run grouping of scraped meetings into
    * crawl sessions (scraper.py:154-275 processes one portal visit as
    * a unit); generalized to the training-data event domain. */
  def sessionize(s: SparkSession, d: String,
      gap: String = "6 hours"): DataFrame =
    Tables.events(s, d)
      .withColumn("tsm", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(col("user_id"), session_window(col("tsm"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"), col("total_value"))

  /** Price updates derived from orders, remapped into the events' time
    * range: key = o_custkey mod 150 (the user-id domain), update time =
    * base + (o_orderkey mod 720) hours, one row per (key, time) with
    * the max price winning (deterministic). */
  private[ops] def priceUpdates(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy((col("o_custkey") % 150).as("user_id"),
        (lit(BaseNs) + (col("o_orderkey") % 720) * lit(HourNs)).as("uts"))
      .agg(max(col("o_totalprice")).as("upd_price"))

  /** As-of join: each event picks the most recent price update (same
    * user, update time <= event time), tie on equal timestamps going to
    * the update.
    *
    * Implemented as the scalable merge-asof: tag both inputs, union,
    * and carry the last non-null update value forward with a
    * `last(..., ignoreNulls)` running window per key — ONE shuffle on
    * the key, linear merge per partition, versus a per-event
    * subquery/probe (the reference's per-row `head_object` shape,
    * scraper.py:212-219, is exactly what this avoids). Oracle: DuckDB's
    * native ASOF LEFT JOIN. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val upd = priceUpdates(s, d)
      .select(col("user_id"), col("uts").as("t"), lit(0).as("typ"),
        lit(null).cast("long").as("event_id"), col("upd_price"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").as("t"), lit(1).as("typ"),
        col("event_id"), lit(null).cast("double").as("upd_price"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("typ"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    upd.unionByName(ev)
      .withColumn("asof_price", last(col("upd_price"), ignoreNulls = true)
        .over(w))
      .filter(col("typ") === 1)
      .select(col("event_id"), col("user_id"), col("asof_price"))
  }

  /** Range join: events against 20 fixed 90-minute windows spaced 36 h
    * apart. Implemented as a bucketed range join: each window explodes
    * to the hour buckets it spans (<= 2), events equi-join on their own
    * hour bucket (broadcast — the window table is tiny), and the exact
    * range predicate filters residuals. At scale this turns an
    * inequality join into an equi-join with bounded fan-out, instead of
    * a broadcast-nested-loop over every (event, window) pair. Oracle:
    * the plain inequality join in DuckDB. */
  def rangeJoinWindows(s: SparkSession, d: String): DataFrame = {
    val windows = s.range(20)
      .select(col("id").as("window_id"),
        (lit(BaseNs) + col("id") * lit(36 * HourNs)).as("ws"))
      .withColumn("we", col("ws") + lit(90L * 60 * 1000 * 1000 * 1000))
    val buckets = windows.withColumn("bucket",
      explode(sequence(expr("ws DIV 3600000000000"),
        expr("(we - 1) DIV 3600000000000"))))
    Tables.events(s, d)
      .withColumn("bucket", expr("ts DIV 3600000000000"))
      .join(broadcast(buckets), "bucket")
      .filter(col("ts") >= col("ws") && col("ts") < col("we"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
  }

  /** SCD2 interval build (gaps-and-islands): collapse each user's
    * event stream into change-history rows — one row per run of equal
    * event_type, with [valid_from, valid_to) validity and a version
    * number. The dimension-table maintenance shape: this is how you turn
    * an event log into a slowly-changing dimension. Two windows and one
    * groupBy, all partitioned by user_id, so after the first shuffle
    * everything is co-partitioned — one corpus shuffle total. */
  def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byVersion = Window.partitionBy(col("user_id"))
      .orderBy(col("version"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg", when(lag(col("event_type"), 1).over(byUser)
        .isNull.or(lag(col("event_type"), 1).over(byUser) =!=
          col("event_type")), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(byUser))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }

  /** Week-over-week revenue growth: weekly order-cents totals with
    * the previous week's total and the relative change — the
    * reporting lag-window staple. The heavy aggregation is one
    * map-side-combined (week -> cents) rollup; the lag window runs
    * over the WEEKS marginal (time-range sized — the one legitimate
    * global window, cf. q162), with growth an exact-integer ratio
    * rounded at 6 and NULL on the first week via nullif. */
  def weeklyRevenueGrowth(s: SparkSession, d: String): DataFrame = {
    val weekly = Tables.orders(s, d)
      .select(
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
          " DIV 604800000000").as("week"),
        expr("CAST(round(o_totalprice * 100, 0) AS LONG)").as("c"))
      .groupBy(col("week")).agg(sum(col("c")).as("rev_cents"))
    val w = Window.orderBy(col("week"))
    weekly
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .select(col("week"), col("rev_cents"), col("prev_cents"),
        round((col("rev_cents") - col("prev_cents")).cast("double")
          / nullif(col("prev_cents"), lit(0L)).cast("double"), 6)
          .as("wow_growth"))
      .orderBy(col("week"))
  }

  /** Inter-order gap distribution: per customer, the whole-day gaps
    * between consecutive orders, summarized as exact rank
    * percentiles — the reorder-cadence signal behind churn scoring.
    * The lag window is custkey-partitioned (one orders shuffle); the
    * rank pass runs over the gap-days MARGINAL (bounded by the date
    * range, q136's discipline), so no window sees the order rows.
    * One row: (n_gaps, p50_days, p90_days, max_days). */
  def interOrderGaps(s: SparkSession, d: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val marg = graft.GraftSession.cut(Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
          " DIV 86400000000").as("day"))
      .withColumn("gap", col("day") - lag(col("day"), 1).over(byCust))
      .filter(col("gap").isNotNull)
      .groupBy(col("gap")).agg(count(lit(1)).as("c")))
    val w = Window.orderBy(col("gap"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = marg.agg(sum(col("c")).as("n"))
    marg.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n_gaps"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("gap")))
          .as("p50_days"),
        min(when(col("cum") >= expr("(n * 9 + 9) DIV 10"), col("gap")))
          .as("p90_days"),
        max(col("gap")).as("max_days"))
  }

  /** DuckDB oracle for [[interOrderGaps]]. */
  def interOrderGapsSql: String =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    epoch_us(o_orderdate) // 86400000000 AS day FROM orders),
      |g AS (SELECT day - lag(day) OVER (PARTITION BY o_custkey
      |      ORDER BY day, o_orderkey) AS gap FROM o),
      |marg AS (SELECT gap, COUNT(*) AS c FROM g
      |         WHERE gap IS NOT NULL GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM marg),
      |cum AS (SELECT gap, CAST(SUM(c) OVER (ORDER BY gap
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum FROM marg)
      |SELECT n AS n_gaps,
      |  (SELECT MIN(gap) FROM cum WHERE cum >= (n + 1) // 2)
      |    AS p50_days,
      |  (SELECT MIN(gap) FROM cum WHERE cum >= (n * 9 + 9) // 10)
      |    AS p90_days,
      |  (SELECT MAX(gap) FROM marg) AS max_days
      |FROM tot""".stripMargin

  /** Ship-latency SLA report: whole-day order→ship gaps per order
    * priority, as exact rank percentiles off the per-priority gap
    * MARGINAL — gap-range sized (days, not line items), so the
    * per-priority cumulative window folds a few hundred rows while
    * the heavy work stays in the orderkey join and one map-side-
    * combined rollup. Output per priority: (n_items, p50_days,
    * p90_days, max_days). */
  def shipLatency(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP_LTZ))" +
          " DIV 86400000000").as("sday"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority").as("g"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
          " DIV 86400000000").as("oday"))
    val marg = graft.GraftSession.cut(li.join(o, "o_orderkey")
      .select(col("g"), (col("sday") - col("oday")).as("gap"))
      .groupBy(col("g"), col("gap")).agg(count(lit(1)).as("c")))
    val w = Window.partitionBy(col("g")).orderBy(col("gap"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = marg.groupBy(col("g")).agg(sum(col("c")).as("n"))
    marg.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(tot), "g")
      .groupBy(col("g"))
      .agg(max(col("n")).as("n_items"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("gap")))
          .as("p50_days"),
        min(when(col("cum") >= expr("(n * 9 + 9) DIV 10"), col("gap")))
          .as("p90_days"),
        max(col("gap")).as("max_days"))
      .orderBy(col("g"))
  }

  /** DuckDB oracle for [[shipLatency]]. */
  def shipLatencySql: String =
    """WITH j AS (SELECT o_orderpriority AS g,
      |    epoch_us(l_shipdate) // 86400000000
      |      - epoch_us(o_orderdate) // 86400000000 AS gap
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
      |marg AS (SELECT g, gap, COUNT(*) AS c FROM j GROUP BY 1, 2),
      |tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n
      |        FROM marg GROUP BY 1),
      |cum AS (SELECT g, gap, CAST(SUM(c) OVER (PARTITION BY g
      |    ORDER BY gap ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) AS BIGINT) AS cum FROM marg)
      |SELECT cum.g AS g, MAX(n) AS n_items,
      |  MIN(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS p50_days,
      |  MIN(CASE WHEN cum >= (n * 9 + 9) // 10 THEN gap END)
      |    AS p90_days,
      |  MAX(gap) AS max_days
      |FROM cum JOIN tot ON tot.g = cum.g
      |GROUP BY cum.g ORDER BY g""".stripMargin

  /** Priority-mix shift over time: each order priority's share of
    * monthly volume — the mix-shift monitor that explains "revenue
    * per order fell" before anyone blames pricing. Integer month
    * buckets (epoch days DIV 30 — fixed-width, engine-identical, no
    * calendar arithmetic to disagree over), exact counts, one ratio.
    * Month totals are months-sized and broadcast. */
  def priorityMixByMonth(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .select(
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
          " DIV 2592000000000").as("month"),
        col("o_orderpriority").as("g"))
      .groupBy(col("month"), col("g"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(col("month")).agg(sum(col("n")).as("mn"))
    cells.join(broadcast(tot), "month")
      .select(col("month"), col("g"), col("n"),
        round(col("n").cast("double") / col("mn").cast("double"), 6)
          .as("share"))
      .orderBy(col("month"), col("g"))
  }

  /** DuckDB oracle for [[priorityMixByMonth]]. */
  def priorityMixByMonthSql: String =
    """WITH cells AS (
      |  SELECT epoch_us(o_orderdate) // 2592000000000 AS month,
      |    o_orderpriority AS g, COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |tot AS (SELECT month, CAST(SUM(n) AS BIGINT) AS mn
      |        FROM cells GROUP BY 1)
      |SELECT cells.month, g, n,
      |  round(CAST(n AS DOUBLE) / CAST(mn AS DOUBLE), 6) AS share
      |FROM cells JOIN tot ON tot.month = cells.month
      |ORDER BY cells.month, g""".stripMargin

  /** DuckDB oracle for [[weeklyRevenueGrowth]]. */
  def weeklyRevenueGrowthSql: String =
    """WITH weekly AS (
      |  SELECT CAST(epoch_us(o_orderdate) // 604800000000
      |      AS BIGINT) AS week,
      |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1)
      |SELECT week, rev_cents,
      |  lag(rev_cents) OVER (ORDER BY week) AS prev_cents,
      |  round(CAST(rev_cents - lag(rev_cents) OVER (ORDER BY week)
      |      AS DOUBLE)
      |    / CAST(nullif(lag(rev_cents) OVER (ORDER BY week), 0)
      |      AS DOUBLE), 6) AS wow_growth
      |FROM weekly ORDER BY week""".stripMargin
}
