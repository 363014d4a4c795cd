package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The relational operator surface of the engine (SURVEY.md §2.4-2.9),
  * expressed as declarative DataFrame pipelines so Catalyst handles
  * pushdown, pruning, join selection and AQE at scale.
  *
  * Numeric convention: aggregates over `double` columns are computed in
  * `DECIMAL(18,4)` (exact, associative — so partial/map-side aggregation
  * at 1000-executor scale yields bit-identical results regardless of
  * partitioning) and only the final value is cast back to `double`.
  */
object Relational {

  /** Exact, order-independent sum of a double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact mean: decimal sum / count, divided as doubles. */
  def davg(c: Column): Column = dsum(c) / count(c)

  // ------------------------------------------------------------ filters

  /** F1 prefix match — reference scraper.py:110,123. */
  def filterPrefix(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").startsWith("large"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"))

  /** F2 case-insensitive substring doc-type filter —
    * reference scraper_copenhagen.py:85. */
  def filterContains(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(lower(col("o_orderpriority")).contains("high"))
      .select(col("o_orderkey"), col("o_orderpriority"))

  /** F3 date-range predicate (NEW-mode semantics: null dates pass) —
    * reference scraper_utils.py:72-87. */
  def filterDateRange(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate").isNull ||
        (col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
         col("o_orderdate") <  lit("1999-01-01").cast("timestamp")))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))

  /** F6 validity filter (drop rows with missing fields) —
    * reference scraper.py:162-164. */
  def filterValidity(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("value").isNotNull && col("props").isNotNull &&
        col("event_type") =!= "error")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))

  /** F7 exclusion predicates (conjunction of negated contains) —
    * reference scraper_ringkoebing_skjern.py:160-183. */
  def filterExclusion(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(!col("p_name").contains("widget") &&
        col("p_type") =!= "PROMO" && !col("p_name").endsWith("rod"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))

  // -------------------------------------------------------------- dedup

  /** D1 first-seen dedup, order preserved by an explicit discovery index
    * (here: event_id), per-key window — no global sort, shuffles once on
    * the dedup key. Reference scraper.py:116-132. */
  def dedupFirstSeen(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("first_event_id"),
        col("event_type").as("first_event_type"))
  }

  /** D2 distinct — reference get_base_url.py:101-107. */
  def distinctSegments(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_nationkey")).distinct()

  // -------------------------------------------------------------- joins

  /** J1 left-anti join: candidates minus already-ingested — bulk listing
    * + anti-join instead of the reference's per-key HEAD probes
    * (scraper.py:209-222), which is the scalable formulation. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** J1 at inventory scale: left-anti join behind a Bloom pre-filter.
    *
    * [[graft.pipeline.GenericIngest]]'s K5 guard broadcasts its sink
    * inventory — right while the inventory fits an executor. Once it
    * doesn't (years of crawls, billions of keys), the plain anti join
    * shuffles EVERY candidate row; but at that scale almost all
    * candidates are genuinely new, and a Bloom filter over the existing
    * keys proves it for a few bits per key. Rows the filter cannot
    * contain bypass the shuffle entirely; only the might-contain sliver
    * (true dupes + the fpp fraction) pays the exact anti join, which
    * resolves false positives — so the result is row-for-row identical
    * to `big.join(existing, key, "left_anti")`, independent of `fpp`.
    *
    * Two passes over `existing` (count to size the filter, then the
    * aggregate that builds it); keys compare as strings so the filter
    * side-steps numeric-width mismatches, while the exact join keeps
    * the original column type. Null keys never match an equi anti join
    * and are kept, same as the plain formulation. */
  def bloomAntiJoin(big: DataFrame, existing: DataFrame, key: String,
      fpp: Double = 0.03): DataFrame = {
    val keys = existing.select(col(key).cast("string").as(key)).na.drop()
    val bloom = keys.stat.bloomFilter(key, math.max(1L, keys.count()), fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bloom)
    val mightContain =
      udf((k: String) => k != null && bc.value.mightContainString(k))
    val definitelyNew = big.filter(!mightContain(col(key).cast("string")))
    val maybe = big.filter(mightContain(col(key).cast("string")))
      .join(existing.select(col(key)), Seq(key), "left_anti")
    definitelyNew.unionByName(maybe)
  }

  /** q93: parts that never shipped in bulk (quantity > 45) — the J1
    * anti-join shape routed through [[bloomAntiJoin]]. The oracle is the
    * PLAIN anti join in SQL, so the gate hash-checks the operator's
    * defining property: bloom pruning must not change the result. */
  def bloomAntiNeverBulkShipped(s: SparkSession, d: String): DataFrame =
    bloomAntiJoin(
      Tables.part(s, d).select(col("p_partkey"), col("p_name")),
      Tables.lineitem(s, d).filter(col("l_quantity") > 45)
        .select(col("l_partkey").as("p_partkey")),
      "p_partkey")

  /** J4 existence semi-join — reference run_scrapers.py:29-51. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))

  /** J2/J3 broadcast dimension joins: fact ⋈ small dims. The dims are
    * explicitly broadcast — no shuffle of the fact side.
    * Reference scraper.py:188-196 (committee dim lookup). */
  def broadcastDimJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_acctbal"))

  /** J6/X1 set difference — reference scraper.py:228,241-242. */
  def exceptCustkeys(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      .except(Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey")))

  /** U1 union + distinct — reference get_base_url.py:74-80. */
  def unionDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
      .union(Tables.customer(s, d)
        .filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("custkey")))
      .distinct()

  // --------------------------------------------------------------- aggs

  /** A1 success/fail counters + totals per group —
    * reference run_scrapers.py:59-97. */
  def aggCounters(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") =!= "error", 1)).as("n_ok"),
        count(when(col("event_type") === "error", 1)).as("n_err"),
        dsum(col("value")).as("total_value"),
        count(lit(1)).as("n_events"))

  /** A3 conditional counts per year — reference scraper_svendborg.py:180-189. */
  def aggConditional(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
        dsum(col("o_totalprice")).as("total_price"))

  /** A4 collect_list with deterministic ordering —
    * reference scraper_ringkoebing_skjern.py:146-156. */
  def collectOrderkeys(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_custkey") < 50)
      .groupBy(col("o_custkey"))
      // Joined to a string (not a raw array) so the verification dump is
      // hashable by the driver's pandas-based comparator.
      .agg(concat_ws(",",
        transform(sort_array(collect_list(col("o_orderkey"))),
          _.cast("string"))).as("orderkeys"))

  /** A7 group-into-buckets (month partitions) — reference scraper.py:188-197. */
  def aggMonthBuckets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("o_month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))

  /** TPC-H Q1 shape: the headline scan-heavy aggregation. Whole pipeline
    * is map-side partial agg + single shuffle on the 6-value group key. */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 4)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // dsum rounds the product to scale 4 BEFORE summing: an
        // 8-scale decimal sum exceeds 2^53 in hugeint units early
        // (sum*1e8), where DuckDB's decimal->double cast is off by an
        // ulp (observed at sf0.1: ...0862 vs ...086201); a scale-4 sum
        // stays exactly convertible on both engines
        dsum(col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3 shape: selective dim filter ⋈ fact ⋈ fact, top-k revenue.
    * Customer filter is applied before the join (Catalyst pushes it to
    * the scan); AQE picks broadcast for the filtered side at scale. */
  def topRevenueOrders(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 4)
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("2000-03-15").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_date"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        // scale-4 product (see pricingSummary): keeps the decimal sum
        // inside DuckDB's exactly-convertible range
        (col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(dec)
          .as("disc_price"))
    cust.join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_date"))
      .agg(sum(col("disc_price")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: local-supplier revenue per nation in one region.
    * Dims broadcast; the two fact tables join on their natural key. */
  def regionNationRevenue(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 4)
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(s, d)
      .select(col("l_suppkey"),
        // scale-4 product (see pricingSummary)
        (col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(dec)
          .as("disc_price"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("disc_price")).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Hourly event buckets from the nanosecond-timestamp column (read
    * as long nanos; exact integer division — no double rounding at
    * 1e18 magnitudes). */
  def eventHourBuckets(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(expr("ts div 3600000000000").as("hour_bucket"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("total_value"))

  /** JSON side-column extraction (events.props): typed from_json parse
    * + aggregation over the extracted field. */
  def jsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k",
        from_json(col("props"), "k INT", Map.empty[String, String])
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).cast("long").as("sum_k"),
        max(col("k")).cast("long").as("max_k"))

  // ------------------------------------------------------ limits / sort

  /** L1/L4 global top-k with deterministic tie-break — Spark plans this
    * as TakeOrderedAndProject (no full sort materialization). */
  def top10Orders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** L3 filter-then-limit: the limit budget counts only rows passing the
    * filter — reference scraper_svendborg.py:296-305. */
  def filterThenLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "O")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))

  /** Running per-customer spend: windowed decimal sum (exact), cast to
    * double at the edge. Unique (date, key) ordering makes the frame
    * deterministic. */
  def runningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
  }

  /** Inter-event gap per user (lag). Computed in MICROseconds: the
    * parquet ts is nanos, but DuckDB reads TIMESTAMP_NS at micro
    * precision, so the oracle-comparable unit is micros. */
  def eventGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("gap_us"))
  }

  /** Top-k per group: per-key window, shuffles once on the group key —
    * never a global sort. */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
        col("o_totalprice"))
  }

  /** Multi-level aggregation with ROLLUP (year, month) — grand total,
    * per-year subtotal and per-month detail in ONE pass (Expand +
    * single shuffle), versus three scans with separate groupBys.
    * Subtotal levels encode as -1 (not NULL) so the dump stays typed. */
  def rollupRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_year"), lit(-1L)).as("o_year"),
        coalesce(col("o_month"), lit(-1L)).as("o_month"),
        col("n_orders"), col("total"))

  /** CUBE over (status, priority-class): every grouping-set combination
    * in one pass — the full-lattice companion to [[rollupRevenue]]'s
    * hierarchy; same single shuffle with map-side partials, absent
    * dimensions coalesced to sentinels for a stable cross-engine
    * shape. */
  def cubeStatusRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus").as("status"),
        substring(col("o_orderpriority"), 1, 1).as("prio"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .select(coalesce(col("status"), lit("ALL")).as("status"),
        coalesce(col("prio"), lit("ALL")).as("prio"),
        col("n_orders"), col("total"))

  /** Bounded-frame window: per-customer moving average over the last 3
    * orders (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — decimal sum /
    * count so the double is bit-exact across engines. One shuffle on
    * the customer key. */
  def movingAvgSpend(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
          .cast("double") /
          count(lit(1)).over(w).cast("double")).as("avg_last3"))
  }

  /** Inventory snapshot diff (the D3/K5 family's incremental primitive:
    * what changed since the last run) — rows added, removed, or changed
    * between two snapshots, as ONE full-outer join hash-partitioned on
    * the key; unchanged rows drop out. At 100 TB both snapshots bucket
    * by the key and the join is co-located (see Bucketing). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String)
      : DataFrame =
    oldDf.toDF(key, "old_fp")
      .join(newDf.toDF(key, "new_fp"), Seq(key), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(key), col("status"))

  /** The ranking-window family in one pass: per-status rank,
    * dense_rank and spend-decile (ntile) over orders — one shuffle on
    * the status key serves all three frames (identical window spec,
    * single Window physical node). Ties break on the order key so
    * ranks are deterministic cross-engine. */
  def orderSpendRanks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 37 === 0) // bounded output for the dump
      .select(col("o_orderkey"), col("o_orderstatus"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(10).over(w).cast("long").as("decile"))
  }

  /** Orders priced above their customer's average, written as a
    * correlated scalar subquery through `spark.sql` — the SQL-surface
    * path: Catalyst decorrelates both subqueries into aggregate +
    * join on the customer key (one shuffle each), so the declarative
    * form costs the same as the hand-written window/join. The
    * comparison runs in exact decimal arithmetic (price * count >
    * sum) so row membership cannot flip on a floating-point ulp
    * between engines. The view registered for the SQL text is
    * call-unique and dropped before returning — `spark.sql` analyzes
    * eagerly, so the returned plan no longer references it and
    * concurrent callers (or a user's own `orders_sql` view) are never
    * clobbered. */
  def aboveCustomerAvg(s: SparkSession, d: String): DataFrame = {
    val view = s"orders_sql_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables.orders(s, d).createOrReplaceTempView(view)
    try s.sql(s"""
      SELECT o_orderkey, o_custkey
      FROM $view o
      WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
          (SELECT COUNT(*) FROM $view i
           WHERE i.o_custkey = o.o_custkey)
        > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,4)))
           FROM $view i WHERE i.o_custkey = o.o_custkey)
    """)
    finally s.catalog.dropTempView(view)
  }

  /** Snapshot diff over orders: the previous run is missing every 9th
    * key, the current run re-priced every 7th — both derivable by the
    * oracle. */
  def snapshotDiffQuery(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val prev = orders.filter(col("o_orderkey") % 9 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val cur = orders.select(col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1)
        .otherwise(col("o_totalprice")))
    snapshotDiff(prev, cur, "o_orderkey")
  }

  /** Fixed-width value histogram — one scan, one shuffle on the bucket
    * id. Bucket arithmetic is plain double division + floor so the
    * oracle mirrors it bit-for-bit. */
  def valueHistogram(s: SparkSession, d: String,
      width: Double = 50.0): DataFrame =
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .groupBy(floor(col("value") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))

  /** Pivot: order counts per year fanned out by status column — the
    * wide-format report shape. Fixed pivot values keep the schema
    * static (and the plan a single aggregation). */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))

  /** Cohort LTV curve: customers cohorted by first-order week; for
    * each (cohort week, week offset) the number of buying customers
    * and cumulative revenue cents — the revenue companion to q123's
    * retention counts. All integer week/cents arithmetic; two
    * custkey-partitioned shuffles, then a cohort-offset rollup whose
    * cumulative window partitions BY COHORT over offsets (cohort x
    * offset rows — time-range squared, never customer-sized). */
  def ltvCohorts(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
          " DIV 604800000000").as("week"),
        expr("CAST(round(o_totalprice * 100, 0) AS LONG)").as("c"))
    val cohort = o.groupBy(col("o_custkey"))
      .agg(min(col("week")).as("cw"))
    val cells = o.join(cohort, "o_custkey")
      .groupBy(col("cw"), (col("week") - col("cw")).as("off"))
      .agg(count_distinct(col("o_custkey")).as("n_buyers"),
        sum(col("c")).as("rev_cents"))
    val w = Window.partitionBy(col("cw")).orderBy(col("off"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      .select(col("cw").as("cohort_week"), col("off").as("week_offset"),
        col("n_buyers"), col("rev_cents"), col("cum_rev_cents"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** DuckDB oracle for [[ltvCohorts]]. */
  def ltvCohortsSql: String =
    """WITH o AS (SELECT o_custkey,
      |    epoch_us(o_orderdate) // 604800000000 AS week,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
      |  FROM orders),
      |cohort AS (SELECT o_custkey, MIN(week) AS cw FROM o GROUP BY 1),
      |cells AS (SELECT cw, week - cw AS off,
      |    COUNT(DISTINCT o.o_custkey) AS n_buyers,
      |    CAST(SUM(c) AS BIGINT) AS rev_cents
      |  FROM o JOIN cohort ON cohort.o_custkey = o.o_custkey
      |  GROUP BY 1, 2)
      |SELECT cw AS cohort_week, off AS week_offset, n_buyers,
      |  rev_cents,
      |  CAST(SUM(rev_cents) OVER (PARTITION BY cw ORDER BY off
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum_rev_cents
      |FROM cells ORDER BY cohort_week, week_offset""".stripMargin

  /** National market share by order year (the TPC-H Q8 shape,
    * simplified to this schema): each supplier nation's share of
    * yearly lineitem revenue — two fact-key joins (orderkey for the
    * year, suppkey for the nation) with the nation dim broadcast,
    * exact cents sums, and a years-sized total broadcast back for
    * the share. */
  def nationMarketShare(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100, 0) AS LONG)").as("c"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
    val cells = li.join(o, "o_orderkey")
      .join(sup, "l_suppkey")
      .join(broadcast(nat), "s_nationkey")
      .groupBy(col("o_year"), col("n_name"))
      .agg(sum(col("c")).as("rev_cents"))
    val tot = cells.groupBy(col("o_year"))
      .agg(sum(col("rev_cents")).as("yr"))
    cells.join(broadcast(tot), "o_year")
      .select(col("o_year"), col("n_name"), col("rev_cents"),
        round(col("rev_cents").cast("double") / col("yr").cast("double"),
          6).as("share"))
      .orderBy(col("o_year"), col("n_name"))
  }

  /** DuckDB oracle for [[nationMarketShare]]. */
  def nationMarketShareSql: String =
    """WITH cells AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n_name,
      |    CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS rev_cents
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT o_year, CAST(SUM(rev_cents) AS BIGINT) AS yr
      |        FROM cells GROUP BY 1)
      |SELECT cells.o_year, n_name, rev_cents,
      |  round(CAST(rev_cents AS DOUBLE) / CAST(yr AS DOUBLE), 6)
      |    AS share
      |FROM cells JOIN tot ON tot.o_year = cells.o_year
      |ORDER BY cells.o_year, n_name""".stripMargin

  /** Local-supplier revenue per nation (the TPC-H Q5 shape): revenue
    * from lineitems whose supplier and ordering customer share a
    * nation, rolled up per nation within one region — the classic
    * 6-table star join. Plan shape: the two fact joins shuffle on
    * their keys (orderkey, then the customer/supplier nation check),
    * every dimension broadcasts, the region filter prunes at the
    * nation dim BEFORE the join (PushedFilters does the rest), and
    * the revenue is an exact cents sum. */
  def localSupplierRevenue(s: SparkSession, d: String,
      region: String = "EUROPE"): DataFrame = {
    val nat = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === region)
        .select(col("r_regionkey").as("n_regionkey"))), "n_regionkey")
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100)" +
          " AS LONG)").as("c"))
    li.join(o, "o_orderkey")
      .join(sup.withColumnRenamed("s_suppkey", "l_suppkey"),
        "l_suppkey")
      .join(cust.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey")
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat.withColumnRenamed("n_nationkey",
        "s_nationkey")), "s_nationkey")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"), sum(col("c")).as("rev_cents"))
      .orderBy(col("rev_cents").desc, col("n_name"))
  }

  /** DuckDB oracle for [[localSupplierRevenue]]. */
  def localSupplierRevenueSql(region: String = "EUROPE"): String =
    s"""SELECT n_name, COUNT(*) AS n_items,
       |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
       |    * 100) AS BIGINT)) AS BIGINT) AS rev_cents
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation ON n_nationkey = s_nationkey
       |JOIN region ON r_regionkey = n_regionkey
       |WHERE c_nationkey = s_nationkey AND r_name = '$region'
       |GROUP BY n_name
       |ORDER BY rev_cents DESC, n_name""".stripMargin

  /** Shipping-priority ranking (the TPC-H Q3 shape): unshipped
    * revenue per order for one market segment as of a cutoff date.
    * Both date predicates push into the fact scans, the filtered
    * customer dim broadcasts, the orders⋈lineitem join shuffles on
    * the order key, and the top-k is one TakeOrderedAndProject —
    * never a global sort. Revenue in exact cents. */
  def shippingPriority(s: SparkSession, d: String,
      segment: String = "BUILDING", cutoff: String = "1998-06-01",
      topK: Int = 10): DataFrame = {
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey").as("o_custkey"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(cutoff).cast("date"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit(cutoff).cast("date"))
      .select(col("l_orderkey").as("o_orderkey"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100)" +
          " AS LONG)").as("c"))
    li.join(o, "o_orderkey")
      .join(cust, "o_custkey")
      .groupBy(col("o_orderkey").as("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(col("c")).as("rev_cents"))
      .select(col("l_orderkey"), col("rev_cents"), col("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("rev_cents").desc, col("l_orderkey"))
      .limit(topK)
  }

  /** DuckDB oracle for [[shippingPriority]]. The synthetic orders
    * table carries o_orderpriority (no shippriority column), which
    * stands in for Q3's projection. */
  def shippingPrioritySql(segment: String = "BUILDING",
      cutoff: String = "1998-06-01", topK: Int = 10): String =
    s"""SELECT l_orderkey,
       |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
       |    * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
       |  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = '$segment'
       |  AND o_orderdate < DATE '$cutoff'
       |  AND l_shipdate > DATE '$cutoff'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY rev_cents DESC, l_orderkey LIMIT $topK""".stripMargin

  /** Bilateral trade volume (the TPC-H Q7 shape): shipped revenue
    * between two nations by supplier-side/customer-side role and ship
    * year. The nation pair filter broadcasts into BOTH dim joins
    * (each prunes its fact side before the orders⋈lineitem shuffle);
    * the date band pushes into the lineitem scan; exact cents, year
    * as BIGINT on both engines. */
  def bilateralVolume(s: SparkSession, d: String,
      nationA: String = "NATION_9",
      nationB: String = "NATION_10"): DataFrame = {
    val nat = Tables.nation(s, d)
      .filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("s_nationkey"),
        col("n_name").as("supp_nation"))), "s_nationkey")
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("c_nationkey"),
        col("n_name").as("cust_nation"))), "c_nationkey")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(lit("1995-01-01").cast("date"),
        lit("1996-12-31").cast("date")))
      .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey"),
        expr("CAST(year(l_shipdate) AS LONG)").as("l_year"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100)" +
          " AS LONG)").as("c"))
    li.join(sup.select(col("l_suppkey"), col("supp_nation")),
        "l_suppkey")
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey")), "o_orderkey")
      .join(cust.select(col("o_custkey"), col("cust_nation")),
        "o_custkey")
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(count(lit(1)).as("n_items"), sum(col("c")).as("rev_cents"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** DuckDB oracle for [[bilateralVolume]]. */
  def bilateralVolumeSql(nationA: String = "NATION_9",
      nationB: String = "NATION_10"): String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |  COUNT(*) AS n_items,
       |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
       |    * 100) AS BIGINT)) AS BIGINT) AS rev_cents
       |FROM lineitem
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |WHERE n1.n_name IN ('$nationA', '$nationB')
       |  AND n2.n_name IN ('$nationA', '$nationB')
       |  AND n1.n_name <> n2.n_name
       |  AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Returned-revenue ranking (the TPC-H Q10 shape): top customers
    * by revenue on RETURNED line items — the churn-risk list a
    * support team works through. Fact joins shuffle on their keys,
    * the returnflag filter pushes into the lineitem scan, the
    * customer/nation dims broadcast, and the top-k lands in one
    * TakeOrderedAndProject on (cents DESC, custkey). */
  def topReturners(s: SparkSession, d: String,
      topK: Int = 20): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_orderkey"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100)" +
          " AS LONG)").as("c"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_name"),
        col("c_nationkey"))
    val nat = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
    li.join(o, "o_orderkey")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_returned"),
        sum(col("c")).as("lost_cents"))
      .join(cust, "o_custkey")
      .join(broadcast(nat), "c_nationkey")
      .select(col("o_custkey").as("c_custkey"), col("c_name"),
        col("n_name"), col("n_returned"), col("lost_cents"))
      .orderBy(col("lost_cents").desc, col("c_custkey"))
      .limit(topK)
  }

  /** DuckDB oracle for [[topReturners]]. */
  def topReturnersSql(topK: Int = 20): String =
    s"""SELECT c_custkey, c_name, n_name,
       |  COUNT(*) AS n_returned,
       |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
       |    * 100) AS BIGINT)) AS BIGINT) AS lost_cents
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation ON n_nationkey = c_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY 1, 2, 3
       |ORDER BY lost_cents DESC, c_custkey LIMIT $topK""".stripMargin

  /** Herfindahl-Hirschman concentration of supplier revenue within
    * each nation — the market-concentration profile (is one supplier
    * dominating a region's volume?), Gini's (q156) per-market
    * cousin. HHI = Σ revᵢ² / (Σ revᵢ)² over a nation's suppliers,
    * exact in DECIMAL(38,0)/HUGEINT cents with one double division.
    * Supplier revenue is one lineitem shuffle; the nation rollup is
    * suppliers-sized; the nation dim broadcasts. */
  def supplierHhi(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(38,0)"
    val supRev = Tables.lineitem(s, d)
      .select(col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100, 0) AS LONG)").as("c"))
      .groupBy(col("l_suppkey")).agg(sum(col("c")).as("rev"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
    supRev.join(sup, "l_suppkey")
      .join(broadcast(nat), "s_nationkey")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).as("sr"),
        sum(col("rev").cast(dec) * col("rev")).as("sq"))
      .select(col("n_name"), col("n_suppliers"),
        round(col("sq").cast("double")
          / (col("sr").cast(dec) * col("sr")).cast("double"), 6)
          .as("hhi"))
      .orderBy(col("n_name"))
  }

  /** DuckDB oracle for [[supplierHhi]]. */
  def supplierHhiSql: String =
    """WITH supRev AS (SELECT l_suppkey,
      |    CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1)
      |SELECT n_name,
      |  COUNT(*) AS n_suppliers,
      |  round(CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
      |    / CAST(CAST(SUM(rev) AS HUGEINT) * SUM(rev) AS DOUBLE), 6)
      |    AS hhi
      |FROM supRev
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |GROUP BY 1 ORDER BY n_name""".stripMargin

  /** TPC-H Q13 shape — customer order-count distribution: LEFT join
    * customers to their non-urgent orders, count per customer (zero
    * included — the left join is the point: the 0-bucket is the
    * inactive-customer census a pure inner join silently drops), then
    * histogram the counts. Two shuffles (per-customer count, then the
    * tiny count-of-counts agg); the priority predicate lands in the
    * join condition, NOT a WHERE after it, or the 0-bucket would
    * absorb urgent-only customers incorrectly. */
  def orderCountDistribution(s: SparkSession, d: String,
      excludePriorityPrefix: String = "1"): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(!col("o_orderpriority").startsWith(excludePriorityPrefix))
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
    Tables.customer(s, d).select(col("c_custkey"))
      .join(o, Seq("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** DuckDB oracle for [[orderCountDistribution]]. */
  def orderCountDistributionSql(
      excludePriorityPrefix: String = "1"): String =
    s"""SELECT c_count, COUNT(*) AS custdist FROM (
       |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
       |  FROM customer c LEFT JOIN orders o
       |    ON o.o_custkey = c.c_custkey
       |    AND o.o_orderpriority NOT LIKE '$excludePriorityPrefix%'
       |  GROUP BY c.c_custkey)
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q18 shape — large-volume orders: orders whose total line
    * quantity exceeds `minQty`, with customer name and order facts,
    * largest first. The HAVING runs on the per-order aggregate BEFORE
    * any wide join: the quantity filter shrinks the order set to the
    * tail, and only that tail joins orders/customer (broadcast-sized
    * after the filter at any scale where the threshold means
    * something). */
  def largeVolumeOrders(s: SparkSession, d: String,
      minQty: Long = 170L, topK: Int = 100): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS LONG)")
          .as("total_cents"))
    big.join(o, "l_orderkey")
      .join(Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_name")), "o_custkey")
      .select(col("c_name"), col("o_custkey").as("c_custkey"),
        col("l_orderkey").as("o_orderkey"), col("o_orderdate"),
        col("total_cents"), col("total_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(topK)
  }

  /** DuckDB oracle for [[largeVolumeOrders]]. */
  def largeVolumeOrdersSql(minQty: Long = 170L,
      topK: Int = 100): String =
    s"""WITH big AS (
       |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT))
       |    AS BIGINT) AS total_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING SUM(CAST(l_quantity AS BIGINT)) > $minQty)
       |SELECT c.c_name, c.c_custkey, o.o_orderkey,
       |  CAST(o.o_orderdate AS DATE) AS o_orderdate,
       |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       |  big.total_qty
       |FROM big
       |JOIN orders o ON o.o_orderkey = big.l_orderkey
       |JOIN customer c ON c.c_custkey = o.o_custkey
       |ORDER BY total_cents DESC, o.o_orderkey LIMIT $topK""".stripMargin

  /** TPC-H Q21 shape — sole late supplier: suppliers who shipped late
    * (> `lateDays` after the order date) on a multi-supplier order
    * where EVERY OTHER supplier shipped on time — the
    * exists/not-exists double correlation, expressed as one semi-join
    * (another supplier exists) plus one anti-join (no other LATE
    * supplier), both on the order key. The synthetic schema has no
    * commit/receipt dates, so lateness is ship-vs-order-date. All
    * joins carry (orderkey, suppkey) pairs only; the count per
    * supplier is the final map-side-combined agg. */
  def soleLateSupplier(s: SparkSession, d: String, lateDays: Int = 60,
      topK: Int = 20): DataFrame = {
    val os = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
    val pairs = os.select(col("l_orderkey"), col("l_suppkey")).distinct()
    val late = os
      .filter(col("l_shipdate").cast("date") >
        date_add(col("o_orderdate").cast("date"), lateDays))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val hasOther = late.as("l1")
      .join(pairs.as("p"),
        col("l1.l_orderkey") === col("p.l_orderkey") &&
          col("l1.l_suppkey") =!= col("p.l_suppkey"),
        "left_semi")
    val sole = hasOther.as("l1")
      .join(late.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.l_suppkey") =!= col("l2.l_suppkey"),
        "left_anti")
    sole.groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey"))
      .limit(topK)
  }

  /** DuckDB oracle for [[soleLateSupplier]]. */
  def soleLateSupplierSql(lateDays: Int = 60, topK: Int = 20): String =
    s"""WITH os AS (
       |  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
       |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
       |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM os),
       |late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM os
       |  WHERE CAST(l_shipdate AS DATE) >
       |    CAST(o_orderdate AS DATE) + INTERVAL $lateDays DAY)
       |SELECT l1.l_suppkey, COUNT(*) AS numwait
       |FROM late l1
       |WHERE EXISTS (SELECT 1 FROM pairs p
       |    WHERE p.l_orderkey = l1.l_orderkey
       |      AND p.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM late l2
       |    WHERE l2.l_orderkey = l1.l_orderkey
       |      AND l2.l_suppkey <> l1.l_suppkey)
       |GROUP BY l1.l_suppkey
       |ORDER BY numwait DESC, l1.l_suppkey LIMIT $topK""".stripMargin

  /** TPC-H Q4 shape — order-priority checking: count orders per
    * priority class that had AT LEAST ONE late line (shipped more
    * than `lateDays` after the order date) — the classic correlated-
    * EXISTS aggregate, expressed as a left_semi from orders to their
    * late lines so each order counts once no matter how many lines
    * were late. The semi-join condition carries the date bound; the
    * count is map-side combined on the tiny priority domain. */
  def priorityLateOrders(s: SparkSession, d: String,
      lateDays: Int = 60): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").cast("date").as("od"))
    val late = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        col("l_shipdate").cast("date").as("sd"))
    o.join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("sd") > date_add(col("od"), lateDays),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** DuckDB oracle for [[priorityLateOrders]]. */
  def priorityLateOrdersSql(lateDays: Int = 60): String =
    s"""SELECT o_orderpriority, COUNT(*) AS order_count
       |FROM orders o
       |WHERE EXISTS (SELECT 1 FROM lineitem l
       |  WHERE l.l_orderkey = o.o_orderkey
       |    AND CAST(l.l_shipdate AS DATE) >
       |      CAST(o.o_orderdate AS DATE) + INTERVAL $lateDays DAY)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q22 shape — dormant high-balance customers: per nation,
    * the count and total balance of customers whose balance exceeds
    * the positive-balance average but who placed NO order since
    * `sinceDate` (the synthetic schema has no phone country code, so
    * the nation key is the grouping). The average is one scalar
    * cross-joined in (broadcast by construction); dormancy is a
    * left_anti against the date-filtered orders — never a per-
    * customer existence probe. Balance cents are exact BIGINTs. */
  def dormantHighBalance(s: SparkSession, d: String,
      sinceDate: String = "2001-05-01"): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS LONG)").as("bal_cents"))
    val avgPos = cust.filter(col("bal_cents") > 0L)
      .agg((sum(col("bal_cents")) / count(lit(1))).as("avg_cents"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate").cast("date") >=
        lit(sinceDate).cast("date"))
      .select(col("o_custkey").as("c_custkey")).distinct()
    cust.crossJoin(broadcast(avgPos))
      .filter(col("bal_cents").cast("double") > col("avg_cents"))
      .join(recent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal_cents")).as("total_bal_cents"))
      .orderBy(col("c_nationkey"))
  }

  /** DuckDB oracle for [[dormantHighBalance]]. */
  def dormantHighBalanceSql(sinceDate: String = "2001-05-01"): String =
    s"""WITH cust AS (SELECT c_custkey,
       |    CAST(c_nationkey AS BIGINT) AS c_nationkey,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
       |  FROM customer),
       |avgpos AS (SELECT CAST(SUM(bal_cents) AS DOUBLE) / COUNT(*)
       |    AS avg_cents FROM cust WHERE bal_cents > 0),
       |recent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
       |  WHERE CAST(o_orderdate AS DATE) >= DATE '$sinceDate')
       |SELECT c_nationkey, COUNT(*) AS numcust,
       |  CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
       |FROM cust, avgpos
       |WHERE CAST(bal_cents AS DOUBLE) > avg_cents
       |  AND NOT EXISTS (SELECT 1 FROM recent r
       |    WHERE r.c_custkey = cust.c_custkey)
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------- remaining TPC-H shapes
  //
  // The synthetic star schema has no partsupp table, so the Q2/Q11/
  // Q20 shapes re-anchor their part-supplier relationship on the
  // lineitem fact (which records who actually shipped what) — the
  // plan SHAPES (correlated min, HAVING-over-global-scalar, nested
  // semi-join) are preserved exactly. Money stays in exact cents
  // BIGINTs throughout (the shippingPriority convention): integer
  // sums are fold-order-free, so map-side partials at 1000-executor
  // scale are bit-identical to any other partitioning.

  /** Exact cents column for the discounted lineitem price. */
  private def revCents: Column =
    expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS LONG)")
  private val revCentsSql =
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"

  /** TPC-H Q2 shape — min-cost supplier (q251): for each part of one
    * type/size band, the EUROPE supplier(s) whose cheapest observed
    * sale of that part hits the per-part minimum. The argmin is the
    * standard aggregate-then-equijoin-back (never a per-row correlated
    * probe); the supplier dim (10k rows/SF) and the filtered part
    * slice broadcast, so the only fact-sized work is one lineitem
    * scan + one (part,supp)-keyed aggregation. */
  def minCostSupplier(s: SparkSession, d: String, maxSize: Int = 5,
      ptype: String = "LARGE"): DataFrame = {
    val pf = Tables.part(s, d)
      .filter(col("p_size") <= maxSize && col("p_type") === ptype)
      .select(col("p_partkey"), col("p_name"))
    val eu = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val cost = Tables.lineitem(s, d)
      .join(pf.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(eu.select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(expr("CAST(round(l_extendedprice * 100) AS LONG)"))
        .as("cost_cents"))
    val minc = cost.groupBy(col("l_partkey"))
      .agg(min(col("cost_cents")).as("min_cents"))
    cost.join(minc, "l_partkey")
      .filter(col("cost_cents") === col("min_cents"))
      .join(pf, col("l_partkey") === col("p_partkey"))
      .join(eu, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("n_name"), col("cost_cents"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  /** DuckDB oracle for [[minCostSupplier]]. */
  def minCostSupplierSql(maxSize: Int = 5,
      ptype: String = "LARGE"): String =
    s"""WITH pf AS (SELECT p_partkey, p_name FROM part
       |  WHERE p_size <= $maxSize AND p_type = '$ptype'),
       |eu AS (SELECT s_suppkey, s_name, n_name FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE'),
       |cost AS (SELECT l_partkey, l_suppkey,
       |    MIN(CAST(round(l_extendedprice * 100) AS BIGINT))
       |      AS cost_cents
       |  FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM pf)
       |    AND l_suppkey IN (SELECT s_suppkey FROM eu)
       |  GROUP BY l_partkey, l_suppkey),
       |minc AS (SELECT l_partkey, MIN(cost_cents) AS min_cents
       |  FROM cost GROUP BY l_partkey)
       |SELECT p_partkey, p_name, s_name, n_name, cost_cents
       |FROM cost JOIN minc USING (l_partkey)
       |JOIN pf ON l_partkey = p_partkey
       |JOIN eu ON l_suppkey = s_suppkey
       |WHERE cost_cents = min_cents
       |ORDER BY p_partkey, s_name""".stripMargin

  /** TPC-H Q6 shape — forecast revenue change (q252): the revenue
    * that would vanish if discounts in a band were dropped, over one
    * ship-year and a quantity cap. Single-table scan-and-aggregate:
    * all three predicates push to the parquet scan (PushedFilters),
    * no join, no shuffle beyond the final 1-row combine. The
    * discount-band bounds compare in exact basis points (round(d *
    * 10000)), so no float boundary can flip a row. */
  def forecastRevenueChange(s: SparkSession, d: String,
      from: String = "1999-01-01", until: String = "2000-01-01",
      discLoBp: Long = 500L, discHiBp: Long = 700L,
      maxQty: Long = 24L): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        expr("CAST(round(l_discount * 10000) AS LONG)")
          .between(discLoBp, discHiBp) &&
        col("l_quantity") < lit(maxQty.toDouble))
      .agg(coalesce(sum(
          expr("CAST(round(l_extendedprice * l_discount * 100)" +
            " AS LONG)")), lit(0L)).as("rev_cents"),
        count(lit(1)).as("n_lines"))

  /** DuckDB oracle for [[forecastRevenueChange]]. */
  def forecastRevenueChangeSql(from: String = "1999-01-01",
      until: String = "2000-01-01", discLoBp: Long = 500L,
      discHiBp: Long = 700L, maxQty: Long = 24L): String =
    s"""SELECT CAST(coalesce(SUM(CAST(round(l_extendedprice
       |    * l_discount * 100) AS BIGINT)), 0) AS BIGINT)
       |    AS rev_cents,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$from'
       |  AND l_shipdate < TIMESTAMP '$until'
       |  AND CAST(round(l_discount * 10000) AS BIGINT)
       |    BETWEEN $discLoBp AND $discHiBp
       |  AND l_quantity < $maxQty""".stripMargin

  /** TPC-H Q8 shape, strict form (q253): among lineitems of one part
    * type sold to customers of one region, the share of revenue
    * supplied by one nation, per order year. This is Q8's actual
    * two-sided market restriction + conditional single-nation share
    * — [[nationMarketShare]] (q193) is the unconditional all-nations
    * share matrix; here the CASE'd numerator and the denominator
    * come out of ONE pass, never two scans differenced. Integer cent
    * sums are exact; only the final division is floating point. */
  def marketShare(s: SparkSession, d: String,
      ptype: String = "ECONOMY", custRegion: String = "AMERICA",
      supNation: String = "NATION_3"): DataFrame = {
    val pf = Tables.part(s, d).filter(col("p_type") === ptype)
      .select(col("p_partkey"))
    val amCust = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === custRegion)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .join(amCust, col("o_custkey") === col("c_custkey"), "left_semi")
    val supNat = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(s, d)
      .join(pf, col("l_partkey") === col("p_partkey"),
        "left_semi")
      .select(col("l_orderkey"), col("l_suppkey"), revCents.as("rc"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supNat, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(sum(col("rc")).as("total_cents"),
        coalesce(sum(when(col("n_name") === supNation, col("rc"))),
          lit(0L)).as("nation_cents"))
      .select(col("o_year"), col("total_cents"), col("nation_cents"),
        round(col("nation_cents").cast("double")
          / col("total_cents").cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** DuckDB oracle for [[marketShare]]. */
  def marketShareSql(ptype: String = "ECONOMY",
      custRegion: String = "AMERICA",
      supNation: String = "NATION_3"): String =
    s"""WITH t AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    $revCentsSql AS rc, n_name
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE l_partkey IN (SELECT p_partkey FROM part
       |      WHERE p_type = '$ptype')
       |    AND o_custkey IN (SELECT c_custkey FROM customer
       |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |      JOIN region ON n2.n_regionkey = r_regionkey
       |      WHERE r_name = '$custRegion'))
       |SELECT o_year, CAST(SUM(rc) AS BIGINT) AS total_cents,
       |  CAST(coalesce(SUM(CASE WHEN n_name = '$supNation'
       |    THEN rc END), 0) AS BIGINT) AS nation_cents,
       |  round(CAST(coalesce(SUM(CASE WHEN n_name = '$supNation'
       |      THEN rc END), 0) AS DOUBLE)
       |    / CAST(SUM(rc) AS DOUBLE), 6) AS mkt_share
       |FROM t GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Quarterly return-rate drift by customer nation (q254): per
    * (nation, order quarter), the share of lineitem revenue that
    * came back flagged 'R' — the returns-quality drift matrix a
    * fulfilment dashboard watches (complements [[topReturners]]'s
    * all-time per-customer Q10 ranking with a time-resolved
    * per-nation rate). One conditional aggregate over the
    * orders⋈lineitem⋈customer join — returned and total revenue in
    * the same pass, exact cents, never two differenced scans. */
  def returnRateByNation(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        (year(col("o_orderdate")).cast("long") * 10L +
          quarter(col("o_orderdate")).cast("long")).as("o_quarter"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), revCents.as("rc"),
        (col("l_returnflag") === "R").as("ret"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_quarter"))
      .agg(sum(col("rc")).as("total_cents"),
        coalesce(sum(when(col("ret"), col("rc"))), lit(0L))
          .as("returned_cents"))
      .select(col("n_name"), col("o_quarter"), col("total_cents"),
        col("returned_cents"),
        round(col("returned_cents").cast("double")
          / col("total_cents").cast("double"), 6).as("return_rate"))
      .orderBy(col("n_name"), col("o_quarter"))
  }

  /** DuckDB oracle for [[returnRateByNation]]. */
  def returnRateByNationSql: String =
    s"""SELECT n_name,
       |  CAST(year(o_orderdate) * 10 + quarter(o_orderdate)
       |    AS BIGINT) AS o_quarter,
       |  CAST(SUM($revCentsSql) AS BIGINT) AS total_cents,
       |  CAST(coalesce(SUM(CASE WHEN l_returnflag = 'R'
       |    THEN $revCentsSql END), 0) AS BIGINT) AS returned_cents,
       |  round(CAST(coalesce(SUM(CASE WHEN l_returnflag = 'R'
       |      THEN $revCentsSql END), 0) AS DOUBLE)
       |    / CAST(SUM($revCentsSql) AS DOUBLE), 6) AS return_rate
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name, o_quarter
       |ORDER BY n_name, o_quarter""".stripMargin

  /** TPC-H Q11 shape — important parts (q255): per-part shipped value
    * from one nation's suppliers, kept only where it exceeds a
    * fraction of the global total. The global scalar is one
    * aggregated row cross-joined back in (broadcast by construction)
    * — the HAVING-over-global-subquery shape. Single-scan relies on
    * exchange reuse: the per-part aggregate's shuffle feeds both the
    * scalar and the filter branch as a `ReusedExchange`
    * (spark.sql.exchangeReuseEnabled, default on; with it off the
    * fact is scanned twice) — pinned by a PlanShapeSpec scan-count
    * test. */
  def importantParts(s: SparkSession, d: String,
      nationName: String = "NATION_7",
      fraction: Double = 0.001): DataFrame = {
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables.lineitem(s, d)
      .join(sup, col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS LONG)"))
        .as("value_cents"))
    val tot = v.agg(sum(col("value_cents")).as("total_cents"))
    v.crossJoin(broadcast(tot))
      .filter(col("value_cents").cast("double") >
        col("total_cents").cast("double") * fraction)
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  /** DuckDB oracle for [[importantParts]]. */
  def importantPartsSql(nationName: String = "NATION_7",
      fraction: Double = 0.001): String =
    s"""WITH v AS (
       |  SELECT l_partkey,
       |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
       |      AS BIGINT) AS value_cents
       |  FROM lineitem
       |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
       |    JOIN nation ON s_nationkey = n_nationkey
       |    WHERE n_name = '$nationName')
       |  GROUP BY l_partkey),
       |tot AS (SELECT SUM(value_cents) AS total_cents FROM v)
       |SELECT l_partkey, value_cents FROM v, tot
       |WHERE CAST(value_cents AS DOUBLE) >
       |  CAST(total_cents AS DOUBLE) * $fraction
       |ORDER BY value_cents DESC, l_partkey""".stripMargin

  /** TPC-H Q14 shape — promo revenue share (q256): the fraction of
    * one ship-month's revenue that came from PROMO-type parts. The
    * part type rides a plain partkey equi-join (no filter — every
    * part classifies a side of the CASE), sized for AQE to broadcast
    * at small SF and shuffle at scale. One pass, one division. */
  def promoRevenueShare(s: SparkSession, d: String,
      from: String = "1999-09-01", until: String = "1999-10-01"): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_partkey"), revCents.as("rc"))
    li.join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(coalesce(sum(when(col("p_type") === "PROMO", col("rc"))),
          lit(0L)).as("promo_cents"),
        sum(col("rc")).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        round(lit(100.0) * col("promo_cents").cast("double")
          / col("total_cents").cast("double"), 6).as("promo_pct"))
  }

  /** DuckDB oracle for [[promoRevenueShare]]. */
  def promoRevenueShareSql(from: String = "1999-09-01",
      until: String = "1999-10-01"): String =
    s"""SELECT
       |  CAST(coalesce(SUM(CASE WHEN p_type = 'PROMO'
       |    THEN $revCentsSql END), 0) AS BIGINT) AS promo_cents,
       |  CAST(SUM($revCentsSql) AS BIGINT) AS total_cents,
       |  round(100.0 * CAST(coalesce(SUM(CASE WHEN p_type = 'PROMO'
       |      THEN $revCentsSql END), 0) AS DOUBLE)
       |    / CAST(SUM($revCentsSql) AS DOUBLE), 6) AS promo_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '$from'
       |  AND l_shipdate < TIMESTAMP '$until'""".stripMargin

  /** TPC-H Q15 shape — top supplier (q257): the supplier(s) whose
    * quarter revenue equals the maximum. The max is one scalar row
    * cross-joined back (Q15's CREATE VIEW + subquery-max, collapsed
    * into one plan); cent-exact sums make the equality well-defined
    * across engines and partitionings. */
  def topSupplier(s: SparkSession, d: String,
      from: String = "1999-01-01", until: String = "1999-04-01"): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revCents).as("total_rev_cents"))
    val mx = rev.agg(max(col("total_rev_cents")).as("max_cents"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev_cents") === col("max_cents"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_cents"))
      .orderBy(col("s_suppkey"))
  }

  /** DuckDB oracle for [[topSupplier]]. */
  def topSupplierSql(from: String = "1999-01-01",
      until: String = "1999-04-01"): String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, CAST(SUM($revCentsSql) AS BIGINT)
       |      AS total_rev_cents
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$from'
       |    AND l_shipdate < TIMESTAMP '$until'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_rev_cents
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev_cents = (SELECT MAX(total_rev_cents) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 shape — supplier diversity census (q258): distinct
    * suppliers who shipped each surviving (brand, type, size) part
    * class, excluding one brand, off-list sizes, and "complaint"
    * suppliers (negative balance stands in for Q16's LIKE
    * '%Complaints%'). The exclusion set is tiny → broadcast
    * left_anti; the count-distinct shuffles (brand,type,size,supp)
    * pairs, already deduped map-side by the partial aggregate. */
  def supplierClassCensus(s: SparkSession, d: String,
      exclBrand: String = "Brand#3",
      sizes: Seq[Int] = Seq(1, 5, 10, 15, 20)): DataFrame = {
    val pf = Tables.part(s, d)
      .filter(col("p_brand") =!= exclBrand &&
        col("p_size").isin(sizes.map(Integer.valueOf): _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
    val excl = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(pf, col("l_partkey") === col("p_partkey"))
      .join(excl, col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"),
        col("p_type"), col("p_size"))
  }

  /** DuckDB oracle for [[supplierClassCensus]]. */
  def supplierClassCensusSql(exclBrand: String = "Brand#3",
      sizes: Seq[Int] = Seq(1, 5, 10, 15, 20)): String =
    s"""SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> '$exclBrand'
       |  AND p_size IN (${sizes.mkString(", ")})
       |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
       |    WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q17 shape — small-quantity revenue (q259): revenue of
    * lineitems of one brand whose quantity is under 20% of that
    * part's average. The correlated AVG becomes one per-part
    * aggregate joined back; the threshold compare is PURE BIGINT
    * (qty_cents · 5 · n < sum_qty_cents ⟺ qty < 0.2·avg), so no
    * float boundary can flip a row between engines. */
  def smallQuantityRevenue(s: SparkSession, d: String,
      brand: String = "Brand#11"): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.part(s, d)
          .filter(col("p_brand") === brand)
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"),
        expr("CAST(round(l_quantity * 100) AS LONG)").as("qc"),
        expr("CAST(round(l_extendedprice * 100) AS LONG)").as("pc"))
    val avgq = li.groupBy(col("l_partkey"))
      .agg(sum(col("qc")).as("qs"), count(lit(1)).as("qn"))
    li.join(avgq, "l_partkey")
      .filter(col("qc") * lit(5L) * col("qn") < col("qs"))
      .agg(coalesce(sum(col("pc")), lit(0L)).as("rev_cents"),
        count(lit(1)).as("n_lines"))
      .select(col("rev_cents"), col("n_lines"),
        round(col("rev_cents").cast("double") / 100.0 / 7.0, 6)
          .as("avg_yearly"))
  }

  /** DuckDB oracle for [[smallQuantityRevenue]]. */
  def smallQuantityRevenueSql(brand: String = "Brand#11"): String =
    s"""WITH li AS (SELECT l_partkey,
       |    CAST(round(l_quantity * 100) AS BIGINT) AS qc,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
       |  FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part
       |    WHERE p_brand = '$brand')),
       |avgq AS (SELECT l_partkey, SUM(qc) AS qs, COUNT(*) AS qn
       |  FROM li GROUP BY l_partkey)
       |SELECT CAST(coalesce(SUM(pc), 0) AS BIGINT) AS rev_cents,
       |  COUNT(*) AS n_lines,
       |  round(CAST(coalesce(SUM(pc), 0) AS DOUBLE) / 100.0 / 7.0, 6)
       |    AS avg_yearly
       |FROM li JOIN avgq USING (l_partkey)
       |WHERE qc * 5 * qn < qs""".stripMargin

  /** TPC-H Q19 shape — disjunctive predicate revenue (q260): revenue
    * over an OR of three (brand, size-band, quantity-band) branches.
    * The three-brand part slice broadcasts; the disjunction lives in
    * ONE codegen'd filter after the join (Catalyst extracts the
    * common partkey equi-key, so the join itself stays hash-based —
    * the Q19 plan trap of a nested-loop join never materializes). */
  def disjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val branches = Seq(("Brand#12", 1, 5, 1, 11), ("Brand#21", 1, 10, 10, 20),
      ("Brand#23", 1, 15, 20, 30))
    val pf = Tables.part(s, d)
      .filter(col("p_brand").isin(branches.map(_._1): _*))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val cond = branches.map { case (b, s0, s1, q0, q1) =>
      col("p_brand") === b && col("p_size").between(s0, s1) &&
        col("l_quantity").between(q0, q1)
    }.reduce(_ || _)
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), revCents.as("rc"))
      .join(pf, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(coalesce(sum(col("rc")), lit(0L)).as("rev_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** DuckDB oracle for [[disjunctiveRevenue]]. */
  def disjunctiveRevenueSql: String =
    s"""SELECT CAST(coalesce(SUM($revCentsSql), 0) AS BIGINT)
       |    AS rev_cents,
       |  COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |    AND l_quantity BETWEEN 1 AND 11)
       |  OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10
       |    AND l_quantity BETWEEN 10 AND 20)
       |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q9 shape — product-line profit (q264): per supplier
    * nation and order year, revenue minus cost of goods for one
    * part-name family. The schema has no partsupp.ps_supplycost, so
    * cost re-anchors on part.p_retailprice (qty · retail cents — the
    * same dim-sourced per-unit cost role). Profit stays exact cents:
    * rev_cents − qty·unit_cents, summed as BIGINTs. Plan: filtered
    * part dim broadcasts with its price, supplier→nation broadcasts,
    * lineitem⋈orders shuffles once on orderkey. */
  def productProfit(s: SparkSession, d: String,
      nameToken: String = "red"): DataFrame = {
    val pf = Tables.part(s, d)
      .filter(col("p_name").contains(nameToken))
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS LONG)").as("unit_cents"))
    val supNat = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(s, d)
      .join(pf, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (revCents - expr("CAST(round(l_quantity) AS LONG)")
          * col("unit_cents")).as("profit_cents"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supNat, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("profit_cents")).as("profit_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** DuckDB oracle for [[productProfit]]. */
  def productProfitSql(nameToken: String = "red"): String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(SUM($revCentsSql
       |    - CAST(round(l_quantity) AS BIGINT)
       |      * CAST(round(p_retailprice * 100) AS BIGINT))
       |    AS BIGINT) AS profit_cents,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%$nameToken%'
       |GROUP BY n_name, o_year
       |ORDER BY n_name, o_year DESC""".stripMargin

  /** TPC-H Q12 shape — late-shipment priority census (q265): per
    * shipping-delay class (the schema has no shipmode; days from
    * order to ship bucketed at `lateDays` plays its role), how many
    * lines belong to urgent/high orders vs the rest, over one ship
    * year. Q12's defining conditional aggregation over the
    * orders⋈lineitem join is kept verbatim. */
  def lateShipmentCensus(s: SparkSession, d: String,
      from: String = "2000-01-01", until: String = "2001-01-01",
      lateDays: Int = 60): DataFrame = {
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").cast("date").as("od"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(when(col("sd") > date_add(col("od"), lateDays),
          lit("late")).otherwise(lit("ontime")).as("ship_class"),
        col("o_orderpriority"))
      .groupBy(col("ship_class"))
      .agg(coalesce(sum(when(
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)),
          lit(0L)).as("high_line_count"),
        coalesce(sum(when(
          !col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)),
          lit(0L)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  /** DuckDB oracle for [[lateShipmentCensus]]. */
  def lateShipmentCensusSql(from: String = "2000-01-01",
      until: String = "2001-01-01", lateDays: Int = 60): String =
    s"""SELECT CASE WHEN CAST(l_shipdate AS DATE) >
       |    CAST(o_orderdate AS DATE) + INTERVAL $lateDays DAY
       |    THEN 'late' ELSE 'ontime' END AS ship_class,
       |  CAST(coalesce(SUM(CASE WHEN o_orderpriority IN
       |    ('1-URGENT', '2-HIGH') THEN 1 END), 0) AS BIGINT)
       |    AS high_line_count,
       |  CAST(coalesce(SUM(CASE WHEN o_orderpriority NOT IN
       |    ('1-URGENT', '2-HIGH') THEN 1 END), 0) AS BIGINT)
       |    AS low_line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE l_shipdate >= TIMESTAMP '$from'
       |  AND l_shipdate < TIMESTAMP '$until'
       |GROUP BY ship_class ORDER BY ship_class""".stripMargin

  /** TPC-H Q20 shape — big shippers of a part family (q261):
    * suppliers who shipped more than `minQty` units of name-prefix
    * parts in one year, with their nation. Q20's nested
    * partsupp/availqty EXISTS chain becomes: prefix parts broadcast
    * → one lineitem aggregate per supplier → HAVING → semi-join the
    * supplier dim. Threshold compare in exact quantity-cents. */
  def bigShipperSuppliers(s: SparkSession, d: String,
      prefix: String = "small", from: String = "2000-01-01",
      until: String = "2001-01-01", minQty: Long = 100L): DataFrame = {
    val pf = Tables.part(s, d)
      .filter(col("p_name").startsWith(prefix))
      .select(col("p_partkey"))
    val shipped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(pf, col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_quantity * 100) AS LONG)"))
        .as("qty_cents"))
      .filter(col("qty_cents") > minQty * 100L)
    Tables.supplier(s, d)
      .join(shipped, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("qty_cents"))
      .orderBy(col("s_suppkey"))
  }

  /** DuckDB oracle for [[bigShipperSuppliers]]. */
  def bigShipperSuppliersSql(prefix: String = "small",
      from: String = "2000-01-01", until: String = "2001-01-01",
      minQty: Long = 100L): String =
    s"""WITH shipped AS (
       |  SELECT l_suppkey,
       |    CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT))
       |      AS BIGINT) AS qty_cents
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$from'
       |    AND l_shipdate < TIMESTAMP '$until'
       |    AND l_partkey IN (SELECT p_partkey FROM part
       |      WHERE p_name LIKE '$prefix%')
       |  GROUP BY l_suppkey
       |  HAVING qty_cents > ${minQty * 100L})
       |SELECT s_suppkey, s_name, n_name, qty_cents
       |FROM supplier JOIN shipped ON s_suppkey = l_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |ORDER BY s_suppkey""".stripMargin
}
