package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Skew mitigation for hot keys: two-stage salted aggregation.
  *
  * Stage 1 aggregates (key, salt) partials — a hot key's rows spread
  * over `buckets` reducers; stage 2 merges the per-key partials (at
  * most `buckets` rows per key). The result is IDENTICAL to a direct
  * groupBy because the partials are decomposable (counts and exact
  * decimal sums) — which is exactly what the DuckDB oracle checks.
  * AQE's skew-join splitting covers joins; this is the aggregation
  * analog for when a single groupBy key dominates a 100 TB shuffle.
  */
object Skew {

  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      buckets: Int = 16): DataFrame = {
    val dec = DecimalType(18, 4)
    val stage1 = df
      .withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(col(valueCol).cast(dec)).as("_sum"))
    stage1.groupBy(col(key))
      .agg(sum(col("_n")).as("n_items"),
        sum(col("_sum")).cast("double").as("total_value"))
  }

  /** Salted per-supplier lineitem rollup (oracle: plain GROUP BY —
    * proving the two-stage rewrite is result-identical). */
  def saltedSupplierAgg(s: SparkSession, d: String): DataFrame =
    saltedAgg(Tables.lineitem(s, d), "l_suppkey", "l_quantity")

  /** Salted join: the fact side gets a deterministic salt, the (small)
    * dimension side is replicated across all `buckets` salts, and the
    * join runs on (key, salt) — a hot key's probe rows land on
    * `buckets` reducers instead of one. Result-identical to the plain
    * key join (every fact row still meets its dimension row exactly
    * once), which is what the oracle checks. AQE's skew-join split is
    * the adaptive variant; this is the explicit rewrite for when the
    * skew is known ahead of time. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    fact.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()),
        lit(buckets.toLong)))
      .join(saltedDim, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Per-segment event rollup through the salted join: events (fact)
    * against a 150-row user->segment dimension derived from customer.
    * Oracle: the plain unsalted join + GROUP BY. */
  def saltedSegmentAgg(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .groupBy((col("c_custkey") % 150).as("user_id"))
      .agg(max(col("c_mktsegment")).as("segment"))
    val dec = DecimalType(18, 4)
    saltedJoin(Tables.events(s, d), dim, "user_id")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("total_value"))
  }

  /** Join-key skew profile — the diagnostic that decides WHETHER to
    * salt: per-key cardinalities reduced to one row of order statistics
    * (key count, max, exact rank-based p50/p99, max/p50 ratio). Exact
    * ranks instead of interpolating percentiles because the two
    * engines' interpolation rules differ while "the count at rank
    * ceil(q*n) in (cnt, key) order" is the same integer everywhere.
    *
    * Scale shape: the corpus-sized work is the map-side-combined
    * per-key count; everything after runs on the KEY table (vocabulary-
    * sized, not corpus-sized) — the one global-order window is over
    * that reduced table, and the rank probes join against a broadcast
    * single-row stats table. */
  def skewProfile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("nk"), max(col("cnt")).as("mx"))
    val ranked = counts
      .withColumn("rn", row_number().over(
        Window.orderBy(col("cnt"), col("l_suppkey"))))
      .crossJoin(broadcast(stats))
    // rn is a row_number, so the equality matches exactly one row;
    // the limit(1) states that bound in the plan itself, making the
    // broadcasts below provably single-row to any plan audit
    def atRank(q: Double, name: String): DataFrame =
      ranked.filter(col("rn") ===
          ceil(lit(q) * col("nk").cast("double")).cast("long"))
        .limit(1)
        .select(col("cnt").as(name))
    stats.crossJoin(broadcast(atRank(0.5, "p50_cnt")))
      .crossJoin(broadcast(atRank(0.99, "p99_cnt")))
      .select(col("nk").as("n_keys"), col("mx").as("max_cnt"),
        col("p50_cnt"), col("p99_cnt"),
        round(col("mx").cast("double") / col("p50_cnt").cast("double"), 6)
          .as("skew_ratio"))
  }
}
