package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relational, Skew}

/** Salted two-stage aggregation: result-identical to direct groupBy
  * even under an extreme single-key skew. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("skewProfile reports exact rank-based order statistics") {
    val out = Skew.skewProfile(spark, sf("lineitem")).collect()(0)
    val (nk, mx, p50, p99, ratio) = (out.getLong(0), out.getLong(1),
      out.getLong(2), out.getLong(3), out.getDouble(4))
    // brute force over per-key counts
    val counts = Tables.lineitem(spark, sf("lineitem"))
      .groupBy($"l_suppkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, c) => (c, k) }.map(_._2)
    assert(nk == counts.length)
    assert(mx == counts.max)
    assert(p50 == counts(math.ceil(0.5 * counts.length).toInt - 1))
    assert(p99 == counts(math.ceil(0.99 * counts.length).toInt - 1))
    assert(math.abs(ratio - BigDecimal(mx.toDouble / p50.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(ratio >= 1.0)
  }

  test("saltedAgg equals direct groupBy under heavy skew") {
    val rnd = new scala.util.Random(9)
    // 10k rows, 90% on one hot key
    val rows = Seq.fill(10000)(
      (if (rnd.nextDouble() < 0.9) 1L else rnd.nextInt(50).toLong + 2L,
        math.round(rnd.nextDouble() * 1e4) / 100.0))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedAgg(df, "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n_items"),
        Relational.dsum($"v").as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct) // bit-exact, incl. the decimal-sum doubles
  }
}
