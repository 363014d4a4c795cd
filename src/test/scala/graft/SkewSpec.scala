package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relational, Skew}

/** Salted two-stage aggregation: result-identical to direct groupBy
  * even under an extreme single-key skew. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

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
