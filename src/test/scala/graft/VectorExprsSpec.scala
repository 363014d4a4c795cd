package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Native codegen'd vector expressions vs the interpreted fold
  * reference implementation. */
class VectorExprsSpec extends SparkTestBase {
  import spark.implicits._

  test("native cosine_sim is bit-identical to the fold cosine on real data") {
    val emb = Tables.embeddings(spark, sf("embeddings"))
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".as("qe"))
    val both = emb.crossJoin(broadcast(q))
      .select($"vec_id",
        Similarity.cosine($"embedding", $"qe").as("fold"),
        Similarity.nativeCosine(spark, $"embedding", $"qe").as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("native dot_product matches the fold dot on double arrays") {
    graft.parse.GraftFunctions.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("fold"),
        call_function("dot_product", $"a", $"b").as("native"))
      .head()
    assert(df.getDouble(0) == 32.0 && df.getDouble(1) == 32.0)
  }

  test("cosine_sim of a zero vector is null (matches nullif contract)") {
    graft.parse.GraftFunctions.register(spark)
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(call_function("cosine_sim", $"a", $"b").as("c"),
        Similarity.cosine($"a", $"b").as("fold"))
      .head()
    assert(df.isNullAt(0) && df.isNullAt(1))
  }

  test("cosine_sim works in SQL after registration") {
    graft.parse.GraftFunctions.register(spark)
    Tables.embeddings(spark, sf("embeddings"))
      .createOrReplaceTempView("emb_v")
    val n = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_v a JOIN emb_v b ON b.vec_id = 0
        |WHERE a.vec_id < 5""".stripMargin).count()
    assert(n == 5)
  }
}
