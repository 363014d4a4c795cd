package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.Bucketing

/** Bucketed tables make the recurring join shuffle-free: same result,
  * no exchange in the physical plan. */
class BucketingSpec extends SparkTestBase {

  test("co-located join of same-bucketed tables has no shuffle exchange") {
    val orders = Tables.orders(spark, sf("orders"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val customer = Tables.customer(spark, sf("customer"))
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "b_customer", "o_custkey", 8)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Bucketing.colocatedJoin(spark, "b_orders",
          "b_customer", "o_custkey")
        // identical result to the plain dataframe join
        val expected = orders.join(customer, "o_custkey").count()
        assert(joined.count() == expected)
        val exchanges = joined.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(exchanges.isEmpty,
          s"expected a shuffle-free bucket join, found: $exchanges")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
