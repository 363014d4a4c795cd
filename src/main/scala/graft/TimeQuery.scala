package graft

import org.apache.spark.sql.SparkSession

/** Times individual SparkEntry queries: runMain graft.TimeQuery <sfDir> <name...> */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
