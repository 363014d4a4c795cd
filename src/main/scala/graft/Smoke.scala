package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: runs the flagship entry() exactly as the driver does
  * (rows > 0 on sf0.001) and prints the result. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"entry rows: ${df.count()}")

    // Drive the E2 ingest pipeline end-to-end against fixture portals.
    val sink = java.nio.file.Files
      .createTempDirectory("graft_smoke_sink_").resolve("docs").toString
    val n1 = graft.pipeline.GenericIngest.run(spark,
      "src/test/resources/fixtures/municipalities.csv",
      "src/test/resources/fixtures/portals", sink)
    val n2 = graft.pipeline.GenericIngest.run(spark,
      "src/test/resources/fixtures/municipalities.csv",
      "src/test/resources/fixtures/portals", sink)
    spark.read.parquet(sink).show(10, truncate = false)
    println(s"ingest run1: $n1 docs, run2 (idempotent): $n2 docs")
    spark.stop()
  }
}
