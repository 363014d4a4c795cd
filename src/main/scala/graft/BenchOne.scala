package graft

/** Dev utility: time one or more named queries individually, printing
  * every run (warm + N timed) instead of Bench's best-of-two summary.
  * Usage: runMain graft.BenchOne q38_minhash_pairs [q39_...]
  * Reads SPARK_GRAFT_SF_DIR like [[Bench]].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    sys.env.get("BENCH_LOG").foreach(spark.sparkContext.setLogLevel)
    val runs = sys.env.getOrElse("BENCH_RUNS", "3").toInt
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(s"BENCHONE $name rows=${times.head._2} " +
        times.map(t => f"${t._1}%.3f").mkString(" "))
    }
    spark.stop()
  }
}
