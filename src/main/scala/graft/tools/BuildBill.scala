package graft.tools

/** Dev utility: run the named queries once (warm) and print the
  * per-tag memoized-build wall bill — the targeted-run complement of
  * the full bench sidecar's `memo_build_s_by_tag`.
  * Usage: runMain graft.tools.BuildBill q127_basket_pairs ... */
object BuildBill {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.IndexMemo.clear()
    args.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())
    graft.ops.IndexMemo.buildNanosByTag.toSeq.sortBy(-_._2).foreach {
      case (t, ns) => println(f"BUILDBILL $t ${ns / 1e9}%.3f")
    }
    spark.stop()
  }
}
