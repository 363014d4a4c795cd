package graft

/** Diagnostic main behind the pinned-grain audit (VERDICT r17 tasks
  * 1-2): triggers every memoized build by constructing the full gate
  * surface at the given SF, then prints one line per pinned cache —
  * tag, row count, ACTUAL partition count, and the right-sizing
  * policy's floor ([[GraftSession.compactParts]]). A pinned cache
  * below the floor serializes every consumer scan (the r17 quantEmb
  * defect class); at corpus scale the floor clamps to the session's
  * shuffle parallelism, so "below floor" can only happen where a
  * build inherited a near-single-split grain locally.
  */
object GrainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.IndexMemo.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, sfDir) catch { case _: Throwable => () }
    }
    println(f"build wall: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    graft.ops.IndexMemo.pinnedSnapshot.sortBy(_._1).foreach {
      case (tag, df) =>
        try {
          val rows = df.count()
          val parts = df.rdd.getNumPartitions
          val floor = GraftSession.compactParts(spark, rows)
          val flag = if (parts < floor) "  << BELOW FLOOR" else ""
          println(f"$tag%-22s rows=$rows%9d parts=$parts%3d " +
            f"floor=$floor%3d$flag")
        } catch { case e: Throwable =>
          println(s"$tag: unreadable (${e.getClass.getSimpleName})")
        }
    }
    spark.stop()
  }
}
