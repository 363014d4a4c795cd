package graft.tools

import org.apache.spark.sql.functions._

/** Prints the formatted physical plan of one ITERATIVE-fixpoint round
  * over the real pinned graph tables — the plan evidence the query's
  * own `explain` cannot give (each round's plan is transient: the
  * round result passes through `GraftSession.cut`, so the final
  * query's plan shows only an opaque cached scan).
  *
  * Runs the named query once (building and pinning its memoized graph
  * tables), then reconstructs the round expression every rank fixpoint
  * uses — `edges ⋈ broadcast(state) → groupBy(dst) → sum` — against
  * the pinned edge table from [[graft.ops.IndexMemo.pinnedSnapshot]],
  * and explains it. What to look for: whether an `Exchange` sits
  * between the partial and final `HashAggregate` (it does when the
  * pinned table carries no useful outputPartitioning; it disappears
  * when the pin is hash-partitioned on dst — the r18
  * `persistCompactBy` device).
  *
  * Usage: runMain graft.tools.RoundPlanAudit [sfDir] */
object RoundPlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q124_pagerank")(spark, sfDir).collect()
    val pinned = graft.ops.IndexMemo.pinnedSnapshot
    val edges = pinned.collect {
      case ("tradeGraph", df)
        if df.columns.toSet == Set("src", "dst", "deg") => df
    }.head
    val rank = edges.select(col("src")).distinct()
      .select(col("src"), lit(1000000L).as("rank"))
    val round = edges.join(broadcast(rank), "src")
      .select(col("dst"), expr("rank DIV deg").as("contrib"))
      .groupBy(col("dst")).agg(sum(col("contrib")).as("c"))
    println("========== one PageRank-shaped round over the pinned " +
      "trade-graph edges ==========")
    round.explain("formatted")
    spark.stop()
  }
}
