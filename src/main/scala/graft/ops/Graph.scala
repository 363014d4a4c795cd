package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over the order graph — the rank-propagation
  * family that complements the pointer-jumping connected components in
  * `Dedup.dupClusters`. (Reference analog: the municipality -> committee ->
  * meeting containment hierarchy the scrapers walk; generalized to the
  * customer–supplier transaction graph.)
  *
  * Everything is exact scaled-BIGINT arithmetic (total rank mass
  * `RankScale`, floor division for both the per-edge contribution split
  * and the damping factor), so a DuckDB CTE chain reproduces every
  * iteration bit-for-bit — the same oracle discipline as the md5-band
  * twins (q71/q86).
  *
  * 100 TB shape: edges are built once (one orders⋈lineitem shuffle +
  * distinct) and reused across iterations; each iteration is one
  * shuffle-join on the 16-byte (src, rank) pairs plus a groupBy on dst —
  * never the raw tables. At cluster scale you would pre-partition `edges`
  * by src once so every iteration's join is co-located, and checkpoint
  * the rank table every few rounds to cut the lineage, exactly as
  * `Dedup.dupClusters` does per pointer-jumping round.
  */
object Graph {

  /** Total rank mass, scaled: 1.0 == 1e12 so six decimal digits of
    * PageRank survive integer floor division at N ~ 1e6 nodes. */
  private val RankScale = 1000000000000L

  /** Directed bipartite edge list: customer -> supplier for every
    * distinct (customer, supplier) trading pair, plus the reverse edge
    * (suppliers rank customers back). Node ids are prefixed strings so
    * the two key spaces cannot collide. */
  private[graft] def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("cnode"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("snode"))
      .distinct()
    pairs.select(col("cnode").as("src"), col("snode").as("dst"))
      .unionAll(pairs.select(col("snode").as("src"), col("cnode").as("dst")))
  }

  /** PageRank with damping 0.85 over the trade graph, `iters` rounds,
    * top-`k` nodes by final rank. Every node has out-degree >= 1 by
    * construction (edges are bidirectional), so there is no dangling
    * mass to redistribute. Emits (node, rank_scaled) — rank_scaled is
    * the exact BIGINT the oracle CTE chain computes. */
  def pageRank(s: SparkSession, d: String, iters: Int = 5,
      k: Int = 20): DataFrame = {
    val edges = tradeEdges(s, d)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = deg.count() // one small action; N is a plan constant both sides
    val init = RankScale / n
    val base = (15L * init) / 100L
    var rank = deg.select(col("src").as("node"), lit(init).as("rank"))
    for (_ <- 1 to iters) {
      // `DIV`, not `/`: Spark's Divide on longs returns DOUBLE, and a
      // double at 1e12 magnitude would drift from the oracle's floor div
      rank = edges
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("rank DIV deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("c"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * c) DIV 100")).as("rank"))
    }
    rank.orderBy(col("rank").desc, col("node")).limit(k)
      .select(col("node"), col("rank").as("rank_scaled"))
  }

  /** DuckDB oracle for [[pageRank]]: the same iteration count unrolled
    * as a CTE chain with identical floor-division arithmetic. `n` is a
    * scalar subquery so the SQL is self-contained. */
  def pageRankSql(iters: Int = 5, k: Int = 20): String = {
    val head =
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cnode,
         |         's' || CAST(l_suppkey AS VARCHAR) AS snode
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (
         |  SELECT cnode AS src, snode AS dst FROM pairs
         |  UNION ALL SELECT snode AS src, cnode AS dst FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |r0 AS (SELECT src AS node, $RankScale // n AS rank FROM deg, nn)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    (15 * ($RankScale // nn.n)) // 100
         |      + (85 * SUM(r.rank // d.deg)) // 100 AS rank
         |  FROM edges e
         |  JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src, nn
         |  GROUP BY e.dst, nn.n)""".stripMargin
    }
    val tail =
      s"""SELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM r$iters
         |ORDER BY rank DESC, node LIMIT $k""".stripMargin
    (Seq(head) ++ steps).mkString(",\n") + "\n" + tail
  }

  /** Market-basket co-occurrence: part pairs that appear together in
    * the most orders. The self-join is order-scoped — quadratic only in
    * the per-order item count (TPC-H caps it at 7), so it scales as
    * O(rows x basket), not O(rows^2); the `<` on part key halves the
    * pairs and fixes a canonical orientation. */
  def basketPairs(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Degree profile of the trade graph: how many nodes have each
    * (side, degree) — the skew diagnostic you run before deciding the
    * PageRank partitioning. One shuffle on src, one tiny agg. */
  def degreeProfile(s: SparkSession, d: String): DataFrame =
    tradeEdges(s, d)
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .groupBy(substring(col("src"), 1, 1).as("side"), col("deg"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("side"), col("deg"))
}
