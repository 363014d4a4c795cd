package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ANALYZE-style column profiling: per-column row/null/ndv/min/max in a
  * single scan — the statistics pass a table maintenance cycle runs
  * before choosing join strategies (the CBO inputs). (Reference analog:
  * the per-run inventory counts scraper.py reports per municipality,
  * generalized to per-column data profiling.)
  *
  * One `agg` computes every column's stats in one pass; the multiple
  * exact `count_distinct`s make Catalyst plan an EXPAND (rows x
  * (columns+1)) feeding a single shuffle. That is the right trade at
  * verification scale where exactness lets DuckDB hash-match. At 100 TB
  * swap `countDistinct` for `approx_count_distinct` (HLL, mergeable,
  * no expansion) — the plan collapses to one scan + one 1-row shuffle;
  * the q94 golden-ratio oracle pattern shows how to check that path.
  */
object Profiling {

  /** The lineitem columns profiled (timestamps excluded: their min/max
    * is type-specific, not a DOUBLE). */
  private val Cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "l_returnflag", "l_linestatus")

  /** Profile of the lineitem table: (col_name, n_rows, n_nulls,
    * n_distinct, min_num, max_num). String columns profile count/ndv
    * with NULL min/max (a non-numeric min casts to NULL on both
    * engines). */
  def columnProfile(s: SparkSession, d: String): DataFrame = {
    val df = Tables.lineitem(s, d)
    val aggs = Cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        // try_cast, not cast: ANSI mode throws on the string columns
        expr(s"try_cast(min($c) AS DOUBLE)").as(s"min_$c"),
        expr(s"try_cast(max($c) AS DOUBLE)").as(s"max_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = Cols.map(c =>
      s"'$c', n_rows, cnt_$c, ndv_$c, min_$c, max_$c").mkString(", ")
    one.selectExpr(s"stack(${Cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nonnull, n_distinct, min_num, max_num)")
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"))
      .orderBy(col("col_name"))
  }

  /** DuckDB oracle for [[columnProfile]] — one UNION ALL branch per
    * column; TRY_CAST mirrors Spark's null-on-non-numeric cast. */
  def columnProfileSql: String =
    Cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  TRY_CAST(MIN($c) AS DOUBLE) AS min_num,
         |  TRY_CAST(MAX($c) AS DOUBLE) AS max_num
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"

  /** Equi-join cardinality estimator: |T ⋈_k T| = Σ_k deg(k)² — the
    * exact statistic a planner (or this engine's own banded-join caps,
    * cf. Dedup's maxBucketSize gating) needs before committing to a
    * self-join. Cost: one map-side-combined count per key column over
    * one scan, then a few-row agg — the degree table is keys-sized,
    * never rows-sized. Emits one row per candidate join key. */
  def joinSizeEstimate(s: SparkSession, d: String): DataFrame = {
    val df = Tables.lineitem(s, d)
    val keys = Seq("l_partkey", "l_suppkey", "l_orderkey")
    keys.map { k =>
      df.groupBy(col(k)).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("c") * col("c")).as("est_pairs"),
          max(col("c")).as("max_deg"))
        .select(lit(k).as("join_key"), col("n_keys"),
          col("est_pairs"), col("max_deg"))
    }.reduce(_ unionAll _).orderBy(col("join_key"))
  }

  /** DuckDB oracle for [[joinSizeEstimate]]. */
  def joinSizeEstimateSql: String =
    Seq("l_partkey", "l_suppkey", "l_orderkey").map { k =>
      s"""SELECT '$k' AS join_key, COUNT(*) AS n_keys,
         |  CAST(SUM(c * c) AS BIGINT) AS est_pairs,
         |  CAST(MAX(c) AS BIGINT) AS max_deg
         |FROM (SELECT $k, COUNT(*) AS c FROM lineitem GROUP BY 1)""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY join_key"
}
