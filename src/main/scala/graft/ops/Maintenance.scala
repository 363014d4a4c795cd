package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators a long-running 100 TB pipeline needs:
  * the scheduled crawl appends small files every run (one per task per
  * run), and scan efficiency decays until someone rewrites the layout.
  */
object Maintenance {

  /** Output partition count for ~`targetFileMB`-sized files, from the
    * ACTUAL input bytes (not a row-count guess). Sizes come from one
    * `listStatus` per parent directory through the Hadoop FileSystem
    * API — scheme-independent (hdfs://, s3a://; `java.io.File` would
    * report 0 off-filesystem) and a handful of RPCs where a
    * per-file `getFileStatus` loop would pay one round trip per small
    * file — the exact pathology compaction exists to fix. */
  private def sizedParts(spark: SparkSession, df: DataFrame,
      targetFileMB: Int): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = df.inputFiles.map(new Path(_))
    val wanted = files.map(_.toUri.getPath).toSet
    val bytes = files.map(_.getParent).distinct.flatMap { dir =>
      dir.getFileSystem(conf).listStatus(dir)
        .filter(st => wanted.contains(st.getPath.toUri.getPath))
        .map(_.getLen)
    }.sum
    math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileMB`-sized files. The rewrite is a repartition (round
    * robin — even output sizes) plus an overwrite. Returns the output
    * partition count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileMB: Int = 128): Int = {
    val df = spark.read.parquet(inDir)
    val parts = sizedParts(spark, df, targetFileMB)
    df.repartition(parts).write.mode("overwrite").parquet(outDir)
    parts
  }

  /** Clustered compaction: like [[compact]], but range-partitions on
    * the cluster keys and sorts inside each output file. Parquet
    * row-group min/max statistics then carry disjoint key ranges per
    * file, so a filter on the cluster keys prunes whole files/row
    * groups at scan time — the layout that turns a 100 TB
    * time/tenant-filtered scan into a touch of a few files. Returns
    * the output partition count. */
  def compactClustered(spark: SparkSession, inDir: String, outDir: String,
      clusterCols: Seq[String], targetFileMB: Int = 128): Int = {
    require(clusterCols.nonEmpty, "clustered compaction needs keys")
    rewriteClustered(spark, inDir, outDir, targetFileMB, clusterCols.map(col))
  }

  /** Shared clustered-rewrite mechanics: size the output from actual
    * input bytes, range-partition + sort on the key expressions (plain
    * columns or computed keys like a Morton code), overwrite. */
  private def rewriteClustered(spark: SparkSession, inDir: String,
      outDir: String, targetFileMB: Int, keys: Seq[Column]): Int = {
    val df = spark.read.parquet(inDir)
    val parts = sizedParts(spark, df, targetFileMB)
    df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(outDir)
    parts
  }

  /** Z-order (Morton) key: bit-interleave the low `bits` bits of two
    * integer columns (x in even positions, y in odd). Sorting by this key
    * gives a layout where BOTH dimensions cluster — parquet min/max
    * stats then prune scans filtered on either column, where a
    * lexicographic sort prunes only the leading one. Pure codegen'd
    * arithmetic (shift/and/or fold, subexpression-eliminated), so the
    * key costs one projection at rewrite time. */
  def zorderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val xs = x.cast("long").bitwiseAND(lit(mask))
    val ys = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xs, j).bitwiseAND(lit(1L)), 2 * j))
        .bitwiseOR(shiftleft(shiftright(ys, j).bitwiseAND(lit(1L)),
          2 * j + 1))
    }
  }

  /** Morton keys for lineitem's two part-dimension filter columns
    * (oracle-checked bit-for-bit via shift/and arithmetic DuckDB
    * shares). */
  def zorderQuery(s: SparkSession, d: String): DataFrame =
    graft.Tables.lineitem(s, d).select(col("l_orderkey"),
      col("l_linenumber"),
      zorderKey2(col("l_partkey"), col("l_suppkey")).as("zkey"))

  /** Z-order clustered compaction: [[compactClustered]] on the Morton
    * key of two filter dimensions instead of a lexicographic sort —
    * the two-dimensional data-skipping layout. */
  def compactZOrder(spark: SparkSession, inDir: String, outDir: String,
      xCol: String, yCol: String, targetFileMB: Int = 128): Int =
    rewriteClustered(spark, inDir, outDir, targetFileMB,
      Seq(zorderKey2(col(xCol), col(yCol))))

  /** Data-quality constraint suite (the Deequ-style CHECK pass a
    * pipeline gates ingests on): one row per declared constraint with
    * checked/violation counts — key uniqueness, referential
    * integrity, null and domain rules. Each branch is an independent
    * column-pruned scan or a key-only anti-join (ids, never
    * payloads, cross the shuffle); a green suite is all-zero
    * `n_violations`, so the output doubles as an idempotent
    * monitoring table. */
  def constraintChecks(s: SparkSession, d: String): DataFrame = {
    val orders = graft.Tables.orders(s, d)
    val li = graft.Tables.lineitem(s, d)
    val cust = graft.Tables.customer(s, d)
    def row(name: String, checked: Column, viol: Column,
        src: DataFrame): DataFrame =
      src.agg(checked.as("n_checked"), viol.as("n_violations"))
        .select(lit(name).as("constraint"), col("n_checked"),
          col("n_violations"))
    val pkUnique = row("orders_pk_unique", count(lit(1)),
      count(lit(1)) - count_distinct(col("o_orderkey")), orders)
    // NULL FK values are the not-null rule's job, not the FK rule's:
    // restrict both probe and build sides to non-null keys so the
    // anti-join agrees with SQL NOT IN/NOT EXISTS on dirty data.
    val fkOrdersCust = orders.select(col("o_custkey"))
      .where(col("o_custkey").isNotNull)
      .join(cust.select(col("c_custkey").as("o_custkey"))
          .where(col("o_custkey").isNotNull),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("nv"))
      .crossJoin(orders.agg(count(lit(1)).as("nc")))
      .select(lit("orders_fk_customer").as("constraint"),
        col("nc").as("n_checked"), col("nv").as("n_violations"))
    val fkLiOrders = li.select(col("l_orderkey"))
      .where(col("l_orderkey").isNotNull)
      .join(orders.select(col("o_orderkey").as("l_orderkey"))
          .where(col("o_orderkey").isNotNull),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("nv"))
      .crossJoin(li.agg(count(lit(1)).as("nc")))
      .select(lit("lineitem_fk_orders").as("constraint"),
        col("nc").as("n_checked"), col("nv").as("n_violations"))
    val qtyPos = row("lineitem_qty_positive", count(lit(1)),
      sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)), li)
    val dateNotNull = row("orders_date_not_null", count(lit(1)),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)), orders)
    val discRange = row("lineitem_discount_range", count(lit(1)),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L)
        .otherwise(0L)), li)
    Seq(pkUnique, fkOrdersCust, fkLiOrders, qtyPos, dateNotNull,
      discRange).reduce(_ unionAll _)
      .orderBy(col("constraint"))
  }

  /** DuckDB oracle for [[constraintChecks]]. */
  def constraintChecksSql: String =
    """SELECT 'orders_pk_unique' AS "constraint", COUNT(*) AS n_checked,
      |  COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
      |FROM orders
      |UNION ALL
      |SELECT 'orders_fk_customer', (SELECT COUNT(*) FROM orders),
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
      |     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |UNION ALL
      |SELECT 'lineitem_fk_orders', (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem l
      |   WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
      |     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |UNION ALL
      |SELECT 'lineitem_qty_positive', COUNT(*),
      |  CAST(SUM(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders_date_not_null', COUNT(*),
      |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem_discount_range', COUNT(*),
      |  CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |ORDER BY "constraint"""".stripMargin

  /** Partition-pruning audit: how many row-group-sized buckets a
    * date-range predicate could SKIP under two physical layouts — the
    * quantified ROI of clustering data on the filter column, the
    * decision behind [[compactClustered]]. Each layout assigns orders
    * to key-range buckets (o_orderkey DIV step for the natural /
    * insertion layout, epoch-day DIV step for the date-clustered
    * layout — value-range buckets, not ntile, so no global window);
    * a bucket is prunable when its [min, max] o_orderdate interval
    * misses the predicate range, exactly the parquet row-group
    * min/max stats test. Emits per layout: bucket count, prunable
    * count, prune fraction — on insertion-ordered data expect ~0,
    * on clustered data expect ~the predicate's selectivity
    * complement. All exact integer arithmetic. */
  def pruningAudit(s: SparkSession, d: String,
      lo: String = "1997-01-01", hi: String = "1998-01-01",
      keyStep: Long = 1L << 9, dayStep: Long = 64L): DataFrame = {
    val o = graft.Tables.orders(s, d)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("day"))
    val loD = java.time.LocalDate.parse(lo).toEpochDay
    val hiD = java.time.LocalDate.parse(hi).toEpochDay
    def audit(layout: String, bucket: Column): DataFrame =
      o.groupBy(bucket.as("b"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("mx") < loD || col("mn") >= hiD, 1L)
            .otherwise(0L)).as("n_prunable"))
        .select(lit(layout).as("layout"), col("n_buckets"),
          col("n_prunable"),
          round(col("n_prunable").cast("double")
            / col("n_buckets").cast("double"), 6).as("prune_frac"))
    audit("1_natural", expr(s"o_orderkey DIV $keyStep"))
      .unionAll(audit("2_date_clustered", expr(s"day DIV $dayStep")))
      .orderBy(col("layout"))
  }

  /** DuckDB oracle for [[pruningAudit]]. */
  def pruningAuditSql(lo: String = "1997-01-01", hi: String = "1998-01-01",
      keyStep: Long = 1L << 9, dayStep: Long = 64L): String = {
    val loD = java.time.LocalDate.parse(lo).toEpochDay
    val hiD = java.time.LocalDate.parse(hi).toEpochDay
    def audit(layout: String, bucket: String): String =
      s"""SELECT '$layout' AS layout,
         |  COUNT(*) AS n_buckets,
         |  CAST(COALESCE(SUM(CASE WHEN mx < $loD OR mn >= $hiD
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_prunable,
         |  round(CAST(COALESCE(SUM(CASE WHEN mx < $loD OR mn >= $hiD
         |      THEN 1 ELSE 0 END), 0) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE), 6) AS prune_frac
         |FROM (SELECT $bucket AS b, MIN(day) AS mn, MAX(day) AS mx
         |      FROM o GROUP BY 1)""".stripMargin
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(datediff('day', DATE '1970-01-01',
       |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day
       |  FROM orders)
       |${audit("1_natural", s"o_orderkey // $keyStep")}
       |UNION ALL
       |${audit("2_date_clustered", s"day // $dayStep")}
       |ORDER BY layout""".stripMargin
  }
}
