package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** ANALYZE-style column profiling: per-column row/null/ndv/min/max in a
  * single scan — the statistics pass a table maintenance cycle runs
  * before choosing join strategies (the CBO inputs). (Reference analog:
  * the per-run inventory counts scraper.py reports per municipality,
  * generalized to per-column data profiling.)
  *
  * Exact ndv per column via parallel column-pruned scans (see
  * [[columnProfile]] for why that beats one multi-count_distinct EXPAND
  * agg on columnar storage). At 100 TB, swap the exact groupBy-distinct
  * for `approx_count_distinct` (HLL, mergeable) and the per-column
  * shuffles disappear entirely — one scan, one 1-row agg; the q94
  * golden-ratio oracle pattern shows how to check that path.
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
    * engines).
    *
    * Shape: one branch per column, each a column-PRUNED scan (the
    * parquet reader materializes exactly one column per branch —
    * ReadSchema shows a single field) into groupBy(value) with map-side
    * partial counts, then an ndv-sized final agg. The branches share
    * nothing, so Spark runs them as independent parallel stages of one
    * job. The tempting alternative — every stat in ONE agg via multiple
    * count_distincts — plans an EXPAND of rows x (columns+1), an order
    * of magnitude slower measured at sf0.1 (it rewrites the whole-row
    * scan into 11 copies of itself). Per-column pruned scans beat
    * one expanded scan whenever the format is columnar. */
  def columnProfile(s: SparkSession, d: String): DataFrame = {
    val df = Tables.lineitem(s, d)
    Cols.map { c =>
      df.select(col(c).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("k").isNull, col("cnt"))), lit(0L))
            .as("n_nulls"),
          count(when(col("k").isNotNull, lit(1))).as("n_distinct"),
          // try_cast, not cast: ANSI mode throws on the string columns;
          // min/max over the distinct keys equals min/max over the rows
          min(expr("try_cast(k AS DOUBLE)")).as("min_num"),
          max(expr("try_cast(k AS DOUBLE)")).as("max_num"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_num"), col("max_num"))
    }.reduce(_ unionAll _).orderBy(col("col_name"))
  }

  /** DuckDB oracle for [[columnProfile]] — one UNION ALL branch per
    * column. MIN over TRY_CAST-ed values (not TRY_CAST of the string
    * MIN) mirrors the Spark aggregation order: on a mixed-numeric
    * string column the lexicographic min ('10' < '2') diverges from
    * the numeric min. */
  def columnProfileSql: String =
    Cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  MIN(TRY_CAST($c AS DOUBLE)) AS min_num,
         |  MAX(TRY_CAST($c AS DOUBLE)) AS max_num
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"

  /** Equi-join cardinality estimator: |T ⋈_k T| = Σ_k deg(k)² — the
    * exact statistic a planner (or this engine's own banded-join caps,
    * cf. Dedup's maxBucketSize gating) needs before committing to a
    * self-join. Cost: one map-side-combined count per key column over
    * one scan, then a few-row agg — the degree table is keys-sized,
    * never rows-sized. Emits one row per candidate join key.
    *
    * Range: est_pairs = Σ deg² is exact BIGINT while it stays under
    * ~9.2e18 — i.e. until a key set whose self-join would produce
    * quintillions of rows, at which point the NUMBER is moot (the
    * answer is "never run this join") but the column would wrap; at
    * that scale swap the Σ deg² aggregate to DECIMAL(38,0) (the q134
    * move) or estimate from the top-k degrees only. */
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

  /** Equi-depth histogram of o_totalprice in `buckets` buckets —
    * exact, WITHOUT a global single-partition window. The naive
    * formulation (`ntile` / `row_number` with no PARTITION BY) drags
    * every row through one partition; instead the global rank is
    * decomposed the same way as `Curation.tokenStreamOf`: rows get a
    * row_number within value-range SUBSPLITS (floor(price/step) — a
    * prefix of the (price, orderkey) sort order, so the decomposition
    * is exact), and each subsplit's global offset comes from a window
    * over the tiny per-subsplit count table, broadcast back. Bucket
    * assignment is then pure integer arithmetic: (rank-1)*B div n.
    * Every heavy operation is partitioned; only the subsplit-count
    * table (#subsplits rows) is sorted globally. */
  def equiDepthHistogram(s: SparkSession, d: String,
      buckets: Int = 10): DataFrame = {
    val step = 32768.0
    val base = Tables.orders(s, d)
      .select(col("o_totalprice").as("p"), col("o_orderkey").as("k"))
      .withColumn("sub", floor(col("p") / lit(step)).cast("long"))
    val wSub = Window.partitionBy(col("sub")).orderBy(col("p"), col("k"))
    val inSub = base.withColumn("rn", row_number().over(wSub))
    val wOff = Window.orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("sub"))
      .agg(count(lit(1)).as("sub_n"))
      .withColumn("off", coalesce(sum(col("sub_n")).over(wOff), lit(0L)))
      .select(col("sub"), col("off"))
    val n = base.agg(count(lit(1)).as("n"))
    inSub.join(broadcast(offsets), "sub")
      .crossJoin(broadcast(n))
      .withColumn("bucket",
        expr(s"((off + rn - 1) * $buckets) DIV n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("p")).as("lo"),
        max(col("p")).as("hi"))
      .orderBy(col("bucket"))
  }

  /** DuckDB oracle for [[equiDepthHistogram]] — the single-window
    * formulation with identical bucket arithmetic. */
  def equiDepthHistogramSql(buckets: Int = 10): String =
    s"""WITH r AS (SELECT o_totalprice AS p,
       |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
       |    COUNT(*) OVER () AS n
       |  FROM orders)
       |SELECT CAST(((rk - 1) * $buckets) // n AS BIGINT) AS bucket,
       |  COUNT(*) AS n_rows, MIN(p) AS lo, MAX(p) AS hi
       |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Chi-square independence test between two categorical columns
    * (documents.lang x documents.source) — the hypothesis-testing
    * member of the profiling family: is the language mix independent
    * of the source? Counts are one shuffle; marginals and N are
    * cell-table-sized aggregations broadcast back; every per-cell term
    * is a fixed-parenthesization double ((O·N − R·C)² / (N·R·C), all
    * factors cast before multiplying), and the final sum folds over
    * the cells in (lang, source) order via sort_array+aggregate — the
    * q106 ordered-fold discipline — so the scalar hash-matches DuckDB.
    * Emits one row: (n_cells, dof, chi2). */
  def chiSquareIndependence(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("lang")).agg(sum(col("o")).as("r"))
    val colT = cells.groupBy(col("source")).agg(sum(col("o")).as("c"))
    val nT = cells.agg(sum(col("o")).as("n"),
      count(lit(1)).as("n_cells"))
    val dofT = rowT.agg(count(lit(1)).as("nr"))
      .crossJoin(colT.agg(count(lit(1)).as("nc")))
      .select(((col("nr") - 1) * (col("nc") - 1)).as("dof"))
    cells
      .join(broadcast(rowT), "lang")
      .join(broadcast(colT), "source")
      .crossJoin(broadcast(nT))
      .withColumn("dev",
        col("o").cast("double") * col("n").cast("double")
          - col("r").cast("double") * col("c").cast("double"))
      .withColumn("term", col("dev") * col("dev")
        / (col("n").cast("double") * col("r").cast("double")
          * col("c").cast("double")))
      .agg(max(col("n_cells")).as("n_cells"),
        round(expr("aggregate(sort_array(collect_list(" +
          "struct(lang, source, term))), CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x.term)"), 6).as("chi2"))
      .crossJoin(broadcast(dofT))
      .select(col("n_cells"), col("dof"), col("chi2"))
  }

  /** DuckDB oracle for [[chiSquareIndependence]]. */
  def chiSquareIndependenceSql: String =
    """WITH cells AS (SELECT lang, source, COUNT(*) AS o
      |               FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r
      |       FROM cells GROUP BY 1),
      |ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c
      |       FROM cells GROUP BY 1),
      |nt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
      |t AS (SELECT lang, source,
      |        (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
      |          - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) AS dev,
      |        CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
      |          * CAST(c AS DOUBLE) AS denom
      |      FROM cells JOIN rt USING (lang) JOIN ct USING (source)
      |      CROSS JOIN nt)
      |SELECT (SELECT COUNT(*) FROM cells) AS n_cells,
      |  CAST(((SELECT COUNT(*) FROM rt) - 1)
      |    * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
      |  round(list_reduce(list(dev * dev / denom
      |    ORDER BY lang, source), (acc, x) -> acc + x), 6) AS chi2
      |FROM t""".stripMargin

  /** DuckDB oracle for [[joinSizeEstimate]]. */
  /** Exact two-sample Kolmogorov-Smirnov statistic between the
    * order-price distributions of even- and odd-keyed orders — the
    * "did these two cohorts draw from the same distribution" test
    * behind A/B sanity checks and train/validation split audits.
    * D = max over values v of |F_a(v) − F_b(v)|, computed entirely in
    * integers: prices quantize to exact cents (DECIMAL(15,2) * 100),
    * per-value marginals cumulate, and the max runs over
    * |cum_a·n_b − cum_b·n_a| so no fraction is ever formed until the
    * final rounded division. BIGINT range: needs n_a·n_b < 2^63, i.e.
    * ~3e9 rows per cohort — beyond that, bin values first (the q133
    * histogram) and run KS on the binned ECDF.
    *
    * Scale shape: the cumulative counts use the q133 device — a
    * DETERMINISTIC value-range sub-bucket key (v DIV step), a window
    * WITHIN each sub-bucket, and a broadcast sub-bucket offset table
    * (#subs rows) — so no global single-partition sort ever happens;
    * the oracle states the same math as one window. */
  def ksTest(s: SparkSession, d: String): DataFrame = {
    val step = 1048576L // ~$10k of cents per sub-bucket
    val marg = Tables.orders(s, d)
      .select((col("o_totalprice") * 100).cast("long").as("v"),
        (col("o_orderkey") % 2).as("g"))
      .groupBy(col("v"))
      .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") =!= 0, 1L).otherwise(0L)).as("cb"))
      .withColumn("sub", expr(s"v DIV $step"))
    val wSub = Window.partitionBy(col("sub")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = marg.groupBy(col("sub"))
      .agg(sum(col("ca")).as("sa"), sum(col("cb")).as("sb"))
      .withColumn("offa", coalesce(sum(col("sa")).over(wOff), lit(0L)))
      .withColumn("offb", coalesce(sum(col("sb")).over(wOff), lit(0L)))
      .select(col("sub"), col("offa"), col("offb"))
    val tot = marg.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    marg
      .withColumn("cwa", sum(col("ca")).over(wSub))
      .withColumn("cwb", sum(col("cb")).over(wSub))
      .join(broadcast(offsets), "sub")
      .crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        abs((col("offa") + col("cwa")) * col("nb")
          - (col("offb") + col("cwb")) * col("na")).as("dn"))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("dn")).as("d_num"))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("d_num"),
        round(col("d_num").cast("double")
          / (col("na") * col("nb")).cast("double"), 6).as("ks"))
  }

  /** DuckDB oracle for [[ksTest]] — the single-window formulation
    * with identical integer arithmetic. */
  def ksTestSql: String =
    """WITH marg AS (
      |  SELECT CAST(o_totalprice * 100 AS BIGINT) AS v,
      |    CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN o_orderkey % 2 <> 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM orders GROUP BY 1),
      |cum AS (SELECT v,
      |    SUM(ca) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    SUM(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM marg),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |               CAST(SUM(cb) AS BIGINT) AS nb FROM marg)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(MAX(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num,
      |  round(CAST(MAX(abs(cuma * nb - cumb * na)) AS DOUBLE)
      |    / CAST(na * nb AS DOUBLE), 6) AS ks
      |FROM cum, tot GROUP BY na, nb""".stripMargin

  def joinSizeEstimateSql: String =
    Seq("l_partkey", "l_suppkey", "l_orderkey").map { k =>
      s"""SELECT '$k' AS join_key, COUNT(*) AS n_keys,
         |  CAST(SUM(c * c) AS BIGINT) AS est_pairs,
         |  CAST(MAX(c) AS BIGINT) AS max_deg
         |FROM (SELECT $k, COUNT(*) AS c FROM lineitem GROUP BY 1)""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY join_key"
}
