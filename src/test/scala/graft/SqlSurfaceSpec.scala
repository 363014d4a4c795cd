package graft

import graft.ops.Relational
import graft.parse.GraftFunctions

/** The SQL surface: every registered table + custom function is usable
  * from plain `spark.sql`, and the SQL form of a query matches its
  * DataFrame-API twin row for row. */
class SqlSurfaceSpec extends SparkTestBase {

  private def registered(): Unit = {
    Tables.registerAll(spark, sf(""))
    GraftFunctions.register(spark)
  }

  test("SQL first-seen dedup matches the DataFrame operator (D1)") {
    registered()
    val viaSql = spark.sql(
      """SELECT user_id, first_event_id, first_event_type FROM (
        |  SELECT user_id, event_id AS first_event_id,
        |         event_type AS first_event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY event_id) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val viaDf = Relational.dedupFirstSeen(spark, sf(""))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("SQL ROLLUP matches the DataFrame rollup (A7+)") {
    registered()
    val viaSql = spark.sql(
      """SELECT COALESCE(o_year, -1) AS o_year,
        |  COALESCE(o_month, -1) AS o_month, COUNT(*) AS n
        |FROM (SELECT CAST(year(o_orderdate) AS LONG) AS o_year,
        |        CAST(month(o_orderdate) AS LONG) AS o_month FROM orders) t
        |GROUP BY ROLLUP (o_year, o_month)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDf = Relational.rollupRevenue(spark, sf(""))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("custom functions compose inside one SQL statement") {
    registered()
    val rows = spark.sql(
      """SELECT p.pos, p.href, cosine_sim(array(1.0D, 0.0D),
        |  array(1.0D, 0.0D)) AS c
        |FROM (SELECT '<ul><li><a href="/a">x</a></li>
        |  <li><a href="/b">y</a></li></ul>' AS html) t
        |LATERAL VIEW parse_html(html, 'a') p AS pos, tag, href, text, attrs
        |""".stripMargin).collect()
    assert(rows.map(_.getString(1)).sorted.sameElements(Array("/a", "/b")))
    assert(rows.forall(_.getDouble(2) == 1.0))
  }
}
