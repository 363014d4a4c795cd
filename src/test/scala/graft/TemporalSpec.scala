package graft

import org.apache.spark.sql.functions._

import graft.ops.Temporal

/** Temporal operators: sessionization, merge-asof join, bucketed range
  * join — invariants plus hand-computed golden cases. */
class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  test("sessionize groups events by gap and sums per session") {
    // every event of every session lands in exactly one session
    val sessions = Temporal.sessionize(spark, sf("events"))
    val nEvents = Tables.events(spark, sf("events")).count()
    val sessionSum = sessions.agg(sum($"n_events")).head().getLong(0)
    assert(sessionSum == nEvents)
    // session starts are >= 6h apart per user
    val byUser = sessions.select($"user_id", $"session_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
    byUser.foreach { ss =>
      val starts = ss.map(_._2).toSeq.sorted
      starts.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= 6L * 3600 * 1000 * 1000)
        case _ =>
      }
    }
  }

  test("merge-asof picks the latest update at or before each event") {
    // golden micro-case built through the same window machinery
    val upd = Seq((1L, 100L, 1.0), (1L, 200L, 2.0), (2L, 150L, 9.0))
      .toDF("user_id", "t", "upd_price")
      .select($"user_id", $"t", lit(0).as("typ"),
        lit(null).cast("long").as("event_id"), $"upd_price")
    val ev = Seq((1L, 99L, 10L), (1L, 100L, 11L), (1L, 250L, 12L),
      (2L, 149L, 20L))
      .toDF("user_id", "t", "event_id")
      .select($"user_id", $"t", lit(1).as("typ"), $"event_id",
        lit(null).cast("double").as("upd_price"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t", $"typ")
      .rowsBetween(Long.MinValue, 0)
    val out = upd.unionByName(ev)
      .withColumn("asof", last($"upd_price", ignoreNulls = true).over(w))
      .filter($"typ" === 1)
      .select($"event_id", $"asof")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L).isEmpty)          // before any update
    assert(out(11L).contains(1.0))    // tie goes to the update
    assert(out(12L).contains(2.0))    // latest preceding update
    assert(out(20L).isEmpty)          // other key, before its update
  }

  test("asofJoin covers every event exactly once") {
    val out = Temporal.asofJoin(spark, sf("events"))
    val nEvents = Tables.events(spark, sf("events")).count()
    assert(out.count() == nEvents)
    assert(out.select($"event_id").distinct().count() == nEvents)
  }

  test("bucketed range join equals the direct inequality join") {
    val bucketed = Temporal.rangeJoinWindows(spark, sf("events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // direct (non-bucketed) evaluation of the same predicate
    val base = 1704067200L * 1000 * 1000 * 1000
    val ev = Tables.events(spark, sf("events"))
      .select($"ts").collect().map(_.getLong(0))
    val direct = (0 until 20).map { wId =>
      val ws = base + wId * 129600L * 1000 * 1000 * 1000
      val we = ws + 5400L * 1000 * 1000 * 1000
      wId.toLong -> ev.count(t => t >= ws && t < we).toLong
    }.filter(_._2 > 0).toMap
    assert(bucketed == direct)
  }

  test("priorityMixByMonth: shares sum to 1, counts match brute force") {
    val d = sf("orders")
    val rows = Temporal.priorityMixByMonth(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val exp = graft.Tables.orders(spark, d)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
        " DIV 2592000000000"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == exp)
    rows.groupBy(_._1).foreach { case (m, cells) =>
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-3, s"month $m")
      val tot = cells.map(_._3).sum
      cells.foreach(c =>
        assert(math.abs(c._4 - c._3.toDouble / tot) < 1e-5))
    }
  }

  test("shipLatency: per-priority brute-force rank percentiles") {
    val d = sf("orders")
    val rows = Temporal.shipLatency(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val o = graft.Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
          " DIV 86400000000"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val gapsByG = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP_LTZ))" +
          " DIV 86400000000"))
      .collect().flatMap { r =>
        o.get(r.getLong(0)).map { case (g, od) =>
          (g, r.getLong(1) - od) }
      }.groupBy(_._1)
    rows.foreach { case (g, n, p50, p90, mx) =>
      val gaps = gapsByG(g).map(_._2).sorted
      assert(n == gaps.length.toLong, s"$g count")
      assert(p50 == gaps((gaps.length + 1) / 2 - 1), s"$g p50")
      assert(p90 == gaps((gaps.length * 9 + 9) / 10 - 1), s"$g p90")
      assert(mx == gaps.last)
      // the synthetic generator draws ship dates independently of
      // order dates, so negative gaps exist — the percentile math is
      // sign-agnostic and that is what this spec pins
    }
  }

  test("interOrderGaps equals brute-force gap percentiles") {
    val d = sf("orders")
    val row = Temporal.interOrderGaps(spark, d).head()
    val orders = graft.Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
          " DIV 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = orders.groupBy(_._1).values.flatMap { os =>
      val days = os.sortBy(o => (o._3, o._2)).map(_._3)
      days.zip(days.drop(1)).map { case (a, b) => b - a }
    }.toArray.sorted
    val n = gaps.length
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == gaps((n + 1) / 2 - 1), "p50")
    assert(row.getLong(2) == gaps((n * 9 + 9) / 10 - 1), "p90")
    assert(row.getLong(3) == gaps.last)
  }

  test("weeklyRevenueGrowth: weekly sums, lag, and growth ratio") {
    val d = sf("orders")
    val rows = Temporal.weeklyRevenueGrowth(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.length > 1, "need several weeks of orders")
    val exp = graft.Tables.orders(spark, d)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
        " DIV 604800000000"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == exp)
    // ordered; first week has no prev; growth matches the ratio
    assert(rows.head._3.isEmpty && rows.head._4.isEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._1 > a._1)
        assert(b._3.contains(a._2))
        b._4.foreach(g => assert(math.abs(
          g - (b._2 - a._2).toDouble / a._2) < 1e-5))
      case _ =>
    }
  }
}
