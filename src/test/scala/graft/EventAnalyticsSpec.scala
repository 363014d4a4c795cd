package graft

import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

class EventAnalyticsSpec extends SparkTestBase {

  private def events() = Tables.events(spark, sf("events"))
    .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("funnel counts strictly-ordered stage completions") {
    val out = EventAnalytics.funnel(spark, sf("events")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet ==
      Set("1_signup", "2_view", "3_click", "4_purchase"))
    // monotone: each stage is a subset of the previous
    assert(out("1_signup") >= out("2_view"))
    assert(out("2_view") >= out("3_click"))
    assert(out("3_click") >= out("4_purchase"))
    // brute force
    val byUser = events().groupBy(_._1)
    val t1 = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == "signup").map(_._3).minOption.map(u -> _)
    }
    def next(prev: Map[Long, Long], tpe: String): Map[Long, Long] =
      prev.flatMap { case (u, t) =>
        byUser(u).filter(e => e._2 == tpe && e._3 > t)
          .map(_._3).minOption.map(u -> _)
      }
    val t2 = next(t1, "view")
    val t3 = next(t2, "click")
    val t4 = next(t3, "purchase")
    assert(out("1_signup") == t1.size.toLong)
    assert(out("2_view") == t2.size.toLong)
    assert(out("3_click") == t3.size.toLong)
    assert(out("4_purchase") == t4.size.toLong)
    assert(out("1_signup") > 0, "synthetic data must exercise the funnel")
  }

  test("kmvDistinct estimates within 40% of exact, exact under k") {
    val k = 32
    val out = EventAnalytics.kmvDistinct(spark, sf("events"), k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    out.foreach { case (tpe, exact, est) =>
      if (exact < k) assert(est == exact.toDouble, s"fallback $tpe")
      else {
        assert(est > 0)
        assert(math.abs(est - exact) / exact < 0.4,
          s"$tpe kmv $est vs exact $exact")
      }
    }
    // brute force one group end-to-end
    val (tpe, exact, est) = out.head
    val users = events().filter(_._2 == tpe).map(_._1).distinct.sorted
    assert(users.length.toLong == exact)
    // md5Frac32 hashes CAST(user AS STRING) without a seed prefix:
    // recompute with a plain md5 of the id string
    def frac(u: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(u.toString.getBytes("UTF-8"))
      val v = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
        ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
      v.toDouble / 4294967296.0
    }
    val sorted = users.map(u => (frac(u), u)).sorted
    val expected =
      if (users.length < k) users.length.toDouble
      else (k - 1).toDouble / sorted(k - 1)._1
    val rounded = BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(est - rounded) < 1e-9, s"$tpe est $est vs $rounded")
  }

  test("eventTrigrams matches a brute-force journey count") {
    val topK = 10
    val out = EventAnalytics.eventTrigrams(spark, sf("events"), topK)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val tri = events().groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._3, e._4)).map(_._2).sliding(3)
        .filter(_.length == 3).map(s => (s(0), s(1), s(2)))
    }
    val expect = tri.groupBy(identity)
      .map { case (t, xs) => (t._1, t._2, t._3, xs.length.toLong) }
      .toSeq.sortBy { case (a, b, c, n) => (-n, a, b, c) }.take(topK)
    assert(out.toSeq == expect)
  }

  test("retentionCohorts: offset-0 row per cohort covers all its users") {
    val out = EventAnalytics.retentionCohorts(spark, sf("events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall(_._2 >= 0), "offsets are never negative")
    // brute force
    val dayNs = 86400000000000L
    val days = events().map(e => (e._1, e._3 / dayNs)).distinct
    val cohort = days.groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).min }
    val expect = days.groupBy { case (u, day) =>
      (cohort(u), day - cohort(u))
    }.map { case (k2, xs) => (k2._1, k2._2, xs.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    assert(out.toSeq == expect)
    // every user appears exactly once at offset 0
    val zero = out.filter(_._2 == 0L).map(_._3).sum
    assert(zero == cohort.size.toLong)
  }

  test("conversionLatency percentiles are exact order statistics") {
    val d = sf("events")
    val row = EventAnalytics.conversionLatency(spark, d).collect()(0)
    // brute: per user first signup, first later purchase
    val evs = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lats = evs.groupBy(_._1).flatMap { case (_, rows) =>
      val sg = rows.filter(_._2 == "signup").map(_._3)
      if (sg.isEmpty) None
      else {
        val t1 = sg.min
        val pu = rows.filter(r => r._2 == "purchase" && r._3 > t1)
        if (pu.isEmpty) None else Some((pu.map(_._3).min - t1) / 1000000000L)
      }
    }.toSeq.sorted
    val n = lats.length
    assert(row.getLong(0) == n)
    def p(q: Double) = lats(math.ceil(q * n).toInt - 1)
    assert(row.getLong(1) == p(0.5))
    assert(row.getLong(2) == p(0.9))
    assert(row.getLong(3) == p(0.99))
  }

  test("ewmaLevel equals a sequential fold over hour buckets") {
    val d = sf("events")
    val out = EventAnalytics.ewmaLevel(spark, d).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val hourly = Tables.events(spark, d)
      .select(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .groupBy(col("event_type"), col("hour")).count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    hourly.groupBy(_._1).foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3.toDouble)
      val expected = xs.tail.foldLeft(xs.head)((acc, x) =>
        0.25 * x + 0.75 * acc)
      assert(out(tpe)._1 == xs.length)
      assert(math.abs(out(tpe)._2 - expected) < 1e-6 + 1e-9)
    }
  }

  test("hourlyAnomalies flags exactly the |z| > 3 hour buckets") {
    val d = sf("events")
    val flagged = EventAnalytics.hourlyAnomalies(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // brute force in doubles: population sigma per event type
    val hourly = Tables.events(spark, d)
      .select(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .groupBy(col("event_type"), col("hour")).count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = hourly.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val cs = rows.map(_._3.toDouble)
      val n = cs.length
      val mean = cs.sum / n
      val sigma = math.sqrt(cs.map(c => (c - mean) * (c - mean)).sum / n)
      rows.filter { case (_, _, c) =>
        n >= 2 && math.abs(c - mean) > 3 * sigma
      }.map(r => (tpe, r._2))
    }.toSet
    assert(flagged == brute)
  }

  test("psiDrift: non-negative, zero only for identical profiles") {
    val d = sf("events")
    val rows = EventAnalytics.psiDrift(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, ne, nl, psi) =>
      // every (p-q)ln(p/q) term is >= 0, so the sum is
      assert(psi >= 0.0, s"$tpe psi negative")
      assert(ne > 0 && nl > 0, s"$tpe empty half")
    }
  }

  test("trendSlope matches a driver-side least-squares fit per type") {
    val d = sf("events")
    val rows = EventAnalytics.trendSlope(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    // brute-force OLS from the raw hourly series
    val hours = graft.Tables.events(spark, d)
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.expr("ts div 3600000000000")
          .as("h"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (tpe, n, slope, intercept) =>
      val series = hours(tpe).map(t => (t._2, t._3))
      val h0 = series.map(_._1).min
      val xs = series.map(t => (t._1 - h0).toDouble)
      val ys = series.map(_._2.toDouble)
      val (sn, sx, sy) = (xs.length.toDouble, xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val den = sn * sxx - sx * sx
      assert(n == xs.length)
      assert(math.abs(slope - (sn * sxy - sx * sy) / den) < 1e-4,
        s"$tpe slope")
      assert(math.abs(intercept - (sy * sxx - sx * sxy) / den) < 1e-4,
        s"$tpe intercept")
    }
  }

  test("trendR2: brute-force R-squared, bounded in [0, 1]") {
    val rows = EventAnalytics.trendR2(spark, sf("events")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(rows.nonEmpty)
    val hours = events().map(e => (e._2, e._3 / 3600000000000L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (tpe, n, r2) =>
      val series = hours.collect { case ((t, h), y) if t == tpe =>
        (h, y) }.toSeq
      val h0 = series.map(_._1).min
      val xs = series.map(p => (p._1 - h0).toDouble)
      val ys = series.map(_._2.toDouble)
      val nn = xs.length.toDouble
      assert(n == xs.length.toLong)
      val num = nn * xs.zip(ys).map { case (a, b) => a * b }.sum -
        xs.sum * ys.sum
      val den = (nn * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        (nn * ys.map(a => a * a).sum - ys.sum * ys.sum)
      if (den == 0.0) assert(r2.isNaN)
      else {
        assert(math.abs(r2 - num * num / den) < 1e-4, s"$tpe r2")
        assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
      }
    }
  }

  test("sessionLengths matches brute-force gap splitting") {
    val gap = 1800000000000L
    val out = EventAnalytics.sessionLengths(spark, sf("events"), gap)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // brute force: per user, sort, split at gap, roll up
    val sessions = events().groupBy(_._1).values.flatMap { es =>
      val ts = es.sortBy(e => (e._3, e._4)).map(_._3)
      val out = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
      var cur = scala.collection.mutable.ArrayBuffer[Long]()
      ts.foreach { t =>
        if (cur.nonEmpty && t - cur.last > gap) {
          out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer()
        }
        cur += t
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.map(ss => (ss.length.toLong, ss.max - ss.min))
    }.toSeq
    val exp = sessions.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._2).sum)
    }
    assert(out == exp)
    assert(out.nonEmpty)
    // multi-event sessions must exist or the gap test is vacuous
    assert(out.keys.max > 1L, "need at least one multi-event session")
  }

  test("eventTransitions: counts match brute force, rows normalize") {
    val out = EventAnalytics.eventTransitions(spark, sf("events"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val exp = events().groupBy(_._1).values.flatMap { es =>
      val types = es.sortBy(e => (e._3, e._4)).map(_._2)
      types.zip(types.drop(1))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    assert(out.view.mapValues(_._1).toMap == exp)
    // each source row's probabilities sum to 1
    out.keys.map(_._1).toSeq.distinct.foreach { a =>
      val ps = out.collect { case ((`a`, _), (_, p)) => p }
      assert(math.abs(ps.sum - 1.0) < 1e-4, s"row $a")
    }
  }

  test("userGrowth: new-user counts sum to the user base, cum matches") {
    val rows = EventAnalytics.userGrowth(spark, sf("events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // brute force first-seen days
    val exp = events().groupBy(_._1).values
      .map(es => es.map(_._3 / 86400000000000L).min)
      .groupBy(identity).map { case (d2, xs) => d2 -> xs.size.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == exp)
    // days ascending, cumulative = running sum, final = user base
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)))
    var cum = 0L
    rows.foreach { case (_, nu, c) => cum += nu; assert(c == cum) }
    assert(cum == events().map(_._1).distinct.length.toLong)
  }

  test("funnelWilson: CI brackets the rate, k/n match funnel counts") {
    val counts = EventAnalytics.funnel(spark, sf("events")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = EventAnalytics.funnelWilson(spark, sf("events")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 3)
    val next = Map("1_signup" -> "2_view", "2_view" -> "3_click",
      "3_click" -> "4_purchase")
    rows.foreach { case (step, n, k, rate, lo, hi) =>
      assert(n == counts(step) && k == counts(next(step)))
      assert(math.abs(rate - k.toDouble / n) < 1e-6)
      assert(lo <= rate + 1e-9 && rate <= hi + 1e-9, s"$step brackets")
      assert(lo >= 0.0 && hi <= 1.0, s"$step Wilson stays in [0,1]")
      // brute-force Wilson at z = 1.959964
      val z = 1.959964; val p = k.toDouble / n
      val den = 1.0 + z * z / n
      val c = (p + z * z / (2.0 * n)) / den
      val h = z * math.sqrt(p * (1 - p) / n
        + z * z / (4.0 * n * n)) / den
      assert(math.abs(lo - (c - h)) < 1e-5 &&
        math.abs(hi - (c + h)) < 1e-5, s"$step formula")
    }
  }

  test("peakHours equals the brute-force argmax with explicit ties") {
    val rows = EventAnalytics.peakHours(spark, sf("events")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val prof = events().map(e => (e._2, e._3 / 3600000000000L % 24))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (tpe, hod, cnt, share) =>
      val hours = prof.collect { case ((t, h), c) if t == tpe => (h, c) }
      val best = hours.toSeq.sortBy { case (h, c) => (-c, h) }.head
      assert((hod, cnt) == best, s"$tpe peak")
      assert(math.abs(share - cnt.toDouble / hours.map(_._2).sum) < 1e-5)
    }
  }

  test("windowedFunnel: subset of unbounded funnel, brute-force equal") {
    val win = 86400000000000L
    val out = EventAnalytics.windowedFunnel(spark, sf("events"), win)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val open = EventAnalytics.funnel(spark, sf("events")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (k, v) => assert(v <= open(k), s"$k windowed>open") }
    // brute force with the deadline
    val byUser = events().groupBy(_._1)
    val t1 = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == "signup").map(_._3).minOption.map(u -> _)
    }
    def next(prev: Map[Long, Long], anchor: Map[Long, Long],
        tpe: String): Map[Long, Long] =
      prev.flatMap { case (u, t) =>
        byUser(u).filter(e => e._2 == tpe && e._3 > t &&
          e._3 - anchor(u) <= win).map(_._3).minOption.map(u -> _)
      }
    val t2 = next(t1, t1, "view")
    val t3 = next(t2, t1, "click")
    val t4 = next(t3, t1, "purchase")
    assert(out("1_signup") == t1.size.toLong)
    assert(out("2_view") == t2.size.toLong)
    assert(out("3_click") == t3.size.toLong)
    assert(out("4_purchase") == t4.size.toLong)
  }

  test("dauWau: brute-force rolling 7-day distinct, ratio in (0,1]") {
    val rows = EventAnalytics.dauWau(spark, sf("events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val ud = events().map(e => (e._1, e._3 / 86400000000000L)).distinct
    val dauExp = ud.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size)
    rows.foreach { case (day, dau, wau, st) =>
      assert(dau.toInt == dauExp(day), s"day $day dau")
      val wauExp = ud.filter(p => p._2 >= day - 6 && p._2 <= day)
        .map(_._1).distinct.size
      assert(wau.toInt == wauExp, s"day $day wau")
      assert(st > 0.0 && st <= 1.0)
      assert(math.abs(st - dau.toDouble / wau) < 1e-5)
    }
    assert(rows.map(_._1).toSet == dauExp.keySet)
  }

  test("lag1Autocorr equals brute-force Pearson over dense series") {
    val rows = EventAnalytics.lag1Autocorr(spark, sf("events"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(rows.nonEmpty)
    val byType = events().groupBy(_._2)
    rows.foreach { case (tpe, nPairs, r1) =>
      val hs = byType(tpe).map(_._3 / 3600000000000L)
      val counts = hs.groupBy(identity)
        .map { case (h, xs) => h -> xs.length.toLong }
      val dense = (hs.min to hs.max).map(h => counts.getOrElse(h, 0L))
      val pairs = dense.zip(dense.drop(1))
      assert(nPairs == pairs.length.toLong, s"$tpe n_pairs")
      val xs = pairs.map(_._1.toDouble); val zs = pairs.map(_._2.toDouble)
      val n = xs.length.toDouble
      val num = n * xs.zip(zs).map { case (a, b) => a * b }.sum -
        xs.sum * zs.sum
      val den = math.sqrt(n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        math.sqrt(n * zs.map(a => a * a).sum - zs.sum * zs.sum)
      if (den == 0.0) assert(r1.isNaN, s"$tpe degenerate")
      else assert(math.abs(r1 - num / den) < 1e-4, s"$tpe r1")
    }
  }

  test("fanoBurstiness equals brute variance/mean over dense series") {
    val rows = EventAnalytics.fanoBurstiness(spark, sf("events"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byType = events().groupBy(_._2)
    rows.foreach { case (tpe, nHours, meanRate, fano) =>
      val hs = byType(tpe).map(_._3 / 3600000000000L)
      val counts = hs.groupBy(identity)
        .map { case (h, xs) => h -> xs.length.toLong }
      val dense = (hs.min to hs.max).map(h =>
        counts.getOrElse(h, 0L).toDouble)
      assert(nHours == dense.length.toLong, s"$tpe n_hours")
      val m = dense.sum / dense.length
      val v = dense.map(y => (y - m) * (y - m)).sum / dense.length
      assert(math.abs(meanRate - m) < 1e-4, s"$tpe mean")
      assert(math.abs(fano - v / m) < 1e-4, s"$tpe fano")
      // the synthetic stream is near-Poisson: F must sit near 1, and
      // a broken densify (dropping zero hours) would push it off
      assert(fano > 0.5 && fano < 2.0, s"$tpe fano $fano")
    }
  }

  test("outOfOrderCensus matches a brute per-user arrival-stream scan") {
    import spark.implicits._
    val d = sf("events")
    val got = graft.ops.EventAnalytics.outOfOrderCensus(spark, d)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val ev = graft.Tables.events(spark, d)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[(Long, String, Long, Long)].collect()
    val pairs = ev.groupBy(_._1).values.toSeq.flatMap { g =>
      val s0 = g.sortBy(_._4) // arrival order = event_id
      s0.zip(s0.drop(1)).map { case (p, c) => (c._2, p._3, c._3) }
    }
    val exp = pairs.groupBy(_._1).map { case (tpe, v) =>
      val inv = v.count { case (_, prev, cur) => cur < prev }
      val back = v.collect { case (_, prev, cur) if cur < prev =>
        prev - cur }
      tpe -> (v.size.toLong, inv.toLong,
        BigDecimal(inv.toDouble / v.size).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        if (back.isEmpty) 0L else back.max)
    }
    assert(got == exp)
    // the synthetic stream is mostly ordered but not perfectly
    assert(got.values.map(_._2).sum >= 0L)
  }
}
