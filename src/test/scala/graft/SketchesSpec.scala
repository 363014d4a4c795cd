package graft

import org.apache.spark.sql.functions._

import graft.ops.{Sketches, TextOps}

/** Misra-Gries mergeable heavy-hitters: classic guarantees checked
  * against exact counts, plus recovery of the exact top set on the
  * real corpus. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("BottomKScored == rank-window selection on adversarial ties, " +
      "any partitioning") {
    // the aggregator replaced kmvDistinct's filterless rank window;
    // its reduce() early-out compares against the buffer's k-th entry
    // with an (score, id) tie chain — pin equivalence on data built to
    // stress exactly that: few distinct scores (massive ties), ids
    // interleaved, across several partitionings (merge() order varies)
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map(id => (id, (rnd.nextInt(5) + 1) / 10.0))
    for (k <- Seq(1, 7, 32); parts <- Seq(1, 3, 17)) {
      val expected = rows.sortBy { case (id, sc) => (sc, id) }.take(k)
      val agg = new Sketches.BottomKScored(k)
      // driver-side fold mirroring arbitrary partition splits + merges
      val merged = rows.grouped(math.max(1, rows.size / parts))
        .map(chunk => chunk.foldLeft(agg.zero)((b, r) =>
          agg.reduce(b, graft.ops.Scored(r._1, r._2))))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).map(s => (s.id, s.score)) == expected,
        s"k=$k parts=$parts")
      // and through the real Spark aggregation path
      val udafCol = udaf(agg,
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[graft.ops.Scored]())
      val got = rows.toDF("id", "score").repartition(parts)
        .agg(udafCol(col("id"), col("score")).as("sk"))
        .head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(got == expected, s"spark path k=$k parts=$parts")
    }
  }

  test("MG guarantees: frequent items kept, estimates within N/k") {
    // skewed stream: item i appears 2^(12-i) times, i = 1..12, plus
    // 500 singletons — across 8 partitions to exercise merge()
    val rows = (1 to 12).flatMap(i => Seq.fill(1 << (12 - i))(s"hot$i")) ++
      (1 to 500).map(i => s"cold$i")
    val n = rows.length.toLong
    val k = 64
    val df = rows.toDF("t").repartition(8)
    val got = Sketches.approxHeavyHitters(df, col("t"), k).toMap
    val exact = rows.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    exact.foreach { case (t, c) =>
      if (c > n / k) assert(got.contains(t), s"$t (count $c) missing")
      got.get(t).foreach { est =>
        assert(est <= c, s"$t overestimated: $est > $c")
        assert(est >= c - n / k, s"$t underestimated: $est < ${c - n / k}")
      }
    }
    assert(got.size <= k)
  }

  test("MG with ample k recovers the exact top-20 of the corpus") {
    val exact = TextOps.heavyHitters(spark, sf("documents"), 20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val approx = Sketches.approxHeavyHitters(
      Tables.documents(spark, sf("documents"))
        .select(explode(split(col("text"), " ")).as("t")),
      col("t"), 4096).toMap
    // with k far above the distinct-token count the sketch is exact
    exact.foreach { case (t, c) =>
      assert(approx.get(t).contains(c), s"$t: ${approx.get(t)} != $c")
    }
  }

  test("per-group MG finds each stratum's own hot terms") {
    val rows =
      Seq.fill(300)(("da", "og")) ++ Seq.fill(150)(("da", "kommune")) ++
        (1 to 80).map(i => ("da", s"da$i")) ++
        Seq.fill(300)(("en", "the")) ++ Seq.fill(150)(("en", "council")) ++
        (1 to 80).map(i => ("en", s"en$i"))
    val out = Sketches.approxHeavyHittersByKey(
      rows.toDF("lang", "term").repartition(8),
      col("lang"), col("term"), k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // each stratum's hot terms are found with near-exact counts, and
    // never leak into the other stratum
    assert(out(("da", "og")) >= 300 - 530 / 16)
    assert(out(("en", "the")) >= 300 - 530 / 16)
    assert(!out.contains(("da", "the")) && !out.contains(("en", "og")))
  }

  test("MG summary is deterministic across partitionings") {
    val rows = (1 to 6).flatMap(i => Seq.fill(1 << (8 - i))(s"x$i"))
    val a = Sketches.approxHeavyHitters(rows.toDF("t").repartition(2),
      col("t"), 4).toMap
    val b = Sketches.approxHeavyHitters(rows.toDF("t").repartition(16),
      col("t"), 4).toMap
    // the heavy tail survives identically regardless of partitioning
    (1 to 2).foreach(i => assert(a.contains(s"x$i") && b.contains(s"x$i")))
  }

  test("CMS never underestimates; merge equals sequential, any split") {
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(2000)(s"t${rnd.nextInt(80)}")
    val depth = 4; val width = 64
    val agg = new Sketches.CountMinAgg[String](depth, width, identity)
    val seqM = items.foldLeft(agg.zero)(agg.reduce)
    val exact = items.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    exact.foreach { case (t, c) =>
      val est = Sketches.cmEstimate(seqM, depth, width, t)
      assert(est >= c, s"$t underestimated: $est < $c")
      // CM error bound: overshoot <= 2N/width w.h.p.; with this seed
      // the deterministic stream must respect it for every item
      assert(est <= c + 2L * items.length / width,
        s"$t overshoot: $est vs $c")
    }
    // mergeability: cell-wise identical to the sequential matrix for
    // arbitrary partition splits (buffers are mutable - rebuild per run)
    Seq(1, 3, 7, 200).foreach { nparts =>
      val whole = items.foldLeft(agg.zero)(agg.reduce)
      val merged = items.grouped(math.max(1, items.size / nparts))
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(merged.sameElements(whole), s"nparts $nparts")
    }
  }

  test("CMS Aggregator and the relational q92 matrix agree cell-for-cell") {
    val depth = 4; val width = 256
    val docs = Tables.documents(spark, sf("documents"))
    val toks = docs.select(explode(split(col("text"), " ")).as("term"))
      .as[String].collect()
    val agg = new Sketches.CountMinAgg[String](depth, width, identity)
    val matrix = toks.foldLeft(agg.zero)(agg.reduce)
    val out = Sketches.cmsEstimateQuery(spark, sf("documents")).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (term, nExact, nCms) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nCms >= nExact, s"$term: CMS $nCms < exact $nExact")
      assert(nCms == Sketches.cmEstimate(matrix, depth, width, term),
        s"$term: relational $nCms != aggregator estimate")
    }
  }

  test("HLL++ distinct tracks exact within the rsd bound (q94 shape)") {
    // 5k distinct keys seen 4x each, spread over partitions so sketch
    // merge is exercised
    val df = (1 to 20000).map(i => (i % 5000).toLong).toDF("k")
      .repartition(8)
    val r = df.agg(approx_count_distinct($"k", 0.01).as("a"),
      countDistinct($"k").as("e")).head
    val (a, e) = (r.getLong(0), r.getLong(1))
    assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
    // and the oracled query shape lands exactly on ratio 1.0
    val out = Sketches.hllDistinctQuery(spark, sf("")).head
    assert(out.getDouble(1) == 1.0, s"ratio ${out.getDouble(1)}")
  }

  test("quantileSketch: exact ranks right, estimate = brute sample") {
    val k = 256
    val row = Sketches.quantileSketch(spark, sf(""), k).head
    val vals = graft.Tables.orders(spark, sf(""))
      .select($"o_orderkey",
        round($"o_totalprice" * 100, 0).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = vals.length
    assert(row.getLong(0) == n.toLong && row.getInt(1) == k)
    // exact percentiles: value at rank ceil(q*n), 1-indexed
    val sortedV = vals.map(_._2).sorted
    def exact(qn: Int, qd: Int): Long =
      sortedV((n * qn + qd - 1) / qd - 1)
    assert(row.getLong(2) == exact(1, 2), "p50_exact")
    assert(row.getLong(4) == exact(9, 10), "p90_exact")
    assert(row.getLong(6) == exact(99, 100), "p99_exact")
    // estimates: same md5-fraction draw computed driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    def frac(id: Long): Double = {
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 8), 16).toDouble /
        4294967296.0
    }
    val sample = vals.map { case (id, v) => (frac(id), id, v) }
      .sortBy(t => (t._1, t._2)).take(k).map(t => (t._3, t._2))
      .sortBy(identity).map(_._1)
    def est(q: Double): Long = sample(math.ceil(q * k).toInt - 1)
    assert(row.getLong(3) == est(0.50), "p50_est")
    assert(row.getLong(5) == est(0.90), "p90_est")
    assert(row.getLong(7) == est(0.99), "p99_est")
    // the sketch is actually a useful estimator at this k
    assert(math.abs(row.getLong(3) - row.getLong(2)).toDouble /
      row.getLong(2) < 0.25, "p50 estimate way off")
  }

  test("kmvSourceJaccard: brute KMV replication + exact column truth") {
    val d = sf("documents")
    val k = 64
    val got = Sketches.kmvSourceJaccard(spark, d, k = k).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3))))
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, d)
      .select($"source", $"text").as[(String, String)].collect()
    val vocab = docs.groupBy(_._1).map { case (s, rows) =>
      s -> rows.flatMap(_._2.split(" ")).toSet }
    val md = java.security.MessageDigest.getInstance("MD5")
    def frac(t: String): Double = {
      val h = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 8), 16).toDouble /
        4294967296.0
    }
    def sketch(ts: Set[String]): Seq[String] =
      ts.toSeq.map(t => (frac(t), t)).sortBy(identity).take(k).map(_._2)
    for (((sa, sb), (kmv, exact)) <- got) {
      val (va, vb) = (vocab(sa), vocab(sb))
      val bruteExact = (va & vb).size.toDouble / (va | vb).size
      assert(math.abs(exact - bruteExact) < 1e-5, s"exact $sa/$sb")
      val (ska, skb) = (sketch(va).toSet, sketch(vb).toSet)
      val merged = sketch(ska | skb).toSet
      val bruteKmv =
        merged.count(t => ska(t) && skb(t)).toDouble / merged.size
      assert(math.abs(kmv - bruteKmv) < 1e-5, s"kmv $sa/$sb")
      // the estimate is in range and not absurdly far from truth
      assert(kmv >= 0.0 && kmv <= 1.0)
      assert(math.abs(kmv - bruteExact) < 0.35)
    }
  }
}
