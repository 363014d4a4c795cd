package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}

/** Product-quantization tests: deterministic training, lossless
  * round-trip on representable data (ADC == exact dot), exact-twin
  * agreement with brute force, and the production recall floor. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  test("trainCodebooks is deterministic and shaped [m][ksub][dsub]") {
    val vecs = Array.tabulate(50)(i =>
      Array.tabulate(16)(j => ((i * 31 + j * 7) % 13).toDouble))
    val a = Pq.trainCodebooks(vecs, 4, 8)
    val b = Pq.trainCodebooks(vecs, 4, 8)
    assert(a.m == 4 && a.ksub == 8 && a.dim == 16)
    assert(a.flat.length == 4 * 8 * 4)
    assert(a.flat.sameElements(b.flat))
  }

  test("on representable data ADC reproduces the exact dot product") {
    // every subvector is one of ksub distinct patterns, so Lloyd's
    // converges to exactly those patterns and quantization is LOSSLESS:
    // pq_adc(code, lut) must equal dot(q, v) up to fp summation order
    val m = 4; val ksub = 4; val dsub = 2
    val patterns = Array(Array(1.0, 2.0), Array(-3.0, 0.5),
      Array(0.0, 0.0), Array(4.0, -1.0))
    val vecs = Array.tabulate(64) { i =>
      (0 until m).flatMap(mm => patterns((i + mm) % ksub)).toArray
    }
    val model = Pq.trainCodebooks(vecs, m, ksub)
    val q = Array.tabulate(m * dsub)(j => 0.5 + 0.25 * j)
    val lut = new Array[Double](m * ksub)
    for (mm <- 0 until m; kk <- 0 until ksub) {
      lut(mm * ksub + kk) = (0 until dsub).map(j =>
        q(mm * dsub + j) * model.flat((mm * ksub + kk) * dsub + j)).sum
    }
    graft.parse.GraftFunctions.register(spark)
    val df = vecs.toSeq.map(v => Tuple1(v.map(_.toFloat).toSeq))
      .toDF("vec")
    val out = df.select(
      call_function("pq_adc",
        call_function("pq_encode", col("vec"), lit(model.flat),
          lit(m), lit(ksub)),
        lit(lut), lit(ksub)).as("adc"))
      .collect().map(_.getDouble(0))
    vecs.zip(out).foreach { case (v, adc) =>
      val exact = v.zip(q).map { case (a, b) => a * b }.sum
      assert(math.abs(adc - exact) < 1e-9,
        s"adc $adc vs exact $exact")
    }
  }

  test("pq_encode emits one byte per subspace, every code < ksub") {
    val idx = Pq.buildPqIndex(spark, sf("embeddings"), m = 8, ksub = 16)
    val codes = idx.codes.select(col("code")).collect()
      .map(_.getAs[Array[Byte]](0))
    assert(codes.nonEmpty)
    assert(codes.forall(_.length == 8))
    assert(codes.forall(_.forall(b => (b & 0xff) < 16)))
  }

  test("annPq with a corpus-covering refine budget equals brute force") {
    val brute = Similarity.knnBruteForce(spark, sf("embeddings"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val pq = Pq.annPq(spark, sf("embeddings"), refineFactor = 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pq.toSeq == brute.toSeq)
  }

  test("measured PQ recall@10 at the production operating point clears a floor") {
    val queries = Seq(0L, 7L, 13L, 21L, 42L)
    val recalls = queries.map { q =>
      val brute = Similarity.knnBruteForce(spark, sf("embeddings"), q, 10)
        .collect().map(_.getLong(0)).toSet
      val ann = Pq.annPq(spark, sf("embeddings"), q, 10)
        .collect().map(_.getLong(0)).toSet
      (brute & ann).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    info(s"PQ recall@10 refine=16: $mean (per-query: $recalls)")
    assert(mean >= 0.7, s"mean PQ recall $mean below floor")
  }

  test("the ADC candidate scan reads codes and norms, never vectors") {
    val idx = Pq.buildPqIndex(spark, sf("embeddings"))
    // the scanned index is (bigint id, m-byte code, double norm) —
    // no array column ever enters the candidate-selection scan
    assert(idx.codes.schema.map(_.dataType.simpleString).sorted ==
      Seq("bigint", "binary", "double"))
    val plan = Pq.annPq(spark, sf("embeddings"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "candidate selection should be a bounded top-k, not a global sort")
  }

  test("SQ8 codes are within-range and reconstruct within half a step") {
    val codes = Pq.sq8Codes(spark, sf("embeddings")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.nonEmpty)
    assert(codes.forall { case (_, _, c) => c >= 0 && c <= 255 })
    val emb = graft.Tables.embeddings(spark, sf("embeddings"))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    val byDim = emb.values.toSeq.flatMap(_.zipWithIndex)
      .groupBy(_._2).map { case (dim, vs) =>
        dim -> (vs.map(_._1).min, vs.map(_._1).max)
      }
    codes.foreach { case (id, dim, c) =>
      val (mn, mx) = byDim(dim.toInt)
      val v = emb(id)(dim.toInt)
      val step = (mx - mn) / 255.0
      val decoded = mn + c * step
      assert(math.abs(decoded - v) <= step / 2 + 1e-9,
        s"vec $id dim $dim: |$decoded - $v| > ${step / 2}")
    }
  }

  test("sq8Fidelity: high cosine fidelity, mean >= min, sane bounds") {
    val row = graft.ops.Pq.sq8Fidelity(spark, sf("embeddings")).head()
    val n = graft.Tables.embeddings(spark, sf("embeddings")).count()
    assert(row.getLong(0) == n)
    val (mn, mean) = (row.getDouble(1), row.getDouble(2))
    assert(mn <= mean + 1e-9)
    assert(mean <= 1.0 + 1e-9)
    // 8-bit per-dim quantization of 64-dim vectors preserves cosine
    // to well over 0.99 on any non-degenerate corpus
    assert(mn > 0.99, s"min cosine $mn suspiciously low")
  }

  test("labelCohesion: brute-force centroid cosines per label") {
    val d = sf("embeddings")
    val rows = graft.ops.Pq.labelCohesion(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val vecs = graft.Tables.embeddings(spark, d)
      .select(org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    rows.foreach { case (label, n, meanCos, minCos) =>
      val members = vecs.filter(_._1 == label).map(_._2)
      assert(n == members.length.toLong)
      val dims = members.head.length
      val vq = members.map(_.map(v =>
        math.round(v.toDouble * 1e6)))
      val cq = (0 until dims).map { i =>
        math.round(vq.map(_(i)).sum.toDouble / members.length)
      }.toArray
      val coss = vq.map { v =>
        val dot = v.zip(cq).map { case (a, b) => a * b }.sum.toDouble
        val c = dot / (math.sqrt(v.map(a => a.toDouble * a).sum) *
          math.sqrt(cq.map(a => a.toDouble * a).sum))
        math.round(c * 1e6) / 1e6
      }
      assert(math.abs(meanCos - coss.sum / coss.length) < 2e-6,
        s"label $label mean")
      assert(math.abs(minCos - coss.min) < 2e-6, s"label $label min")
      assert(meanCos >= minCos)
    }
  }

  test("withinLabelScatter matches brute quantized scatter") {
    val d = sf("embeddings")
    val got = graft.ops.Pq.withinLabelScatter(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val emb = graft.Tables.embeddings(spark, d)
      .select($"label".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
    def rnd(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for ((lab, vs0) <- emb.groupBy(_._1)) {
      val vs = vs0.map(_._2)
      val q = vs.map(_.map(v => rnd(v.toDouble * 1e6)))
      val cent = Array.tabulate(64)(i =>
        rnd(q.map(_(i)).sum.toDouble / q.length))
      val ss = q.map(v => (0 until 64).map { i =>
        val dd = v(i) - cent(i); BigInt(dd) * BigInt(dd)
      }.sum).sum
      val exp = (BigDecimal(ss) / (BigDecimal(q.length) * BigDecimal(1e12)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (n, msd) = got(lab)
      assert(n == vs.length.toLong)
      assert(math.abs(msd - exp) < 2e-6, s"label $lab")
    }
    // tight labels: scatter is positive and finite
    assert(got.values.forall(v => v._2 > 0.0))
  }

  test("centroidDistances matches brute quantized centroid cosines") {
    val d = sf("embeddings")
    val got = graft.ops.Pq.centroidDistances(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val emb = graft.Tables.embeddings(spark, d)
      .select($"label".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
    // HALF_UP rounding to match Spark/DuckDB round() on negatives
    // (java math.round rounds -2.5 toward +inf, SQL round away from 0)
    def rnd(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val cent = emb.groupBy(_._1).map { case (lab, vs) =>
      val dims = vs.head._2.length
      lab -> Array.tabulate(dims) { i =>
        val q = vs.map(v => rnd(v._2(i).toDouble * 1e6))
        rnd(q.sum.toDouble / q.length)
      }
    }
    val labs = cent.keys.toSeq.sorted
    for (a <- labs; b <- labs if a < b) {
      val (ca, cb) = (cent(a), cent(b))
      val dot = ca.zip(cb).map { case (x, y) => x * y }.sum
      val na = math.sqrt(ca.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(cb.map(x => x.toDouble * x).sum)
      val exp = BigDecimal(dot.toDouble / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got((a, b)) - exp) < 2e-6, s"($a,$b)")
    }
    assert(got.size == labs.size * (labs.size - 1) / 2)
    // separated labels: no centroid pair should be identical
    assert(got.values.forall(_ < 1.0))
  }
}
