package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

class RetrievalSpec extends SparkTestBase {

  test("bm25TopK ranks by a brute-force mirror of the score") {
    val k1 = 1.2; val b = 0.75
    val terms = Seq("spark", "hash", "window")
    val out = Retrieval.bm25TopK(spark, sf("documents"), terms, topK = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 20)
    // brute-force in memory
    val docs = Tables.documents(spark, sf("documents"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val dfs = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val scored = docs.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val idf = math.log((n - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1.0)
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
      }.reduceLeft(_ + _)
      id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }.take(20)
    assert(out.toSeq == scored.toSeq,
      s"engine ${out.take(3).toSeq} vs brute ${scored.take(3)}")
  }

  test("invertedIndex caps postings but keeps the full df") {
    val out = Retrieval.invertedIndex(spark, sf("documents"), maxPostings = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    out.foreach { case (term, df, postings) =>
      val ids = postings.split(",").map(_.toLong)
      assert(ids.length <= 5, s"$term postings over cap")
      assert(ids.sorted.sameElements(ids), s"$term postings unsorted")
      assert(df >= ids.length, s"$term df below postings length")
    }
    // the cap must actually bite on common terms, and df must exceed it
    assert(out.exists { case (_, df, p) =>
      df > 5 && p.split(",").length == 5
    })
    // spot-check one term against brute force
    val docs = Tables.documents(spark, sf("documents"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet)
    val (term, df, postings) = out.head
    val expectIds = docs.filter(_._2.contains(term)).map(_._1).sorted
    assert(df == expectIds.length)
    assert(postings == expectIds.take(5).mkString(","))
  }

  test("rrfFusion fuses the two channel rankings by reciprocal rank") {
    val d = sf("documents")
    val (k, rrfK) = (50, 60)
    val out = Retrieval.rrfFusion(spark, d, k = k, rrfK = rrfK)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // rebuild the channel rank maps from the retrievers themselves
    def ranks(rows: Array[(Long, Double)]): Map[Long, Long] =
      rows.sortBy { case (id, s) => (-s, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val lex = ranks(Retrieval.bm25TopK(spark, d, topK = k).collect()
      .map(r => (r.getLong(0), r.getDouble(1))))
    val sem = ranks(graft.ops.Similarity.knnBruteForce(spark, d, 0L, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))))
    out.foreach { case (id, rl, rs, rrf) =>
      assert(rl == lex.getOrElse(id, 0L))
      assert(rs == sem.getOrElse(id, 0L))
      def t(r: Long) = if (r > 0) 1.0 / (rrfK + r) else 0.0
      assert(math.abs(rrf - (t(rl) + t(rs))) < 1e-6)
      // every fused row was retrieved by at least one channel
      assert(rl > 0 || rs > 0)
    }
    // a doc ranked by BOTH channels outscores one found by a single
    // channel at similar depth — the point of fusion
    val both = out.filter(r => r._2 > 0 && r._3 > 0)
    val single = out.filter(r => r._2 == 0 || r._3 == 0)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_._4).max > single.map(_._4).max)
  }
}
