package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Tests for text-analysis operators (langid, quality, token stats). */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("bpePairMining returns the exact top adjacent pairs") {
    val out = TextOps.bpePairMining(spark, sf("documents"), topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.length == 10)
    val docs = Tables.documents(spark, sf("documents"))
      .select($"text").collect().map(_.getString(0).split(" ").toSeq)
    val brute = docs.flatMap(toks => toks.zip(toks.drop(1)))
      .groupBy(identity).map { case ((a, b), xs) =>
        (a, b, xs.length.toLong)
      }.toSeq.sortBy { case (a, b, c) => (-c, a, b) }.take(10)
    assert(out.toSeq == brute)
  }

  test("unigramNll matches an in-memory ordered-fold mirror") {
    val out = TextOps.unigramNll(spark, sf("documents")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val docs = Tables.documents(spark, sf("documents"))
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val counts = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toDouble
    }
    val total = docs.map(_._2.length).sum.toDouble
    assert(out.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, toks) =>
      val sum = toks.map(t => -math.log(counts(t) / total))
        .foldLeft(0.0)(_ + _)
      val mean = BigDecimal(sum / toks.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(id) - mean) < 1e-9,
        s"doc $id nll ${out(id)} vs $mean")
      assert(out(id) > 0)
    }
  }

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c($"text").as("r")).collect()(0).get(0)

  test("bigramNll matches an in-memory interpolated-LM mirror") {
    val out = TextOps.bigramNll(spark, sf("documents")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val docs = Tables.documents(spark, sf("documents"))
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val uni = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toDouble }
    val bi = docs.flatMap(_._2.sliding(2).filter(_.length == 2))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toDouble }
    val n = docs.map(_._2.length).sum.toDouble
    val multi = docs.filter(_._2.length >= 2)
    assert(out.keySet == multi.map(_._1).toSet)
    multi.foreach { case (id, toks) =>
      val nlps = toks.sliding(2).filter(_.length == 2).map { p =>
        -math.log(0.7 * (bi(p) / uni(p.head)) + 0.3 * (uni(p(1)) / n))
      }.toSeq
      val mean = BigDecimal(nlps.foldLeft(0.0)(_ + _) / nlps.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(id) - mean) < 1e-9,
        s"doc $id bigram nll ${out(id)} vs $mean")
      assert(out(id) > 0)
    }
  }

  test("zipfFit recovers the slope of an exact power law") {
    // synthetic corpus: term k appears floor(1000/k) times, k=1..50 —
    // rank-frequency is a near-exact Zipf curve with slope ~ -1
    val words = (1 to 50).flatMap(k => Seq.fill(1000 / k)(f"w$k%03d"))
    val dir = java.nio.file.Files
      .createTempDirectory("zipf").toString
    spark.createDataFrame(Seq((1L, words.mkString(" "), "en", "s", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.zipfFit(spark, dir, topK = 50).collect()(0)
    assert(r.getLong(0) == 50L)
    val slope = r.getDouble(1)
    assert(slope < -0.9 && slope > -1.1, s"slope $slope not ~ -1")
    // and on the real corpus: one row, finite values
    val real = TextOps.zipfFit(spark, sf("documents"), 500).collect()
    assert(real.length == 1)
    assert(!real(0).getDouble(1).isNaN && !real(0).getDouble(2).isNaN)
    assert(real(0).getDouble(1) < 0, "frequency must fall with rank")
  }

  test("pmiCollocations matches a brute-force ratio ranking") {
    val topK = 20
    val minCount = 5
    val out = TextOps.pmiCollocations(spark, sf("documents"),
      topK, minCount).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val docs = Tables.documents(spark, sf("documents"))
      .select($"doc_id", $"text").collect()
      .map(r => r.getString(1).split(" ", -1).toSeq)
    val uni = docs.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val n = docs.map(_.length).sum.toLong
    val bi = docs.flatMap(_.sliding(2).filter(_.length == 2))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val expect = bi.toSeq.filter(_._2 >= minCount).map { case (p, c2) =>
      val ratio = (c2.toDouble / uni(p.head).toDouble) *
        (n.toDouble / uni(p(1)).toDouble)
      (p.head, p(1), c2, ratio)
    }.sortBy { case (a, b, _, ratio) => (-ratio, a, b) }.take(topK)
    assert(out.length == expect.length)
    assert(out.map(t => (t._1, t._2, t._3)).toSet ==
      expect.map(t => (t._1, t._2, t._3)).toSet)
    val pmiOf = expect.map { case (a, b, _, r) =>
      (a, b) -> BigDecimal(math.log(r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    out.foreach { case (a, b, _, pmi) =>
      assert(math.abs(pmi - pmiOf((a, b))) < 1e-9, s"pmi ($a,$b)")
    }
  }

  test("tokenCount counts whitespace tokens, robust to multiple spaces") {
    assert(one("a b c", TextOps.tokenCount) == 3)
    assert(one("a  b", TextOps.tokenCount) == 2)
    assert(one("single", TextOps.tokenCount) == 1)
  }

  test("subwordCount splits long words into <=4-char runs + punctuation") {
    // "hello," -> hell + o + , = 3
    assert(one("hello,", TextOps.subwordCount) == 3)
    assert(one("ab cd", TextOps.subwordCount) == 2)
  }

  test("uniqueTokenRatio is 1.0 for all-distinct, lower for repetition") {
    assert(one("a b c d", TextOps.uniqueTokenRatio) == 1.0)
    assert(one("a a a a", TextOps.uniqueTokenRatio) == 0.25)
  }

  test("langId detects en/da/de sentences and falls back to und") {
    val cases = Seq(
      "the cat and the dog of the house" -> "en",
      "det er en god dag og solen skinner" -> "da",
      "der hund und die katze" -> "de",
      "xyzzy plugh foobar" -> "und")
    val out = cases.map(_._1).toDF("text")
      .select($"text", TextOps.langId($"text").as("l")).collect()
    cases.zip(out).foreach { case ((s, want), row) =>
      assert(row.getString(1) == want, s"input: $s")
    }
  }

  test("qualityScore stays in [0,1] over the corpus") {
    val stats = Tables.documents(spark, sf("documents"))
      .select(TextOps.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).collect()(0)
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }

  test("fingerprint is invariant to surrounding/repeated whitespace") {
    val out = Seq("a b c", "  a b c  ", "a  b   c").toDF("text")
      .select(TextOps.fingerprint($"text").as("f")).collect().map(_.getLong(0))
    assert(out.toSet.size == 1)
  }

  test("fingerprint differs for different content") {
    val out = Seq("a b c", "a b d").toDF("text")
      .select(TextOps.fingerprint($"text").as("f")).collect().map(_.getLong(0))
    assert(out(0) != out(1))
  }

  test("chunkDocuments: stride overlap, short tail, short doc (packing)") {
    val toks = (0 until 50).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, toks), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, "doc_id", "text",
      size = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    // doc 1: 50 tokens -> chunks at 0, 24, 48
    assert(out((1L, 0L))._2 == 32 && out((1L, 0L))._1.startsWith("t0 t1 "))
    assert(out((1L, 0L))._1.endsWith(" t31"))
    // overlap: chunk 1 starts at token 24 (8 tokens shared with chunk 0)
    assert(out((1L, 1L))._1.startsWith("t24 "))
    assert(out((1L, 1L))._2 == 26) // tokens 24..49
    assert(out((1L, 2L)) == (("t48 t49", 2L))) // short tail
    // a doc shorter than one chunk yields exactly one short chunk
    assert(out((2L, 0L)) == (("a b", 2L)))
    assert(!out.contains((2L, 1L)))
    // no token span is lost: concatenated distinct coverage == the doc
    val covered = out.collect { case ((1L, _), (txt, _)) =>
      txt.split(" ").toSet }.reduce(_ ++ _)
    assert(covered == (0 until 50).map(i => s"t$i").toSet)
  }

  test("topGramFraction: uniform text low, template spam high") {
    // "a b a b a b" -> grams: "a b","b a","a b","b a","a b" -> top=3/5
    assert(one("a b a b a b", TextOps.topGramFraction) == 0.6)
    // all-distinct grams -> 1/(n-1)
    assert(one("w x y z", TextOps.topGramFraction) == 0.333333)
    // pure repetition -> every gram identical
    assert(one("go go go go go", TextOps.topGramFraction) == 1.0)
  }

  test("repetitionQuery covers every multi-token doc, frac in (0,1]") {
    val docs = Tables.documents(spark, sf("documents"))
    // split semantics, same as the query's own filter (a doc like
    // "foo " has 2 split-tokens but 1 regexp token — the query and the
    // oracle both count the former)
    val n = docs.filter(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")) >= 2).count()
    val out = TextOps.repetitionQuery(spark, sf("documents")).collect()
    assert(out.length == n.toInt)
    out.foreach { r =>
      val f = r.getDouble(1)
      assert(f > 0.0 && f <= 1.0, s"doc ${r.getLong(0)}: $f")
    }
  }

  test("winnowing guarantee: shared w+k-1 token run shares a fingerprint") {
    val k = 3; val w = 4
    // two docs sharing a (w + k - 1) = 6-token run inside different
    // surroundings MUST share at least one selected fingerprint
    val shared = "alpha bravo charlie delta echo foxtrot"
    val docs = Seq(
      (1L, s"one two three $shared nine ten eleven twelve"),
      (2L, s"uno dos $shared tres cuatro cinco seis siete")
    ).toDF("doc_id", "text")
    val sel = graft.ops.TextOps.winnowingSelections(docs, k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val common = sel(1L).map(_._2).toSet intersect sel(2L).map(_._2).toSet
    assert(common.nonEmpty, "no shared fingerprint for a shared 6-run")
    // density: selections are a fraction of grams, never more than
    // the number of full windows
    val out = graft.ops.TextOps.winnowingOf(docs, k, w).collect()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) - (w - 1))
      assert(r.getLong(2) >= 1L)
    }
  }

  test("winnowing pairs finds doc-level near-dups in the real corpus") {
    val d = sf("documents")
    val pairs = graft.ops.TextOps.winnowingNearDupPairs(spark, d)
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 2L)
    }
    // sanity vs the established sketch path: exact-duplicate texts
    // (q31's sha256 groups) must appear among winnowing pairs too
    val texts = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dupPairs = texts.groupBy(_._2).values.filter(_.length > 1)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups share every fingerprint, so all must be found (any
    // dropped stop-fingerprints are dropped for both docs alike)
    val long = texts.filter(_._2.split(" ").length >= 9).map(_._1).toSet
    dupPairs.filter(p => long(p._1) && long(p._2)).foreach { p =>
      assert(found(p), s"exact dup pair $p missing")
    }
  }

  test("winnowing is deterministic and position-shift invariant on ties") {
    // identical text => identical checksum regardless of doc id
    val docs = Seq((10L, "a b c d e f g h i j"),
      (20L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = graft.ops.TextOps.winnowingOf(docs, 3, 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out.size == 1) // both docs produce the same sketch
  }

  test("noveltyScore: lowest doc is fully novel, ratio laws hold") {
    val rows = graft.ops.TextOps.noveltyScore(spark, sf("documents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // first doc by id: every gram's min-doc is itself
    val first = rows.minBy(_._1)
    assert(first._2 == first._3 && first._4 == 1.0)
    rows.foreach { case (id, n, novel, ratio) =>
      assert(n >= novel && novel >= 0, s"doc $id counts")
      assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id ratio")
    }
  }

  test("heapsFit: sane exponent on real text, consistent with novelty") {
    val row = graft.ops.TextOps.heapsFit(spark, sf("documents")).head()
    val (n, beta) = (row.getLong(0), row.getDouble(1))
    assert(n > 0)
    // vocabulary can't grow faster than tokens arrive, nor shrink
    assert(beta > 0.0 && beta <= 1.0, s"beta=$beta out of range")
  }

  test("tokenQuantiles: histogram rank device equals Percentile bit " +
      "for bit") {
    // the value-histogram + interpolated-rank device replaces
    // Percentile's collect-the-group buffer (group-row-sized state in
    // one task at 100 TB); it evaluates the SAME R-7 expression
    // (higher-pos)*lo + (pos-lower)*hi on the same positions, so the
    // doubles must agree exactly, not just within tolerance
    import org.apache.spark.sql.functions._
    val got = graft.ops.TextOps.tokenQuantiles(spark, sf("documents"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val t = graft.ops.TextOps.tokenCount(col("text")).cast("double")
    val exp = graft.Tables.documents(spark, sf(""))
      .groupBy(col("source"))
      .agg(round(percentile(t, lit(0.5)), 6).as("p50"),
        round(percentile(t, lit(0.9)), 6).as("p90"),
        round(percentile(t, lit(0.99)), 6).as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == exp)
  }

  test("charEntropy: zero for runs, ln2 for balanced, order-invariant") {
    val dir = java.nio.file.Files
      .createTempDirectory("entropy_docs").toString
    Seq((1L, "aaaaaa"), (2L, "ababab"), (3L, "bababa"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextOps.charEntropy(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - math.log(2.0)) < 1e-6)
    assert(out(2L) == out(3L)) // same distribution, same fold
  }

  test("corpusCard: headline numbers against brute force") {
    val d = sf("documents")
    val row = TextOps.corpusCard(spark, d).head()
    val docs = graft.Tables.documents(spark, d)
      .select(col("text"),
        TextOps.tokenCount(col("text")).cast("long"),
        round(TextOps.qualityScore(col("text")) * 1e6, 0).cast("long"))
      .collect()
      .map(r => (r.getString(0).trim.replaceAll("\\s+", " "),
        r.getLong(1), r.getLong(2)))
    assert(row.getLong(0) == docs.length.toLong)
    assert(row.getLong(1) == docs.map(_._2).sum)
    val distinct = docs.map(_._1).distinct.length
    assert(row.getLong(2) == distinct.toLong)
    assert(row.getLong(3) == (docs.length - distinct).toLong)
    val meanQ = docs.map(x => BigInt(x._3)).sum.toDouble /
      (docs.length * 1e6)
    assert(math.abs(row.getDouble(4) - meanQ) < 1e-5)
    assert(row.getDouble(4) > 0.0 && row.getDouble(4) <= 1.0)
  }

  test("dupClusterSizes: histogram identities against brute force") {
    val d = sf("documents")
    val rows = TextOps.dupClusterSizes(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.Tables.documents(spark, d)
      .select(col("text")).collect()
      .map(_.getString(0).trim.replaceAll("\\s+", " "))
    val sizes = docs.groupBy(identity).values.map(_.length)
    val exp = sizes.groupBy(identity)
      .map { case (sz, xs) => sz.toLong -> xs.size.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == exp)
    rows.foreach(r => assert(r._3 == r._1 * r._2))
    // Σ size·count = corpus size
    assert(rows.map(_._3).sum == docs.length.toLong)
  }

  test("qualityLengthGrid: cells cover the corpus, marginals are deciles") {
    val d = sf("documents")
    val rows = TextOps.qualityLengthGrid(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.Tables.documents(spark, d).count()
    assert(rows.map(_._3).sum == n)
    // both marginals are equi-depth within 1 (exact decile arithmetic)
    val qMarg = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val lMarg = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    for (m <- Seq(qMarg, lMarg); (_, c) <- m)
      assert(math.abs(c - n / 10.0) <= 1.0, s"marginal depth $c")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9 &&
      r._2 >= 0 && r._2 <= 9))
  }

  test("tokenizerFertility: integer sums match brute force, f >= 1") {
    val d = sf("documents")
    val rows = TextOps.tokenizerFertility(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, d)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.foreach { case (lang, nDocs, words, pieces, f) =>
      val ds = docs.filter(_._1 == lang).map(_._2)
      assert(nDocs == ds.length.toLong)
      val w = ds.map(_.split(" ").count(_.nonEmpty).toLong).sum
      val p = ds.map(
        "[a-zA-Z0-9]{1,4}|[^a-zA-Z0-9 ]".r.findAllIn(_).size.toLong).sum
      assert(words == w && pieces == p, s"$lang sums")
      assert(math.abs(f - p.toDouble / w) < 1e-5)
      assert(f >= 1.0, "a word is at least one piece")
    }
  }

  test("langConflicts: zero on clean data, flags an injected conflict") {
    val d = sf("documents")
    val clean = TextOps.langConflicts(spark, d).head()
    assert(clean.getLong(1) == 0L && clean.getLong(2) == 0L)
    assert(clean.getLong(0) > 0L && clean.getLong(3) == 1L)
    // copy the corpus, add the SAME text under a different lang
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-langconf").toString
    val docs = graft.Tables.documents(spark, d).limit(30)
    val flipped = docs.limit(1)
      .withColumn("lang", concat(col("lang"), lit("_x")))
      .withColumn("doc_id", col("doc_id") + 100000L)
    docs.unionByName(flipped).coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val row = TextOps.langConflicts(spark, tmp).head()
    assert(row.getLong(1) == 1L, "one conflicted hash group")
    assert(row.getLong(2) == 2L, "two docs inside it")
    assert(row.getLong(3) == 2L)
  }

  test("vocabProfile: brute-force vocab/hapax/ttr per source") {
    val d = sf("documents")
    val rows = TextOps.vocabProfile(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val toks = graft.Tables.documents(spark, d)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    rows.foreach { case (src, vocab, tokens, hapax, hf, ttr) =>
      val cnt = toks.filter(_._1 == src).groupBy(_._2).view
        .mapValues(_.size).toMap
      assert(vocab == cnt.size.toLong)
      assert(tokens == cnt.values.map(_.toLong).sum)
      assert(hapax == cnt.values.count(_ == 1).toLong)
      assert(math.abs(hf - hapax.toDouble / vocab) < 1e-5)
      assert(math.abs(ttr - vocab.toDouble / tokens) < 1e-5)
    }
  }

  test("qualityTokenCurve: deciles cover the corpus, brute-force match") {
    val d = sf("documents")
    val rows = TextOps.qualityTokenCurve(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        round(TextOps.qualityScore(col("text")) * 1e6, 0).cast("long"),
        TextOps.tokenCount(col("text")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.length
    // brute-force: sort by (quality desc, doc_id), assign deciles
    val ranked = docs.sortBy(x => (1000000L - x._2, x._1)).zipWithIndex
    val exp = ranked.groupBy { case (_, i) => i.toLong * 10 / n }
      .map { case (dec, xs) =>
        dec -> (xs.length.toLong, xs.map(_._1._3).sum) }
    assert(rows.map(r => r._1 -> (r._2, r._3)).toMap == exp)
    assert(rows.map(_._2).sum == n.toLong)
    var cum = 0L
    rows.sortBy(_._1).foreach { r => cum += r._3; assert(r._4 == cum) }
    // the top decile has at least the quality of the bottom one
    val topQ = ranked.filter(_._2 < n / 10).map(_._1._2).min
    val botQ = ranked.filter(_._2 >= n * 9 / 10).map(_._1._2).max
    assert(topQ >= botQ)
  }

  test("dupRateOverTime: brute-force dup flags per arrival bucket") {
    val d = sf("documents")
    val rows = TextOps.dupRateOverTime(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.replaceAll("\\s+", " ")))
    val firstOf = docs.groupBy(_._2).view
      .mapValues(_.map(_._1).min).toMap
    val exp = docs.groupBy(_._1 / 50).map { case (b, xs) =>
      b -> (xs.length.toLong,
        xs.count(x => firstOf(x._2) != x._1).toLong)
    }
    assert(rows.map(r => r._1 -> (r._2, r._3)).toMap == exp)
    assert(rows.map(_._2).sum == docs.length.toLong)
  }

  test("logOddsTerms: brute-force z for the top term, k per source") {
    val d = sf("documents")
    val rows = TextOps.logOddsTerms(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val toks = graft.Tables.documents(spark, d)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val bySrc = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byTerm = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = toks.length.toDouble
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length.toLong))
      assert(rs.length <= 5)
      rs.foreach { case (_, _, term, cnt, zOut) =>
        val c = toks.count(x => x._1 == src && x._2 == term).toDouble
        assert(cnt.toDouble == c)
        val a = 0.01
        val ct = byTerm(term).toDouble; val ns = bySrc(src).toDouble
        val aw = a * ct; val a0 = a * nn
        val delta = math.log((c + aw) / (ns + a0 - c - aw)) -
          math.log((ct - c + aw) / (nn - ns + a0 - (ct - c) - aw))
        val z = delta / math.sqrt(1.0 / (c + aw) + 1.0 / (ct - c + aw))
        assert(math.abs(zOut - z) < 1e-4, s"$src/$term z")
        assert(z > 0, "top terms are positively distinctive")
      }
    }
  }

  test("langIdEval: confusion identities hold against brute force") {
    val d = sf("documents")
    val rows = TextOps.langIdEval(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val preds = graft.Tables.documents(spark, d)
      .select(col("lang"), TextOps.langId(col("text")).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val classes = (preds.map(_._1) ++ preds.map(_._2)).distinct
    assert(rows.keySet == classes.toSet)
    classes.foreach { c =>
      val tp = preds.count(x => x._1 == c && x._2 == c).toLong
      val fp = preds.count(x => x._1 != c && x._2 == c).toLong
      val fn = preds.count(x => x._1 == c && x._2 != c).toLong
      assert(rows(c) == ((tp, fp, fn)), s"class $c")
    }
    // Σtp + Σfn = corpus size (every labeled doc is tp or fn once)
    assert(rows.values.map(v => v._1 + v._3).sum >= preds.length.toLong)
  }

  test("jsDivergence: brute-force match, bounded by ln 2, self-zero") {
    val d = sf("documents")
    val row = TextOps.jsDivergence(spark, d).head
    val toks = graft.Tables.documents(spark, d)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val ca = toks.filter(_._1 == "src0").groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val cb = toks.filter(_._1 == "src1").groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val vocab = (ca.keySet ++ cb.keySet)
    val (na, nb) = (ca.values.sum, cb.values.sum)
    val jsd = vocab.toSeq.map { t =>
      val p = (ca.getOrElse(t, 0L) + 1).toDouble / (na + vocab.size)
      val q = (cb.getOrElse(t, 0L) + 1).toDouble / (nb + vocab.size)
      val m = (p + q) / 2.0
      0.5 * (p * math.log(p / m) + q * math.log(q / m))
    }.sum
    assert(row.getLong(0) == vocab.size.toLong)
    assert(row.getLong(1) == na && row.getLong(2) == nb)
    assert(math.abs(row.getDouble(3) - jsd) < 1e-4)
    assert(row.getDouble(3) >= 0.0 &&
      row.getDouble(3) <= math.log(2.0) + 1e-9)
    // same source on both sides -> exactly zero divergence
    val self = TextOps.jsDivergence(spark, d, "src0", "src0").head
    assert(self.getDouble(3) == 0.0)
  }

  test("vocabCoverage: brute cumulative coverage at each vocab size") {
    val d = sf("documents")
    val sizes = Seq(100, 300, 1000, 3000)
    val got = TextOps.vocabCoverage(spark, d, sizes).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val toks = graft.Tables.documents(spark, d)
      .select($"text").as[String].collect().flatMap(_.split(" "))
    val cnt = toks.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val ranked = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.map(_._2)
    val total = ranked.sum
    assert(got.keySet == sizes.map(_.toLong).toSet)
    for (n <- sizes) {
      val covered = ranked.take(n).sum
      val (gc, gt, gtypes, gcov) = got(n.toLong)
      assert(gc == covered && gt == total && gtypes == cnt.size.toLong)
      assert(math.abs(gcov - covered.toDouble / total) < 1e-6)
    }
    // the curve is monotone non-decreasing in vocab size
    val cov = sizes.map(n => got(n.toLong)._4)
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
  }

  test("kneserNeyBigrams matches brute KN math; probabilities sane") {
    val d = sf("documents")
    val got = TextOps.kneserNeyBigrams(spark, d, topK = 20).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3))))
    val texts = graft.Tables.documents(spark, d)
      .select($"text").as[String].collect()
    val bigr = texts.flatMap { t =>
      val ws = t.split(" ")
      ws.zip(ws.drop(1))
    }
    val c2 = bigr.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1a = c2.groupBy(_._1._1).map { case (a, m) =>
      a -> m.values.sum }
    val n1fwd = c2.groupBy(_._1._1).map { case (a, m) => a -> m.size.toLong }
    val n1back = c2.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
    val nt = c2.size.toLong
    val expTop = c2.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(20)
    assert(got.map(g => (g._1, g._2._1)).toSeq ==
      expTop.map { case (k, c) => (k, c) })
    for (((a, b), (c, p)) <- got) {
      val brute = math.max(c - 0.75, 0.0) / c1a(a) +
        (0.75 * n1fwd(a) / c1a(a)) * (n1back(b).toDouble / nt)
      assert(math.abs(p - brute) < 1e-5, s"($a,$b)")
      assert(p > 0.0 && p <= 1.0)
    }
    // KN must weight continuation diversity: the smoothed probability
    // never exceeds the raw MLE plus the full discount mass
    for (((a, _), (c, p)) <- got)
      assert(p <= c.toDouble / c1a(a) + 0.75 * n1fwd(a).toDouble / c1a(a))
  }

  test("classifierScoreHistogram partitions the corpus; buckets bounded (q262)") {
    val rows = graft.ops.TextOps.classifierScoreHistogram(spark, sf(""))
      .select($"bucket", $"n_docs", $"n_tokens")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sf(""))
    val nDocs = docs.filter(length(col("text")) > 0).count()
    // every doc with at least one token lands in exactly one bucket
    assert(rows.map(_._2).sum == nDocs)
    // token-mean weights live in [-2^19, 2^19): |bucket| <= ceil(2^19/1e4)
    assert(rows.forall(r => math.abs(r._1) <= 53L))
    assert(rows.map(_._3).sum ==
      docs.agg(sum(graft.ops.TextOps.tokenCount(col("text"))))
        .head().getLong(0))
  }

  test("splitKlDivergence: Gibbs nonneg, totals add up (q263)") {
    val (ntr, nv, v, kl) = graft.ops.TextOps.splitKlDivergence(spark, sf(""))
      .as[(Long, Long, Long, Double)].head()
    // KL(P||Q) >= 0 for the two PROPER (add-1) distributions; the
    // nano-quantization can push an exactly-zero KL to at most a few
    // ulps below, never materially negative
    assert(kl >= -1e-6, s"negative KL: $kl")
    assert(v > 0 && ntr > 0 && nv > 0)
    // token totals equal the raw non-test-split token count
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    val exp = graft.Tables.documents(spark, sf(""))
      .filter(nib =!= "f")
      .agg(sum(graft.ops.TextOps.tokenCount(col("text"))))
      .head().getLong(0)
    assert(ntr + nv == exp)
  }
}
