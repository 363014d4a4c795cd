package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Sketches, Skew}
import graft.Tables

/** Corpus-curation operators: sampling determinism, normalization,
  * PII masking, contamination, tf-idf, md5 MinHash. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("stratified sample is deterministic and roughly at rate") {
    val s1 = Curation.stratifiedSample(spark, sf("documents"))
      .collect().map(_.getLong(0)).toSet
    val s2 = Curation.stratifiedSample(spark, sf("documents"))
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)                       // reproducible
    val total = Tables.documents(spark, sf("documents")).count()
    assert(s1.nonEmpty && s1.size < total) // a strict, non-empty subset
  }

  test("normalize strips punctuation and collapses whitespace") {
    val out = Seq("  Hello,   World!  (ok) ").toDF("t")
      .select(Curation.normalize($"t")).head().getString(0)
    assert(out == "hello world ok")
  }

  test("redactPii masks emails and phone numbers") {
    val out = Seq("mail a.b+x@test.dk or +45 1234 5678 now").toDF("t")
      .select(Curation.redactPii($"t")).head().getString(0)
    assert(out == "mail [EMAIL] or [PHONE] now")
  }

  test("contamination flags only non-benchmark docs sharing 8-grams") {
    val out = Curation.contamination(spark, sf("documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall(_._1 % 97 != 0))
    assert(out.forall(_._2 > 0))
  }

  test("tfidf top term is one row per doc with positive score for rare terms") {
    val docs = Seq((1L, "apple apple banana"), (2L, "banana cherry"),
      (3L, "apple banana cherry")).toDF("doc_id", "text")
    // inline the same computation over a controlled corpus
    val tf = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    // 'cherry' (df=2) beats 'banana' (df=3) for doc 2
    val dfMap = dfq.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfMap("banana") == 3 && dfMap("cherry") == 2)
    val top = Curation.tfidfTopTerm(spark, sf("documents"))
    val n = Tables.documents(spark, sf("documents")).count()
    assert(top.count() == n)
  }

  test("md5 minhash signatures are equal iff shingle sets are equal") {
    val out = Curation.minhashMd5(spark, sf("documents"))
    // identical texts (exact dups exist in the synthetic corpus) must
    // produce identical signatures
    val withText = Tables.documents(spark, sf("documents"))
      .select($"doc_id", $"text").join(out, "doc_id").collect()
      .map(r => r.getString(1) -> (2 to 9).map(r.getString).mkString("/"))
    withText.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).distinct.size == 1)
    }
  }

  test("saltedJoin is result-identical to the plain join") {
    val fact = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (3L, 7.0))
      .toDF("k", "v")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "grp")
    val salted = Skew.saltedJoin(fact, dim, "k")
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = fact.join(dim, "k")
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("temperatureSample flattens the source distribution toward n^alpha") {
    val kept = graft.ops.Curation.temperatureSample(spark, sf("documents"))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables.documents(spark, sf("documents"))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the rarest source keeps (nearly) everything; bigger sources are
    // down-sampled by sqrt(min/n) so kept ratios shrink with size
    val minN = full.values.min
    full.foreach { case (src, n) =>
      val k = kept.getOrElse(src, 0L).toDouble
      val expected = n * math.sqrt(minN.toDouble / n)
      assert(math.abs(k - expected) <= math.max(6.0, 3 * math.sqrt(expected)),
        s"$src: kept $k, expected ~$expected of $n")
    }
    // determinism: the same rows every run
    val again = graft.ops.Curation.temperatureSample(spark, sf("documents"))
      .collect().map(_.getLong(0)).sorted
    val first = graft.ops.Curation.temperatureSample(spark, sf("documents"))
      .collect().map(_.getLong(0)).sorted
    assert(again.sameElements(first))
  }

  test("budgetFill stops each source at its token budget, overshoot <= 1 doc") {
    val out = Curation.budgetFill(spark, sf("documents"), budgetTokens = 500L)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per source: the last kept doc STARTS under budget; all others fit
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      sorted.init.foreach { r =>
        assert(r.getLong(3) - r.getLong(2) < 500L, s"$src non-final over") }
      assert(sorted.last.getLong(3) - sorted.last.getLong(2) < 500L)
      // cum_tok of the final doc is the first crossing (or the source ran dry)
      val totalSrc = Tables.documents(spark, sf("documents"))
        .filter($"source" === src)
        .select(org.apache.spark.sql.functions.sum(
          graft.ops.TextOps.tokenCount($"text").cast("long")))
        .head().getLong(0)
      assert(sorted.last.getLong(3) >= math.min(500L, totalSrc), s"$src undershoot")
    }
    // determinism
    val again = Curation.budgetFill(spark, sf("documents"), budgetTokens = 500L)
      .collect().map(_.getLong(0)).sorted
    assert(again.sameElements(rows.map(_.getLong(0)).sorted))
  }

  test("packSequences cuts each source stream into full context bins") {
    val out = Curation.packSequences(spark, sf("documents"), contextTokens = 256)
      .collect()
    // every doc's per-bin contributions sum to its token count
    val perDoc = out.groupBy(_.getLong(2))
      .map { case (id, rs) => id -> rs.map(_.getLong(3)).sum }
    val want = Tables.documents(spark, sf("documents"))
      .select($"doc_id", graft.ops.TextOps.tokenCount($"text").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (id, n) => assert(n == want(id), s"doc $id") }
    // per source: bins are contiguous from 0 and all but the last are full
    out.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val bins = rs.groupBy(_.getLong(1))
        .map { case (b, xs) => b -> xs.map(_.getLong(3)).sum }
      val maxBin = bins.keys.max
      assert(bins.keySet == (0L to maxBin).toSet, s"$src bins not contiguous")
      (0L until maxBin).foreach { b =>
        assert(bins(b) == 256L, s"$src bin $b not full: ${bins(b)}") }
      assert(bins(maxBin) <= 256L && bins(maxBin) > 0L, s"$src last bin")
    }
  }

  test("two-level token stream equals the single-window formulation (sf0.01)") {
    // the subsplit decomposition must be EXACT: same cum_before for
    // every document, so every budget cut / bin boundary is identical
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    def layout(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"cum_before")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = layout(Curation.tokenStreamOf(docs))
    val one = layout(Curation.tokenStreamSingleWindow(docs))
    assert(two.size == one.size && two.size > 0)
    one.foreach { case (id, cum) =>
      assert(two(id) == cum, s"doc $id: two-level ${two(id)} != $cum") }
    // and the keep-set of a budget cut through the two-level path is
    // stable across repeated evaluation (retry-stability)
    val a = Curation.budgetFill(spark, "/root/testdata/sf0.01", 500L)
      .collect().map(_.getLong(0)).sorted
    val b = Curation.budgetFill(spark, "/root/testdata/sf0.01", 500L)
      .collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("weightedSample favors heavy documents and is deterministic") {
    val out = Curation.weightedSample(spark, sf("documents"), k = 5).collect()
    val again = Curation.weightedSample(spark, sf("documents"), k = 5).collect()
    assert(out.nonEmpty && out.sameElements(again))
    // per-stratum cap holds
    val perLang = out.groupBy(_.getString(1)).values.map(_.length)
    assert(perLang.forall(_ <= 5))
    // A-ES with w = n_chars: the sampled mean length should sit above
    // the corpus mean (weighting by mass pulls long docs in)
    val sampleMean = out.map(_.getLong(2)).sum.toDouble / out.length
    val corpusMean = Tables.documents(spark, sf("documents"))
      .agg(avg($"n_chars")).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("pipelineFunnel composes gate, dedup and cap consistently") {
    val out = Curation.pipelineFunnel(spark, sf("documents"), cap = 6).collect()
    val again = Curation.pipelineFunnel(spark, sf("documents"), cap = 6).collect()
    assert(out.nonEmpty && out.sameElements(again))
    // every survivor passed the gate and the per-source cap
    assert(out.forall(_.getDouble(3) >= 0.5))
    val per = out.groupBy(_.getString(1)).values.map(_.length)
    assert(per.forall(_ <= 6))
    // funnel counts agree with the funnel itself and are monotone
    val c = Curation.funnelCounts(spark, sf("documents"), cap = 6).collect()(0)
    val (nt, nq, nu, nc) =
      (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    assert(nt >= nq && nq >= nu && nu >= nc)
    assert(nc == out.length)
  }

  test("dupSpans matches an in-memory brute-force mirror") {
    val k = 8
    val out = Curation.dupSpans(spark, sf("documents"), k).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.nonEmpty)
    // brute force over gram STRINGS (the engine keys on 64-bit hashes)
    val texts = Tables.documents(spark, sf("documents"))
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val gramsOf = texts.map { case (id, toks) =>
      id -> toks.sliding(k).filter(_.length == k).map(_.mkString(" "))
        .zipWithIndex.toSeq
    }.toMap
    val crossDoc = gramsOf.toSeq
      .flatMap { case (id, gs) => gs.map(g => (g._1, id)) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2).keySet
    val expected = texts.flatMap { case (id, toks) =>
      val hits = gramsOf(id).filter(g => crossDoc(g._1))
      if (hits.isEmpty) None
      else {
        val covered = hits.flatMap { case (_, p) => p until (p + k) }
          .distinct.length
        Some(id -> ((hits.length.toLong, covered.toLong,
          BigDecimal(covered.toDouble / toks.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble)))
      }
    }.toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (id, (ng, nc, frac)) =>
      val (g2, c2, f2) = out(id)
      assert(g2 == ng && c2 == nc, s"doc $id: ($g2,$c2) vs ($ng,$nc)")
      assert(math.abs(f2 - frac) < 1e-9, s"doc $id frac $f2 vs $frac")
    }
  }

  test("dedupSubstrings drops exactly the tokens dupSpans says it covers") {
    val spans = Curation.dupSpans(spark, sf("documents"), k = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val orig = Tables.documents(spark, sf("documents"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clean = Curation.dedupSubstrings(spark, sf("documents"), k = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean.keySet == orig.keySet, "row count must be stable")
    orig.foreach { case (id, text) =>
      val nOrig = text.split(" ").length
      val nClean = clean(id) match {
        case "" => 0
        case t  => t.split(" ").length
      }
      assert(nOrig - nClean == spans.getOrElse(id, 0L),
        s"doc $id: removed ${nOrig - nClean}, spans say ${spans.getOrElse(id, 0L)}")
      // untouched docs pass through byte-identical
      if (!spans.contains(id)) assert(clean(id) == text)
      // kept tokens appear in original order
      else {
        val it = text.split(" ").iterator
        assert(clean(id).split(" ").filter(_.nonEmpty)
          .forall(tok => it.contains(tok)), s"doc $id order broken")
      }
    }
  }

  test("neymanAllocation sums to the budget and matches brute force") {
    val budget = 1000
    val out = Curation.neymanAllocation(spark, sf("documents"), budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.map(_._4).sum == budget.toLong, "allocs must sum to budget")
    // brute force: w_h = sqrt(n*sx2 - sx^2), Hamilton rounding
    val docs = Tables.documents(spark, sf("documents"))
      .select(col("lang"), col("n_chars")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val strata = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sx2 = xs.map(x => x._2 * x._2).sum
      (l, n, math.sqrt((sx2 * n - sx * sx).toDouble))
    }
    val sw = strata.map(_._3).foldLeft(0.0)(_ + _)
    val shares = strata.map { case (l, n, w) =>
      (l, n, w, budget.toDouble * w / sw)
    }
    val bases = shares.map { case (l, n, w, sh) =>
      (l, n, w, math.floor(sh).toLong, sh - math.floor(sh))
    }
    val leftover = budget - bases.map(_._4).sum
    val bump = bases.sortBy { case (l, _, _, _, rem) => (-rem, l) }
      .take(leftover.toInt).map(_._1).toSet
    val expect = bases.map { case (l, n, w, b, _) =>
      (l, n, b + (if (bump(l)) 1L else 0L))
    }
    assert(out.map(t => (t._1, t._2, t._4)).toSeq == expect)
    // weights agree to round-6
    out.zip(strata).foreach { case ((_, _, wGot, _), (_, _, wExp)) =>
      assert(math.abs(wGot - BigDecimal(wExp).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("unimaxAllocation matches iterative water-filling") {
    val budget = 250000L
    val k = 2
    val out = Curation.unimaxAllocation(spark, sf("documents"), budget, k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    // brute force: repeatedly saturate any language whose cap fits the
    // equal share of what's left, then re-split
    val caps = Tables.documents(spark, sf("documents"))
      .groupBy(col("lang")).agg(sum(col("n_chars")).as("sz")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(1) * k))
    assert(caps.map(_._3).sum >= budget, "test assumes a binding budget")
    var remaining = budget.toDouble
    var left = caps.sortBy(t => (t._3, t._1)).toList
    val alloc = scala.collection.mutable.Map[String, Double]()
    val saturated = scala.collection.mutable.Set[String]()
    var settled = false
    while (left.nonEmpty && !settled) {
      val share = remaining / left.size
      val (sat, rest) = left.partition(_._3 <= share)
      if (sat.isEmpty) {
        left.foreach(t => alloc(t._1) = share)
        settled = true
      } else {
        sat.foreach { t =>
          alloc(t._1) = t._3.toDouble
          saturated += t._1
          remaining -= t._3.toDouble
        }
        left = rest
      }
    }
    assert(math.abs(out.map(_._5).sum - budget.toDouble) < 1e-3,
      "allocations must exhaust a binding budget")
    out.foreach { case (lang, sz, cap, satGot, allocGot, epochsGot) =>
      val capExp = caps.find(_._1 == lang).get._3
      assert(cap == capExp)
      assert(satGot == (if (saturated(lang)) 1L else 0L), s"sat $lang")
      assert(math.abs(allocGot - alloc(lang)) < 1e-5, s"alloc $lang")
      assert(math.abs(epochsGot - alloc(lang) / sz) < 1e-5, s"epochs $lang")
      assert(allocGot <= cap.toDouble + 1e-9, s"cap respected $lang")
    }
  }

  test("dsirWeights matches a brute-force hashed-bigram model") {
    val bk = 256
    val out = Curation.dsirWeights(spark, sf("documents"), bk).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val docs = Tables.documents(spark, sf("documents"))
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = docs.map { case (id, lang, text) =>
      val ts = text.split(" ", -1)
      (id, lang,
        ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toArray)
    }.filter(_._3.nonEmpty).sortBy(_._1)
    def bucket(g: String): Int = (Sketches.md5Hash32(0, g) % bk).toInt
    val allB = grams.flatMap(_._3.map(bucket))
    val tgtB = grams.filter(_._2 == "en").flatMap(_._3.map(bucket))
    val qCnt = allB.groupBy(identity).map { case (b, xs) => b -> xs.length }
    val tCnt = tgtB.groupBy(identity).map { case (b, xs) => b -> xs.length }
    val tT = tgtB.length.toLong
    val qT = allB.length.toLong
    def lrv(b: Int): Double =
      math.log((tCnt.getOrElse(b, 0) + 1).toDouble / (tT + bk)) -
        math.log((qCnt(b) + 1).toDouble / (qT + bk))
    val expect = grams.map { case (id, _, gs) =>
      (id, gs.length.toLong, gs.map(g => lrv(bucket(g))).foldLeft(0.0)(_ + _))
    }
    assert(out.map(t => (t._1, t._2)) == expect.map(t => (t._1, t._2)).toSeq)
    out.zip(expect).foreach { case ((id, _, got), (_, _, exp)) =>
      assert(math.abs(got - exp) < 1e-5, s"logw doc $id")
    }
  }

  test("perplexityBuckets covers every doc, cutoffs from the sample") {
    val out = Curation.perplexityBuckets(spark, sf("documents")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    val nll = graft.ops.TextOps.bigramNll(spark, sf("documents"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // every scored doc lands in exactly one bucket
    assert(out.map(_._3).sum == nll.length.toLong)
    assert(out.map(_._2).toSet.subsetOf(Set("head", "middle", "tail")))
    // brute-force cutoffs from the md5 ~25% sample
    def keep(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      h.substring(0, 2) <= "3f"
    }
    val samp = nll.filter(t => keep(t._1)).sortBy(t => (t._2, t._1))
    val m = samp.length
    val c1 = samp(math.ceil(m / 3.0).toInt - 1)._2
    val c2 = samp(math.ceil((m * 2) / 3.0).toInt - 1)._2
    val expect = nll.map { case (id, v) =>
      val b = if (v <= c1) "head" else if (v <= c2) "middle" else "tail"
      id -> b
    }
    val langOf = Tables.documents(spark, sf("documents"))
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expCounts = expect.groupBy { case (id, b) => (langOf(id), b) }
      .map { case (k, xs) => k -> xs.length.toLong }
    out.foreach { case (lang, bucket, nDocs, mn, mx) =>
      assert(expCounts((lang, bucket)) == nDocs, s"count $lang/$bucket")
      assert(mn <= mx)
    }
    // global cutoffs: every head score <= c1 < every tail score
    val heads = out.filter(_._2 == "head").map(_._5)
    val tails = out.filter(_._2 == "tail").map(_._4)
    if (heads.nonEmpty && tails.nonEmpty)
      assert(heads.max <= tails.min, "head/tail ranges must not overlap")
  }

  test("sourceOverlap matches brute-force pairwise Jaccard") {
    val out = Curation.sourceOverlap(spark, sf("documents")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    val vocab = Tables.documents(spark, sf("documents"))
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.flatMap(_.getString(1).split(" ")).toSet
      }
    out.foreach { case (s1, s2, shared, j) =>
      assert(s1 < s2)
      val (v1, v2) = (vocab(s1), vocab(s2))
      assert(shared == v1.intersect(v2).size.toLong)
      val expect = BigDecimal(
        v1.intersect(v2).size.toDouble / v1.union(v2).size.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(j - expect) < 1e-9, s"$s1/$s2 $j vs $expect")
    }
    // every source pair with any shared term is present
    val srcs = vocab.keys.toSeq.sorted
    val expectPairs = for {
      a <- srcs; b <- srcs if a < b
      if vocab(a).intersect(vocab(b)).nonEmpty
    } yield (a, b)
    assert(out.map(t => (t._1, t._2)).toSet == expectPairs.toSet)
  }

  test("domainCap keeps at most cap docs per source, deterministically") {
    val out = Curation.domainCap(spark, sf("documents"), cap = 7).collect()
    val again = Curation.domainCap(spark, sf("documents"), cap = 7).collect()
    assert(out.nonEmpty && out.sameElements(again))
    val per = out.groupBy(_.getString(1)).values.map(_.length)
    assert(per.forall(_ <= 7))
    // sf sources hold 25 docs each, so the cap must actually bite
    assert(per.exists(_ == 7))
  }

  test("charGrams emits every k-substring at 1-based positions") {
    import spark.implicits._
    val grams = Curation.charGrams(spark, sf("documents"), 5)
      .filter(col("doc_id") === 0L).select($"g").as[String].collect()
    val text = Tables.documents(spark, sf("documents"))
      .filter(col("doc_id") === 0L).select($"text").as[String].head()
    val expect = (0 to text.length - 5).map(i => text.substring(i, i + 5))
    assert(grams.toSeq == expect)
  }

  test("verified near-dup pipelines: jaccard semantics and determinism") {
    graft.ops.Dedup.clearLshCache()
    val out = Curation.minhashVerifiedPairs(spark, sf("documents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    // canonical orientation, threshold respected, jaccard in (0, 1]
    assert(out.forall { case (a, b, j) => a < b && j >= 0.5 && j <= 1.0 })
    // exact verification of the OPH sketch estimate: rebuild each
    // doc's bounded sketch (min h1 per h1 % 128 bucket over the word
    // trigrams, h1 = the 60-bit md5 nibble decode) and recompute
    // matches / occupied-union-buckets driver-side
    val gsets = Curation.tokenTrigramGrams(spark, sf("documents"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val h1s = rows.map(r =>
          graft.ops.Similarity.md5Nibs15("mh|" + r.getString(1))).toSet
        id -> h1s.groupBy(_ % 128L).values.map(_.min).toSet
      }
    out.take(20).foreach { case (a, b, j) =>
      val (ka, kb) = (gsets(a), gsets(b))
      val ni = ka.intersect(kb).size
      val nsb = ka.map(_ % 128L).intersect(kb.map(_ % 128L)).size
      val expect = BigDecimal(
        ni.toDouble / (ka.size + kb.size - nsb).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(j - expect) < 1e-9, s"pair ($a,$b): $j vs $expect")
    }
    // and the sketch estimate tracks TRUE gram-set jaccard: every
    // shipped pair's exact jaccard must clear a loosened band below
    // the 0.5 estimate threshold (the estimator is unbiased, so a
    // 0.5-estimate pair far below ~0.35 true jaccard would indicate a
    // broken sketch, not noise)
    val strSets = Curation.tokenTrigramGrams(spark, sf("documents"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getString(1)).toSet }
    out.foreach { case (a, b, _) =>
      val (ga, gb) = (strSets(a), strSets(b))
      val exact = ga.intersect(gb).size.toDouble / ga.union(gb).size
      assert(exact >= 0.35, s"pair ($a,$b): true jaccard $exact " +
        "far below the 0.5 sketch-estimate threshold")
    }
    // memoized index: a second call returns identical pairs
    val again = Curation.minhashVerifiedPairs(spark, sf("documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
    graft.ops.Dedup.clearLshCache()
  }

  test("identical docs always survive banding and verify at jaccard 1") {
    import spark.implicits._
    graft.ops.Dedup.clearLshCache()
    // two identical docs + one unrelated: identical gram sets yield
    // identical signatures, hence the same bucket in EVERY band — LSH
    // cannot miss them — and exact verification scores 1.0
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "completely different words in this unrelated document here"))
      .toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = docs
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "t")))
      .select(col("doc_id"),
        concat_ws(" ", col("t"), lead(col("t"), 1).over(w),
          lead(col("t"), 2).over(w)).as("g"),
        lead(col("t"), 2).over(w).as("tl"))
      .filter(col("tl").isNotNull)
      .select(col("doc_id"), col("g"))
    val out = Curation.verifiedMd5NearDups(grams, "spec|",
      numHashes = 8, rowsPerBand = 2, threshold = 0.5,
      maxBucketSize = 1000).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L &&
      out(0).getDouble(2) == 1.0)
    graft.ops.Dedup.clearLshCache()
  }

  test("kAnonymity matches a brute-force group census") {
    val d = sf("customer")
    val row = Curation.kAnonymity(spark, d).head()
    val rows = graft.Tables.customer(spark, d)
      .select($"c_nationkey".cast("long"), $"c_mktsegment")
      .as[(Long, String)].collect().toSeq
    val sizes = rows.groupBy(identity).values.map(_.size).toSeq
    assert(row.getLong(0) == sizes.size.toLong)          // n_groups
    assert(row.getLong(1) == sizes.min.toLong)           // k
    val atRisk = sizes.filter(_ < 5).sum
    assert(row.getLong(2) == atRisk.toLong)              // rows_at_risk
    assert(math.abs(row.getDouble(3)
      - atRisk.toDouble / rows.size) < 1e-6)             // risk_share
  }

  test("lDiversity matches a brute-force distinct-sensitive census") {
    val d = sf("customer")
    val row = Curation.lDiversity(spark, d).head()
    val rows = graft.Tables.customer(spark, d)
      .select($"c_nationkey".cast("long"), $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)].collect().toSeq
    val ls = rows.groupBy(r => (r._1, r._2)).values
      .map(_.map(r => math.floor(r._3 / 1000.0).toLong).toSet.size)
      .toSeq
    assert(row.getLong(0) == ls.size.toLong)
    assert(row.getLong(1) == ls.min.toLong)
    assert(row.getLong(2) == ls.count(_ < 3).toLong)
  }

  test("splitManifest: md5-nibble splits partition all docs, ~87/6/6") {
    val d = sf("documents")
    val rows = Curation.splitManifest(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    val total = graft.Tables.documents(spark, d).count()
    assert(rows.values.map(_._1).sum == total)
    // determinism: the same doc lands in the same split on re-run
    val again = Curation.splitManifest(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == again)
    // the train share must dominate (14/16 of the nibble space)
    assert(rows("train")._1 > rows("val")._1 + rows("test")._1)
  }

  test("splitLeakage: censuses every near-dup pair, flags cross-split") {
    val d = sf("documents")
    val rows = Curation.splitLeakage(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    // the census partitions the full pair set — no pair dropped
    val nPairs = graft.ops.TextOps.winnowingNearDupPairs(spark, d).count()
    assert(rows.map(_._3).sum == nPairs)
    // leak is exactly the off-diagonal, splits are canonically ordered
    rows.foreach { case (lo, hi, n, leak) =>
      assert(leak == (lo != hi), s"($lo,$hi) flagged $leak")
      assert(lo <= hi, s"($lo,$hi) not canonical")
      assert(n > 0)
    }
  }

  test("readabilityBands: bands partition the docs, brute per-doc score") {
    val d = sf("documents")
    val got = graft.ops.TextOps.readabilityBands(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = graft.Tables.documents(spark, d)
      .select($"text").as[String].collect().toSeq
    def cnt(t: String, re: String): Int =
      re.r.findAllMatchIn(t).length
    val brute = texts.flatMap { t =>
      val w = cnt(t, "[^ ]+")
      if (w == 0) None
      else {
        val s = math.max(cnt(t, "[.!?]"), 1)
        val sy = math.max(cnt(t, "[aeiouyAEIOUY]+"), 1)
        val score = 206.835 - 1.015 * (w.toDouble / s) -
          84.6 * (sy.toDouble / w)
        Some(math.min(math.max(math.floor(score / 10.0), -30.0), 20.0)
          .toLong)
      }
    }.groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    assert(got == brute)
    assert(got.values.sum == texts.count(t => cnt(t, "[^ ]+") > 0).toLong)
  }

  test("epochWaterfill: budget conservation, caps honored, brute scan") {
    import spark.implicits._
    val d = sf("documents")
    val rows = graft.ops.Curation.epochWaterfill(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val totalN = rows.map(_._2._1).sum
    val totalAlloc = rows.map(_._2._2).sum
    // no source exceeds the epoch cap (tolerate round-up by one)
    rows.foreach { case (src, (n, a, e)) =>
      assert(a <= 4L * n + 1, s"$src over cap")
      assert(math.abs(e - a.toDouble / n) < 1e-5)
    }
    // the budget is conserved within per-source rounding slack
    assert(math.abs(totalAlloc - 2.0 * totalN) <= rows.length.toLong + 1)
    // brute threshold scan reproduces the allocations
    val ns = rows.map { case (src, (n, _, _)) => (src, n) }
      .sortBy { case (src, n) => (n, src) }
    val tw = ns.map { case (_, n) => math.sqrt(n.toDouble) }.sum
    val tnd = ns.map(_._2).sum.toDouble
    var lam = 2.0 * tnd / tw
    var cumN = 0L; var cumW = 0.0; var best = Option.empty[Double]
    for (((src, n), i) <- ns.zipWithIndex) {
      cumN += n; cumW += math.sqrt(n.toDouble)
      if (i < ns.length - 1) { // last row has no uncapped remainder
        val l = (2.0 * tnd - 4.0 * cumN) / (tw - cumW)
        if (l * math.sqrt(n.toDouble) >= 4.0 * n) best = Some(l)
      }
    }
    lam = best.getOrElse(lam)
    for ((src, (n, a, _)) <- rows) {
      val exp = math.min(lam * math.sqrt(n.toDouble), 4.0 * n)
      assert(math.abs(a - exp) <= 1.0, s"$src alloc $a vs $exp")
    }
  }

  test("prioritySample: brute ES-key replication; weight bias holds") {
    import spark.implicits._
    val d = sf("orders")
    val got = graft.ops.Curation.prioritySample(spark, d, k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (1L to 30L))
    val orders = graft.Tables.orders(spark, d)
      .select($"o_orderkey",
        expr("CAST(round(o_totalprice * 100) AS LONG)").as("w"))
      .as[(Long, Long)].collect().filter(_._2 > 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def keyQ(id: Long, w: Long): Long = {
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val n = java.lang.Long.parseLong(h.substring(0, 8), 16)
      val u = (n.toDouble / 4294967296.0 * 4294967296.0 + 1.0) /
        4294967297.0
      BigDecimal(math.log(u) / w.toDouble * 1e18)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val brute = orders.map { case (id, w) => (keyQ(id, w), id, w) }
      .sortBy { case (kq, id, _) => (-kq, id) }.take(30)
      .zipWithIndex.map { case ((_, id, w), i) => (i + 1L, id, w) }
    assert(got.toSeq == brute.toSeq)
    // weight-proportional sampling must favor heavy orders: the
    // sample's mean weight sits clearly above the population mean
    val popMean = orders.map(_._2).sum.toDouble / orders.length
    val sampMean = got.map(_._3).sum.toDouble / got.length
    assert(sampMean > popMean)
  }

  test("containmentClusters: brute union-find over brute pairs") {
    import spark.implicits._
    val d = sf("documents")
    val got = graft.ops.Curation.containmentClusters(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute pairs at thr 0.5 (same recipe as the containment spec)
    val docs = graft.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val gramSets = docs.map { case (id, t) =>
      id -> t.split(" ").sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSet
    }.toMap
    val dfc = gramSets.toSeq.flatMap { case (id, g) => g.map(_ -> id) }
      .groupBy(_._1).map { case (g, v) => g -> v.size }
    val kept = gramSets.map { case (id, g) =>
      id -> g.filter(dfc(_) <= 100) }
    val pairs = for {
      (a, ga) <- kept.toSeq; (b, gb) <- kept.toSeq
      if a < b
      shared = (ga & gb).size
      if shared >= 3
      c = BigDecimal(shared.toDouble / math.min(ga.size, gb.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.5
    } yield (a, b)
    // union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val exp = members.groupBy(find).map(_._2.size.toLong)
      .groupBy(identity).map { case (sz, v) => sz -> v.size.toLong }
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("simhashCalibration: brute md5 simhash + pair recount") {
    import spark.implicits._
    val d = sf("documents")
    val got = graft.ops.Curation.simhashCalibration(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    // brute 60-bit md5 simhash per doc
    val docs = graft.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def sim60(text: String): Long = {
      val votes = new Array[Long](60)
      text.split(" ").foreach { t =>
        val h = md.digest(t.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        for (j <- 0 until 60) {
          val c = h(j / 4)
          val nib = if (c <= '9') c - '0' else c - 'a' + 10
          votes(j) += (if (((nib >> (j % 4)) & 1) == 1) 1L else -1L)
        }
      }
      (0 until 60).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    val sig = docs.map { case (id, t) => id -> sim60(t) }.toMap
    val pairs = graft.ops.Curation.charJaccardVerifiedPairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = pairs.map { case (a, b, j) =>
      (math.floor(j * 10.0 + 1e-9).toLong,
        java.lang.Long.bitCount(sig(a) ^ sig(b)).toLong)
    }.groupBy(_._1).map { case (dec, v) =>
      val hs = v.map(_._2)
      dec -> (hs.length.toLong,
        BigDecimal(hs.sum.toDouble / hs.length).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble, hs.min, hs.max)
    }
    assert(got == exp)
    // calibration sanity: exact-dup bucket (if present) sits at the
    // lowest mean Hamming
    val means = got.toSeq.sortBy(_._1).map(_._2._2)
    assert(means.last <= means.head + 1e-9 || means.size == 1)
  }

  test("dedupRoiCurve: brute from the verified pair table, monotone") {
    import spark.implicits._
    val d = sf("documents")
    val got = graft.ops.Curation.dedupRoiCurve(spark, d).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq(0.7, 0.8, 0.9))
    val pairs = graft.ops.Curation.charJaccardVerifiedPairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val chars = graft.Tables.documents(spark, d)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    val total = chars.values.sum
    for ((t, (np, nd, cr, fr)) <- got) {
      val fired = pairs.filter(_._3 >= t)
      assert(np == fired.length.toLong, s"pairs at $t")
      val removed = fired.map(_._2).distinct
      assert(nd == removed.length.toLong, s"docs at $t")
      assert(cr == removed.map(chars).sum, s"chars at $t")
      assert(math.abs(fr - cr.toDouble / total) < 1e-6)
    }
    // tightening the threshold can only remove less
    val byT = got.sortBy(_._1).map(_._2._3)
    assert(byT.zip(byT.tail).forall { case (a, b) => a >= b })
  }

  test("containmentPairs matches brute gram-set containment") {
    import spark.implicits._
    val d = sf("documents")
    val got = graft.ops.Curation.containmentPairs(spark, d, topK = 10000)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val docs = graft.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val k = 8
    val gramSets = docs.map { case (id, t) =>
      id -> t.split(" ").sliding(k).filter(_.length == k)
        .map(_.mkString(" ")).toSet
    }.toMap
    // stop-gram cap: drop grams in > 100 docs, like the operator
    val dfc = gramSets.toSeq.flatMap { case (id, g) => g.map(_ -> id) }
      .groupBy(_._1).map { case (g, v) => g -> v.size }
    val kept = gramSets.map { case (id, g) =>
      id -> g.filter(dfc(_) <= 100) }
    val exp = (for {
      (a, ga) <- kept.toSeq; (b, gb) <- kept.toSeq
      if a < b
      shared = (ga & gb).size
      if shared >= 3
    } yield ((a, b), (shared.toLong,
      BigDecimal(shared.toDouble / math.min(ga.size, gb.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    assert(got == exp)
    assert(got.nonEmpty)
  }
}
