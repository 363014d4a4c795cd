package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

/** Tests for blocked fuzzy matching: pair semantics, canonical
  * orientation, and the block cap that keeps a hot block from going
  * quadratic. */
class LinkageSpec extends SparkTestBase {

  private def namesDf(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("blk", "name")
  }

  test("fuzzyPairs finds close names within a block, a < b oriented") {
    val df = namesDf(Seq(
      ("ab", "teknikudvalg"), ("ab", "teknikudvalgt"), // dist 1
      ("ab", "kulturnaevn"), // dist > 2 from both
      ("cd", "teknikudvalg2"))) // close, but in another block
    val got = Linkage.fuzzyPairs(df, maxDist = 2, k = 10,
      maxBucketSize = 100).collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "teknikudvalg" &&
      got(0).getString(1) == "teknikudvalgt" && got(0).getLong(2) == 1L)
  }

  test("a degenerate block larger than the cap is dropped whole") {
    // hot block "zz": 12 near-identical names -> 66 candidate pairs if
    // uncapped; cap 8 must drop the whole block, keep the small one
    val hot = (0 until 12).map(i => ("zz", s"hotname$i"))
    val cold = Seq(("aa", "coldname1"), ("aa", "coldname2"))
    val got = Linkage.fuzzyPairs(namesDf(hot ++ cold), maxDist = 2,
      k = 1000, maxBucketSize = 8).collect()
    assert(got.forall(r => r.getString(0).startsWith("cold")))
    assert(got.length == 1) // coldname1/coldname2, dist 1
  }

  test("block cap at the boundary keeps a block of exactly cap size") {
    val block = (0 until 5).map(i => ("bb", s"name$i"))
    val got = Linkage.fuzzyPairs(namesDf(block), maxDist = 2, k = 1000,
      maxBucketSize = 5).collect()
    assert(got.length == 10) // C(5,2), all within dist 1 of each other
  }

  test("widened block key recovers pairs a saturated 2-char key drops") {
    // Digit-suffixed corpus where every 2-char block holds 21 names —
    // past the cap of 8, so 2-char blocking drops EVERYTHING (the
    // pre-r12 q131 failure mode at large SF). The same names under a
    // 3-char key sit in blocks of 2-3 and the dist-1 pairs (names
    // differing only in the thousands digit) come back.
    import spark.implicits._
    val names = (0 until 2100).map(i => f"N$i%05d").toDF("name")
    def blocked(w: Int) =
      names.select(substring(col("name"), -w, w).as("blk"), col("name"))
    val narrow = Linkage.fuzzyPairs(blocked(2), maxDist = 2, k = 10000,
      maxBucketSize = 8).count()
    assert(narrow == 0, "2-char blocks must saturate the cap and drop all")
    val wide = Linkage.fuzzyPairs(blocked(3), maxDist = 2, k = 10000,
      maxBucketSize = 8).collect()
    assert(wide.nonEmpty)
    // a known recovered pair: N00042 / N01042 differ in one digit
    assert(wide.exists(r => r.getString(0) == "N00042" &&
      r.getString(1) == "N01042" && r.getLong(2) == 1L))
  }

  test("q131 shape: customer pairs at sf0.01 match the oracle count") {
    // sf0.01, not sf0.001: with the r12 default 3-char key the 150
    // customers of sf0.001 land in singleton blocks (ids 1..150 have
    // unique last-3 digits) — the gate's own SF, 1500 names, pairs
    // ids r and r+1000 inside each shared-suffix block
    val got = Linkage.fuzzyNamePairs(spark, "/root/testdata/sf0.01",
      maxDist = 2, k = 50)
    assert(got.count() == 50)
    // canonical orientation holds
    assert(got.filter(col("name_a") >= col("name_b")).count() == 0)
  }
}
