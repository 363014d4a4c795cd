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

  test("q131 shape: customer pairs at sf0.001 match the oracle count") {
    val got = Linkage.fuzzyNamePairs(spark, sf(""), maxDist = 2, k = 50)
    // every TPC-H c_name is 'Customer#<9 digits>': within a 2-char
    // block, dist <= 2 pairs abound; the query must return exactly k
    assert(got.count() == 50)
    // canonical orientation holds
    assert(got.filter(col("name_a") >= col("name_b")).count() == 0)
  }
}
