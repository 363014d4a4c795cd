package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity-resolution primitives: blocked fuzzy matching — the classic
  * record-linkage shape (block on a cheap key so the quadratic edit-
  * distance comparison runs only inside small buckets, never across the
  * corpus). The same cap-the-quadratic discipline as every banded join
  * in Dedup/Similarity, applied to string identity instead of content.
  * (Reference analog: matching scraped committee names across
  * municipalities that spell them differently.)
  */
object Linkage {

  /** Near-identical customer-name pairs: block on the name's last two
    * characters, compare within blocks with Levenshtein <= `maxDist`,
    * canonical a < b orientation. Both engines define levenshtein as
    * plain unit-cost edit distance, so the pair set hash-matches.
    * Scale: the block join shuffles only (block, name) pairs; the edit
    * distance — the expensive part — runs on the block-bounded
    * candidates. At 100 TB you would widen the block key (e.g. 3-4
    * trailing chars or a phonetic key) to keep buckets bounded, the
    * same knob as the LSH band caps. */
  def fuzzyNamePairs(s: SparkSession, d: String,
      maxDist: Int = 2, k: Int = 50): DataFrame = {
    val names = Tables.customer(s, d)
      .select(col("c_name").as("name"),
        substring(col("c_name"), -2, 2).as("blk"))
    val a = names.select(col("blk"), col("name").as("name_a"))
    val b = names.select(col("blk"), col("name").as("name_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      // thresholded levenshtein: the banded DP early-exits once the
      // distance provably exceeds maxDist (returns -1), so each
      // comparison is O(len x maxDist) instead of O(len^2)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
      .orderBy(col("name_a"), col("name_b"))
      .limit(k)
  }

  /** DuckDB oracle for [[fuzzyNamePairs]]. */
  def fuzzyNamePairsSql(maxDist: Int = 2, k: Int = 50): String =
    s"""WITH n AS (SELECT c_name AS name,
       |             substr(c_name, len(c_name) - 1, 2) AS blk
       |           FROM customer)
       |SELECT a.name AS name_a, b.name AS name_b,
       |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
       |FROM n a JOIN n b ON a.blk = b.blk AND a.name < b.name
       |WHERE levenshtein(a.name, b.name) <= $maxDist
       |ORDER BY name_a, name_b LIMIT $k""".stripMargin
}
