package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, TextOps}

/** End-to-end training-data curation over the documents corpus — the
  * composition a 100 TB pre-training pipeline runs:
  *
  *   1. exact dedup (sha256 hash-groupBy, first-seen wins)
  *   2. quality gate (length/diversity/stopword score)
  *   3. language annotation (n-gram heuristic)
  *   4. near-dup removal (MinHash-LSH banded pairs; of each surviving
  *      pair the lower doc_id is kept — a one-round approximation of
  *      connected-component dedup that never compares non-candidates)
  *   5. token-budget accounting via observe (no extra pass)
  *
  * Every stage is one shuffle at most; nothing is collected to the
  * driver; the near-dup join is LSH-banded, never all-pairs.
  */
object CorpusCuration {

  final case class Metrics(
      input: Long, afterExact: Long, afterQuality: Long,
      afterNearDup: Long, totalTokens: Long)

  def curate(spark: SparkSession, d: String,
      minQuality: Double = 0.4,
      nearDupThreshold: Double = 0.5): (DataFrame, Metrics) = {
    val input = Tables.documents(spark, d)
    val nInput = input.count()

    // 1. exact dedup
    val exact = Dedup.exactDedupKeepFirst(spark, d)
      .join(input.select(col("doc_id"), col("text")), "doc_id")
    val nExact = exact.count()

    // 2+3. quality gate + language annotation (single projection)
    val scored = exact
      .withColumn("quality", round(TextOps.qualityScore(col("text")), 6))
      .withColumn("detected_lang", TextOps.langId(col("text")))
      .filter(col("quality") >= minQuality)
    val nQuality = scored.count()

    // 4. near-dup removal: drop the higher id of each candidate pair
    val pairs = Dedup.minHashNearDupPairs(
      scored.select(col("doc_id"), col("text")), "text", "doc_id",
      threshold = nearDupThreshold)
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
    // losers scale with the near-dup rate (corpus-proportional) — the
    // anti-join strategy stays with stats/AQE rather than a forced hint
    val curated = scored.join(losers, Seq("doc_id"), "left_anti")

    // 5. token budget, piggybacked on the final count
    val obs = new org.apache.spark.sql.Observation()
    val observed = curated.observe(obs,
      sum(TextOps.tokenCount(col("text")).cast("long")).as("total_tokens"))
    val nFinal = observed.count()
    val totalTokens = obs.get.get("total_tokens").collect {
      case n: Number => n.longValue()
    }.getOrElse(0L)

    (curated.select(col("doc_id"), col("lang"), col("detected_lang"),
      col("quality"), col("n_chars")),
      Metrics(nInput, nExact, nQuality, nFinal, totalTokens))
  }

  /** The pipeline's terminal form: the curated corpus packed into
    * training-ready fixed token windows ([[TextOps.chunkDocuments]]) —
    * what actually feeds a trainer. Survivor ids join back to the raw
    * text (the curation projection deliberately drops the payload),
    * then chunking adds its one bounded shuffle. */
  def curateToChunks(spark: SparkSession, d: String,
      size: Int = 32, stride: Int = 24,
      minQuality: Double = 0.4,
      nearDupThreshold: Double = 0.5): (DataFrame, Metrics) = {
    val (curated, metrics) = curate(spark, d, minQuality, nearDupThreshold)
    val survivors = curated.select(col("doc_id"))
      .join(Tables.documents(spark, d).select(col("doc_id"), col("text")),
        "doc_id")
    (TextOps.chunkDocuments(survivors, "doc_id", "text", size, stride),
      metrics)
  }
}
