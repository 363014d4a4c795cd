package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: the co-located-join primitive for the 100 TB
  * design. Writing both sides of a recurring join bucketed (and
  * sorted) by the join key means every subsequent join is
  * bucket-to-bucket — NO exchange on either side, the single biggest
  * shuffle saving available to a repeated pipeline (SURVEY.md §6:
  * the reference re-joins the inventory listing on every scheduled
  * run; a bucketed inventory makes that join shuffle-free forever).
  */
object Bucketing {

  /** Writes `df` as a parquet-backed bucketed, sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Joins two same-bucketed tables on their bucket key. With equal
    * bucket counts the planner reads matching buckets pairwise and
    * the physical plan contains no shuffle exchange (asserted in
    * BucketingSpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
