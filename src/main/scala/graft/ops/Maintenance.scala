package graft.ops

import org.apache.spark.sql.SparkSession

/** Table-maintenance operators a long-running 100 TB pipeline needs:
  * the scheduled crawl appends small files every run (one per task per
  * run), and scan efficiency decays until someone rewrites the layout.
  */
object Maintenance {

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileMB`-sized files. Sizing comes from the actual input
    * bytes, not a row-count guess; the rewrite is a repartition (round
    * robin — even output sizes) plus an overwrite. Returns the output
    * partition count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileMB: Int = 128): Int = {
    val df = spark.read.parquet(inDir)
    // size through the Hadoop FileSystem API so hdfs:// and s3a:// (the
    // actual 100 TB deployment) report real lengths — java.io.File
    // returns 0 for non-file schemes, collapsing the rewrite to 1 part
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val parts = math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    df.repartition(parts).write.mode("overwrite").parquet(outDir)
    parts
  }
}
