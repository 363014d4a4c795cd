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

  /** Clustered compaction: like [[compact]], but range-partitions on
    * the cluster keys and sorts inside each output file. Parquet
    * row-group min/max statistics then carry disjoint key ranges per
    * file, so a filter on the cluster keys prunes whole files/row
    * groups at scan time — the layout that turns a 100 TB
    * time/tenant-filtered scan into a touch of a few files. Returns
    * the output partition count. */
  def compactClustered(spark: SparkSession, inDir: String, outDir: String,
      clusterCols: Seq[String], targetFileMB: Int = 128): Int = {
    require(clusterCols.nonEmpty, "clustered compaction needs keys")
    val df = spark.read.parquet(inDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val parts = math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(parts, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(outDir)
    parts
  }
}
