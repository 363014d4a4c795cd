package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque BINARY plus typed metadata, with decode / feature-extract
  * / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, partition-local batched
  * processing (mapPartitions with fixed batch shape), explode-based
  * frame sampling, deterministic outputs. The codec layer is a STUB:
  * this container has no image/audio libraries, so `decodeStub`
  * derives features deterministically from the bytes. A production
  * deployment replaces [[Codecs.decodeStub]] with a real decoder
  * (javax.imageio / ffmpeg bindings) behind the same signature; every
  * operator here is agnostic to that swap.
  */
object Multimodal {

  /** Typed media row: the canonical multimodal table schema. */
  final case class Media(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte], // opaque payload
      format: String, // e.g. png / wav / mp4
      width: Int, height: Int, // images/video
      duration_ms: Long, // audio/video
      fps: Double) // video

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: Long,
      feature: Array[Float]) // fixed 16-dim descriptor

  /** STUB codec layer — deterministic fake in this container. */
  object Codecs {
    val FeatureDim = 16

    /** Stand-in for a real image/audio decode + feature extraction:
      * a seeded, content-derived descriptor. Deterministic so tests
      * and re-runs are stable. */
    def decodeStub(content: Array[Byte]): Array[Float] = {
      var h = 1125899906842597L // FNV-ish fold over the payload
      var i = 0
      while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
      val out = new Array[Float](FeatureDim)
      var s = h
      var j = 0
      while (j < FeatureDim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out(j) = ((s >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }

    def contentHash(content: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
      h
    }
  }

  /** A deterministic synthetic media table derived from the documents
    * corpus (payload = utf-8 of text; kinds round-robin). */
  def syntheticMediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Media(id, kind, text.getBytes("UTF-8"),
          format = kind match {
            case "image" => "png"; case "audio" => "wav"; case _ => "mp4" },
          width = if (kind != "audio") 640 else 0,
          height = if (kind != "audio") 480 else 0,
          duration_ms = if (kind == "image") 0L else 1000L + (id % 10) * 500L,
          fps = if (kind == "video") 25.0 else 0.0)
      }
  }

  /** Batch size for partition-local decode (the batch shape a Pandas
    * UDF / Arrow path would use; kept explicit so the swap-in has the
    * same memory envelope). */
  val DecodeBatchSize = 32

  /** Decode + feature-extract, batched per partition. One pass over
    * the binary column, no shuffle; at cluster scale this is the
    * GPU/codec stage and parallelism = partitions. */
  def decodeFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { m =>
          MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
            Codecs.contentHash(m.content), Codecs.decodeStub(m.content))
        }
      }
    }
  }

  /** Frame sampling for video rows: one row per sampled frame at
    * `everyMs` intervals — pure explode, no UDF, no shuffle. */
  def sampleFrames(media: Dataset[Media], everyMs: Long = 500L): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("duration_ms"), col("fps"),
        explode(sequence(lit(0L), col("duration_ms") - 1,
          lit(everyMs))).as("ts_ms"))
      .withColumn("frame_idx",
        floor(col("ts_ms") / 1000.0 * col("fps")).cast("long"))

  /** Resize metadata transform (the plumbing of an image resize: the
    * payload stays opaque; real deployments rewrite content too). */
  def resizeMeta(media: Dataset[Media], w: Int, h: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map(m => if (m.kind == "audio") m else m.copy(width = w, height = h))
  }

  /** Near-dup over media payloads: reuse the embedding near-dup path
    * on decoded features (LSH-bucketed, never all-pairs). */
  def mediaNearDupCandidates(features: Dataset[MediaFeatures]): DataFrame = {
    import features.sparkSession.implicits._
    // exact-payload candidates via content hash (cheap first pass)
    val byHash = features.toDF()
      .groupBy(col("content_hash"))
      .agg(sort_array(collect_list(col("media_id"))).as("ids"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
    byHash.select(col("content_hash"), col("ids"), col("n"))
  }
}
