package graft

import graft.multimodal.Multimodal

/** Tests for the multimodal plumbing (schema, batched decode stub,
  * frame sampling, dedup candidates). */
class MultimodalSpec extends SparkTestBase {

  private def media = Multimodal.syntheticMediaTable(spark, sf("documents"))

  test("synthetic media table has all three kinds with typed metadata") {
    val kinds = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    val audio = media.filter(_.kind == "audio").head()
    assert(audio.width == 0 && audio.duration_ms > 0)
    val video = media.filter(_.kind == "video").head()
    assert(video.fps == 25.0 && video.width == 640)
  }

  test("decodeFeatures is deterministic and fixed-dimension") {
    val f1 = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == Multimodal.Codecs.FeatureDim))
  }

  test("decodeFeatures survives repartitioning (batch shape is local)") {
    val a = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f.content_hash).toMap
    val b = Multimodal.decodeFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> f.content_hash).toMap
    assert(a == b)
  }

  test("sampleFrames emits one row per interval with frame indices") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500L)
    val one = frames.filter(frames("media_id") === 2L).collect()
    // media_id=2 is video with duration 1000+2%10*500 = 2000ms -> ts 0,500,1000,1500
    assert(one.length == 4)
    assert(one.map(_.getAs[Long]("ts_ms")).sorted.sameElements(
      Array(0L, 500L, 1000L, 1500L)))
    // frame_idx = floor(ts/1000*25)
    assert(one.map(r => r.getAs[Long]("ts_ms") -> r.getAs[Long]("frame_idx"))
      .toMap == Map(0L -> 0L, 500L -> 12L, 1000L -> 25L, 1500L -> 37L))
  }

  test("resizeMeta rewrites dimensions for visual kinds only") {
    val resized = Multimodal.resizeMeta(media, 224, 224).collect()
    assert(resized.filter(_.kind != "audio").forall(m =>
      m.width == 224 && m.height == 224))
    assert(resized.filter(_.kind == "audio").forall(_.width == 0))
  }

  test("mediaNearDupCandidates groups identical payloads") {
    import spark.implicits._
    val dup = media.limit(2).collect()
    val withDup = media.union(
      spark.createDataset(Seq(dup(0).copy(media_id = 100000L))))
    val cands = Multimodal.mediaNearDupCandidates(
      Multimodal.decodeFeatures(withDup)).collect()
    assert(cands.exists(r =>
      r.getAs[Seq[Long]]("ids").contains(100000L)))
  }
}
