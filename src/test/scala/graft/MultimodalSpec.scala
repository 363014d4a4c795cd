package graft

import graft.doc.ImageCodec
import graft.multimodal.Multimodal

/** Tests for the multimodal plumbing (schema, real image decode,
  * batched audio/video stub, frame sampling, dedup candidates). */
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

  test("image rows decode through the real PNG codec with true geometry") {
    val edge = Multimodal.SyntheticImageEdge
    val imgs = Multimodal.decodeFeatures(media)
      .filter(_.kind == "image").collect()
    assert(imgs.nonEmpty)
    // every synthetic image row is a real PNG: decoded, 16x16 RGB
    assert(imgs.forall(f => f.decoded && f.img_width == edge &&
      f.img_height == edge && f.channels == 3))
    // descriptor head encodes the decoded geometry, not metadata
    assert(imgs.forall(f => f.feature(0) == edge / 65535.0f &&
      f.feature(2) == 3 / 4.0f))
    // pixel stats are real: histogram bins are fractions summing to ~1
    assert(imgs.forall { f =>
      val s = (8 until 16).map(f.feature(_)).sum
      math.abs(s - 1.0f) < 1e-3
    })
    // video decodes its real AVI header too (r12)
    val vids = Multimodal.decodeFeatures(media)
      .filter(_.kind == "video").collect()
    assert(vids.forall(f => f.decoded && f.img_width == 640 &&
      f.img_height == 480))
  }

  test("video rows decode real AVI headers with true geometry/timing") {
    val vids = Multimodal.decodeFeatures(media)
      .filter(_.kind == "video").collect()
    assert(vids.nonEmpty)
    val declared = media.filter(_.kind == "video").collect()
      .map(m => m.media_id -> m.duration_ms).toMap
    // durations round-trip through the WHOLE-FRAME count at 25 fps:
    // a 1500 ms clip is 37 frames = 1480 ms — within one 40 ms frame
    assert(vids.forall(f =>
      declared(f.media_id) - f.duration_ms >= 0 &&
        declared(f.media_id) - f.duration_ms < 40))
    // descriptor head encodes the decoded header, not metadata
    assert(vids.forall(f => f.feature(0) == 640 / 65535.0f &&
      f.feature(2) == 25.0f / 120.0f))
  }

  test("AVI header codec: round-trip, junk-chunk walk, rejects") {
    import graft.doc.VideoCodec
    val avi = VideoCodec.encodeAviHeader(1920, 1080, 30.0, 900L,
      "opaque-frames".getBytes)
    val m = VideoCodec.decode(avi).get
    assert(m.width == 1920 && m.height == 1080 && m.nFrames == 900L)
    assert(math.abs(m.fps - 30.0) < 0.01)
    assert(m.durationMs == 900L * 33333L / 1000L)
    // garbage / WAV payloads reject cleanly (RIFF but not AVI)
    assert(VideoCodec.decode("not a video".getBytes).isEmpty)
    assert(VideoCodec.decode(
      graft.doc.AudioCodec.encodePcm16(8000, 1, new Array[Short](8)))
      .isEmpty)
    // corrupt video payload degrades to the stub in decodeFeatures
    import spark.implicits._
    val one = spark.createDataset(Seq(Multimodal.Media(
      4L, "video", "junk".getBytes, "avi", 0, 0, 0L, 0.0)))
    val f = Multimodal.decodeFeatures(one).head()
    assert(!f.decoded && f.img_width == 0)
  }

  test("audio rows decode through the real WAV codec with true timing") {
    val auds = Multimodal.decodeFeatures(media)
      .filter(_.kind == "audio").collect()
    assert(auds.nonEmpty)
    // every synthetic audio row is a real mono PCM16 WAV at the
    // synthetic rate, with the decoded duration matching the row's
    // declared one (the payload was generated to it)
    assert(auds.forall(f => f.decoded && f.channels == 1 &&
      f.sample_rate == Multimodal.SyntheticAudioRate))
    val declared = media.filter(_.kind == "audio").collect()
      .map(m => m.media_id -> m.duration_ms).toMap
    assert(auds.forall(f => f.duration_ms == declared(f.media_id)))
    // full-scale uniform noise: RMS ~ 1/sqrt(3) ~ 0.577, histogram
    // fractions sum to ~1, zero-crossing rate ~ 0.5
    assert(auds.forall(f => f.feature(4) > 0.5f && f.feature(4) < 0.65f))
    assert(auds.forall { f =>
      math.abs((8 until 16).map(f.feature(_)).sum - 1.0f) < 1e-3 })
    assert(auds.forall(f => f.feature(6) > 0.4f && f.feature(6) < 0.6f))
  }

  test("WAV decode: hand-built fixture round-trips rate/duration/RMS") {
    import graft.doc.AudioCodec
    // 1 s of 8 kHz mono square wave at half amplitude: RMS exactly 0.5
    val pcm = Array.tabulate[Short](8000)(i =>
      if ((i / 4) % 2 == 0) 16384 else -16384)
    val wav = AudioCodec.encodePcm16(8000, 1, pcm)
    val a = AudioCodec.decode(wav).get
    assert(a.sampleRate == 8000 && a.channels == 1 &&
      a.bitsPerSample == 16 && a.nFrames == 8000L &&
      a.durationMs == 1000L)
    val d = Multimodal.Codecs.decodeAudio(wav).get
    assert(d.sampleRate == 8000 && d.durationMs == 1000L)
    assert(math.abs(d.feature(4) - 0.5f) < 1e-4) // RMS
    assert(math.abs(d.feature(5) - 0.5f) < 1e-4) // mean |x|
    assert(math.abs(d.feature(7) - 0.5f) < 1e-4) // peak
  }

  test("WAV decode: chunk walk skips junk chunks; rejects garbage") {
    import graft.doc.AudioCodec
    val pcm = Array.tabulate[Short](100)(i => (i * 300).toShort)
    val plain = AudioCodec.encodePcm16(4000, 2, pcm) // stereo
    // splice a LIST chunk between fmt and data, as real encoders do
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = plain.take(36) ++ junk ++ plain.drop(36)
    // fix the RIFF size field (not that the decoder trusts it)
    val a = AudioCodec.decode(spliced).get
    assert(a.sampleRate == 4000 && a.channels == 2 && a.nFrames == 50L)
    assert(AudioCodec.decode(plain).get.samples.toSeq == a.samples.toSeq)
    // garbage and truncation reject cleanly
    assert(AudioCodec.decode("not audio".getBytes).isEmpty)
    assert(AudioCodec.decode(plain.take(30)).isEmpty)
    // a corrupt audio payload degrades to the stub in decodeFeatures
    import spark.implicits._
    val one = spark.createDataset(Seq(Multimodal.Media(
      3L, "audio", "junk!".getBytes, "wav", 0, 0, 0L, 0.0)))
    val f = Multimodal.decodeFeatures(one).head()
    assert(!f.decoded && f.sample_rate == 0)
  }

  test("JPEG payloads decode geometry from the SOF header") {
    import spark.implicits._
    // minimal baseline JPEG: SOI + SOF0 with dims + EOI (3 components)
    val w = 40; val h = 30
    val jpg = (Array(0xFF, 0xD8,
      0xFF, 0xC0, 0x00, 0x11, 0x08,
      (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF, 0x03,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1,
      0xFF, 0xD9)).map(_.toByte)
    val one = spark.createDataset(Seq(Multimodal.Media(
      1L, "image", jpg, "jpg", 0, 0, 0L, 0.0)))
    val f = Multimodal.decodeFeatures(one).head()
    assert(f.decoded && f.img_width == w && f.img_height == h &&
      f.channels == 3)
  }

  test("a corrupt image payload degrades to the stub, decoded=false") {
    import spark.implicits._
    val junk = "not an image at all".getBytes("UTF-8")
    val one = spark.createDataset(Seq(Multimodal.Media(
      2L, "image", junk, "png", 0, 0, 0L, 0.0)))
    val f = Multimodal.decodeFeatures(one).head()
    assert(!f.decoded && f.img_width == 0 && f.channels == 0)
    assert(f.feature.length == Multimodal.Codecs.FeatureDim)
  }

  test("decodeImage pixel stats match a hand-computed PNG") {
    // 2x1 RGB: pixels (0,0,0) and (255,255,255) -> mean 127.5, zeros 1/2
    val rgb = Array[Byte](0, 0, 0, -1, -1, -1)
    val png = ImageCodec.encodePngRgb(2, 1, rgb)
    val d = Multimodal.Codecs.decodeImage(png).get
    assert(d.width == 2 && d.height == 1 && d.channels == 3)
    assert(math.abs(d.feature(5) - 0.5f) < 1e-3) // mean 127.5/255
    assert(math.abs(d.feature(7) - 0.5f) < 1e-6) // half the bytes zero
    assert(d.feature(8) == 0.5f && d.feature(15) == 0.5f) // hist ends
  }

  test("aHash64: deterministic, brightness-robust, structure-sensitive") {
    val edge = 16
    def gradient(tweak: Int): Array[Byte] = {
      val rgb = new Array[Byte](edge * edge * 3)
      for (y <- 0 until edge; x <- 0 until edge; c <- 0 until 3) {
        val v = math.min(255, x * 16 + tweak)
        rgb((y * edge + x) * 3 + c) = v.toByte
      }
      rgb
    }
    val a = ImageCodec.encodePngRgb(edge, edge, gradient(0))
    val b = ImageCodec.encodePngRgb(edge, edge, gradient(3)) // brighter
    val inv = ImageCodec.encodePngRgb(edge, edge,
      gradient(0).map(v => (255 - (v & 0xff)).toByte))
    val (ha, hb, hi) = (Multimodal.Codecs.aHash64(a).get,
      Multimodal.Codecs.aHash64(b).get, Multimodal.Codecs.aHash64(inv).get)
    assert(Multimodal.Codecs.aHash64(a).get == ha) // deterministic
    assert(java.lang.Long.bitCount(ha ^ hb) <= 3,
      "uniform brightness shift must barely move the hash")
    assert(java.lang.Long.bitCount(ha ^ hi) >= 32,
      "inverting the gradient must flip ~all blocks")
  }

  test("imageAHashPairs finds the near pair, not the inverted one") {
    import spark.implicits._
    val edge = 16
    def gradient(tweak: Int): Array[Byte] = {
      val rgb = new Array[Byte](edge * edge * 3)
      for (y <- 0 until edge; x <- 0 until edge; c <- 0 until 3) {
        val v = math.min(255, x * 16 + tweak)
        rgb((y * edge + x) * 3 + c) = v.toByte
      }
      rgb
    }
    def m(id: Long, rgb: Array[Byte]) = Multimodal.Media(id, "image",
      ImageCodec.encodePngRgb(edge, edge, rgb), "png", edge, edge, 0L, 0.0)
    val ds = spark.createDataset(Seq(
      m(1L, gradient(0)), m(2L, gradient(3)),
      m(3L, gradient(0).map(v => (255 - (v & 0xff)).toByte))))
    val pairs = Multimodal.imageAHashPairs(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), "near-identical gradients pair up")
    assert(pairs((1L, 2L)) <= 3L)
    assert(!pairs.contains((1L, 3L)), "inverted image is not a near-dup")
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

  /** Shared minimal marker-stream JPEG (23 bytes — ODD length, so
    * wrapping it as a movi chunk also exercises RIFF even-padding). */
  private def miniJpg(w: Int, h: Int): Array[Byte] =
    graft.doc.ImageCodec.encodeMarkerJpeg(w, h)

  test("extractFrames slices standalone JPEG frames out of an MJPEG " +
      "AVI with per-frame geometry and container timing") {
    import spark.implicits._
    val jpgs = Seq(miniJpg(64, 48), miniJpg(64, 48), miniJpg(32, 24))
    val avi = graft.doc.VideoCodec.encodeMjpegAvi(64, 48, 25.0, jpgs)
    val one = spark.createDataset(Seq(Multimodal.Media(
      7L, "video", avi, "avi", 64, 48, 120L, 25.0)))
    val frames = Multimodal.extractFrames(one)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 3)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    // 25 fps -> 40000 us/frame -> 0, 40, 80 ms
    assert(frames.map(_.t_ms).toSeq == Seq(0L, 40L, 80L))
    assert(frames.map(f => (f.frame_w, f.frame_h)).toSeq ==
      Seq((64, 48), (64, 48), (32, 24)))
    // the payload is the ORIGINAL standalone JPEG, bit-exact —
    // even-padding bytes must not leak into the slice
    frames.zip(jpgs).foreach { case (f, j) =>
      assert(f.frame.toSeq == j.toSeq && f.n_bytes == j.length)
    }
    // the round-trip also survives the container-header decode path
    val meta = graft.doc.VideoCodec.decode(avi).get
    assert(meta.nFrames == 3 && meta.width == 64)
  }

  test("extractFrames runs on the synthetic corpus: MJPEG rows " +
      "explode into their header frame count") {
    import spark.implicits._
    val mjpeg = media.filter(m => m.kind == "video" && m.media_id % 6 == 2)
    val expected = mjpeg.collect()
      .map(m => m.media_id -> m.duration_ms * 25L / 1000L).toMap
    assert(expected.nonEmpty)
    val got = Multimodal.extractFrames(mjpeg).groupByKey(_.media_id)
      .count().collect().toMap
    assert(got == expected)
  }

  test("extractFrames emits nothing for header-only, foreign or " +
      "hostile containers") {
    import spark.implicits._
    // the synthetic table's OTHER video rows carry TEXT movi payloads
    // (no frame chunks): metadata stays real, frames stay empty
    val noFrames = Multimodal.extractFrames(
      media.filter(m => m.kind == "video" && m.media_id % 6 != 2).limit(3))
    assert(noFrames.count() == 0)
    // hostile/truncated payloads: no crash, no rows
    val junk = Seq(
      Multimodal.Media(1L, "video", Array[Byte](1, 2, 3), "avi",
        0, 0, 0L, 0.0),
      Multimodal.Media(2L, "video",
        java.util.Arrays.copyOf(graft.doc.VideoCodec.encodeMjpegAvi(
          8, 8, 10.0, Seq(miniJpg(8, 8))), 40), "avi", 0, 0, 0L, 0.0))
    assert(Multimodal.extractFrames(
      spark.createDataset(junk)).count() == 0)
    // a declared chunk size near Int.MaxValue must not wrap the bounds
    // check negative: frames() promises empty, not copyOfRange throws
    val wrap = graft.doc.VideoCodec.encodeMjpegAvi(
      8, 8, 10.0, Seq(miniJpg(8, 8)))
    val dcAt = {
      // locate the 00dc tag and poison its declared size
      val needle = "00dc".getBytes("US-ASCII")
      (0 until wrap.length - 4).find(i =>
        wrap(i) == needle(0) && wrap(i + 1) == needle(1) &&
          wrap(i + 2) == needle(2) && wrap(i + 3) == needle(3)).get
    }
    val sz = Int.MaxValue - 4 // > file len, but body+size wraps negative
    wrap(dcAt + 4) = (sz & 0xff).toByte
    wrap(dcAt + 5) = ((sz >> 8) & 0xff).toByte
    wrap(dcAt + 6) = ((sz >> 16) & 0xff).toByte
    wrap(dcAt + 7) = ((sz >> 24) & 0xff).toByte
    assert(graft.doc.VideoCodec.frames(wrap).isEmpty)
    // the per-video cap bounds a single row's expansion
    val many = graft.doc.VideoCodec.encodeMjpegAvi(8, 8, 10.0,
      Seq.fill(10)(miniJpg(8, 8)))
    val capped = Multimodal.extractFrames(
      spark.createDataset(Seq(Multimodal.Media(
        3L, "video", many, "avi", 8, 8, 1000L, 10.0))),
      maxFramesPerVideo = 4)
    assert(capped.count() == 4)
  }

  test("videoFrameDupCandidates pairs videos by shared frames, not " +
      "shared containers") {
    import spark.implicits._
    import graft.doc.VideoCodec
    val shared = Seq(miniJpg(64, 48), miniJpg(32, 24))
    val uniq = (1 to 4).map(i => miniJpg(100 + i, 80 + i))
    def vid(id: Long, frames: Seq[Array[Byte]], fps: Double) =
      Multimodal.Media(id, "video",
        VideoCodec.encodeMjpegAvi(64, 48, fps, frames), "avi",
        64, 48, frames.size * 1000L, fps)
    val vids = spark.createDataset(Seq(
      // 1 and 2 share both frames but differ in container timing and
      // extra content: a whole-payload hash can never pair them
      vid(1L, shared ++ Seq(uniq(0)), 25.0),
      vid(2L, Seq(uniq(1)) ++ shared, 10.0),
      // 3 shares only ONE frame with 1: below minShared = 2
      vid(3L, Seq(shared.head, uniq(2), uniq(3)), 25.0),
      // 4 repeats one shared frame 5 times WITHIN itself: per-video
      // distinct keeps that from inflating the pair count
      vid(4L, Seq.fill(5)(shared.head), 25.0)))
    val pairs = Multimodal.videoFrameDupCandidates(vids)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 2L)))
    // dropping the threshold surfaces the single-frame overlaps too
    val loose = Multimodal.videoFrameDupCandidates(vids, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(loose == Set((1L, 2L, 2L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
  }
}
