package graft.doc

/** From-scratch AVI (RIFF) HEADER codec: chunk/LIST walking decode of
  * the `avih` main header plus a minimal writer — the video companion
  * of [[AudioCodec]] (same RIFF grammar, one more level of nesting:
  * AVI wraps its headers in LIST containers). Frame DATA is not
  * decoded — that genuinely needs a codec library this container
  * doesn't have — but geometry, frame count and timing come from the
  * real header bytes, so `kind = video` metadata is authoritative the
  * same way image/audio metadata is, and the content-derived stub
  * shrinks to unknown-format payloads only.
  *
  * Format notes (public RIFF/AVI spec): little-endian;
  * `RIFF <size> AVI ` then chunks `<id:4><size:4le><data>` where a
  * `LIST <size> <type:4>` chunk nests further chunks. The `avih`
  * chunk (inside `LIST hdrl`) carries dwMicroSecPerFrame at offset 0,
  * dwTotalFrames at 16, dwWidth at 32 and dwHeight at 36. Unknown
  * chunks are skipped by size; truncated or hostile sizes return
  * None.
  */
object VideoCodec {

  final case class AviMeta(width: Int, height: Int, nFrames: Long,
      usPerFrame: Long) {
    def fps: Double =
      if (usPerFrame <= 0) 0.0 else 1e6 / usPerFrame
    def durationMs: Long = nFrames * usPerFrame / 1000L
  }

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Find `avih` by walking chunks in [from, to), descending into
    * LIST containers (depth-bounded: hostile nesting stops at 8). */
  private def findAvih(b: Array[Byte], from: Int, to: Int,
      depth: Int): Option[Int] = {
    if (depth > 8) return None
    var off = from
    while (off + 8 <= to) {
      val id = tag(b, off)
      val declared = u32(b, off + 4)
      if (declared > Int.MaxValue.toLong) return None
      val size = declared.toInt
      val body = off + 8
      val end = math.min(to.toLong, body.toLong + size).toInt
      if (id == "avih" && body + 40 <= b.length) return Some(body)
      if (id == "LIST" && body + 4 <= b.length) {
        val hit = findAvih(b, body + 4, end, depth + 1)
        if (hit.isDefined) return hit
      }
      off = body + size + (size & 1)
      if (off <= body) return None // 0-size loop guard
    }
    None
  }

  def decode(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
      tag(bytes, 8) != "AVI ") return None
    findAvih(bytes, 12, bytes.length, 0).flatMap { o =>
      val usPerFrame = u32(bytes, o)
      val nFrames = u32(bytes, o + 16)
      val width = u32(bytes, o + 32)
      val height = u32(bytes, o + 36)
      if (width >= 1 && width <= 32768 && height >= 1 &&
        height <= 32768 && usPerFrame >= 1)
        Some(AviMeta(width.toInt, height.toInt, nFrames, usPerFrame))
      else None
    }
  }

  /** Find the body range of the `LIST movi` container: (start, end)
    * byte offsets of its chunk stream (after the `movi` type tag). */
  private def findMovi(b: Array[Byte], from: Int, to: Int,
      depth: Int): Option[(Int, Int)] = {
    if (depth > 8) return None
    var off = from
    while (off + 8 <= to) {
      val id = tag(b, off)
      val declared = u32(b, off + 4)
      if (declared > Int.MaxValue.toLong) return None
      val size = declared.toInt
      val body = off + 8
      val end = math.min(to.toLong, body.toLong + size).toInt
      if (id == "LIST" && body + 4 <= b.length) {
        if (tag(b, body) == "movi") return Some((body + 4, end))
        val hit = findMovi(b, body + 4, end, depth + 1)
        if (hit.isDefined) return hit
      }
      off = body + size + (size & 1)
      if (off <= body) return None
    }
    None
  }

  /** One video frame inside the `movi` stream: its stream number, byte
    * offset and length within the container, so a caller can slice the
    * payload out without this walker copying anything. */
  final case class FrameRef(stream: Int, offset: Int, length: Int)

  /** Walk `LIST movi` for video-frame chunks (`NNdc` compressed /
    * `NNdb` uncompressed, NN the two-digit stream number — the public
    * AVI chunk-id grammar). In an MJPEG AVI every `NNdc` payload is a
    * standalone JPEG, so slicing these ranges yields per-frame images
    * the image-side parser can read — real frame EXTRACTION without
    * pixel-level entropy decode (which still needs a codec library).
    * `LIST rec ` groupings are descended; non-frame chunks (`NNwb`
    * audio, `idx1`) are skipped by size. Hostile input: size-capped
    * walk, `maxFrames` bound, None-shaped empty on malformed files. */
  def frames(bytes: Array[Byte], maxFrames: Int = 100000)
      : Seq[FrameRef] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
      tag(bytes, 8) != "AVI ") return Seq.empty
    findMovi(bytes, 12, bytes.length, 0) match {
      case None => Seq.empty
      case Some((start, end)) =>
        val out = Seq.newBuilder[FrameRef]
        var n = 0
        def walk(from: Int, to: Int, depth: Int): Unit = {
          if (depth > 8) return
          var off = from
          while (off + 8 <= to && n < maxFrames) {
            val id = tag(bytes, off)
            val declared = u32(bytes, off + 4)
            if (declared > Int.MaxValue.toLong) return
            val size = declared.toInt
            val body = off + 8
            if (id == "LIST" && body + 4 <= bytes.length &&
              tag(bytes, body) == "rec ")
              walk(body + 4,
                math.min(to.toLong, body.toLong + size).toInt, depth + 1)
            else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
              (id.endsWith("dc") || id.endsWith("db")) &&
              // long arithmetic: a hostile size near Int.MaxValue wraps
              // `body + size` negative and would pass an Int compare,
              // emitting a FrameRef whose copyOfRange then throws
              size > 0 && body.toLong + size <= bytes.length) {
              out += FrameRef((id(0) - '0') * 10 + (id(1) - '0'),
                body, size)
              n += 1
            }
            off = body + size + (size & 1)
            if (off <= body) return
          }
        }
        walk(start, end, 0)
        out.result()
    }
  }

  /** Slice a frame's payload out of the container. */
  def framePayload(bytes: Array[Byte], f: FrameRef): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, f.offset, f.offset + f.length)

  /** MJPEG AVI writer: the header-only writer's movi payload is the
    * frame JPEGs wrapped as `00dc` chunks (even-padded, per the RIFF
    * grammar) — a container [[frames]] round-trips, for specs and the
    * synthetic tables. */
  def encodeMjpegAvi(width: Int, height: Int, fps: Double,
      frameJpegs: Seq[Array[Byte]]): Array[Byte] = {
    val moviLen = frameJpegs.map(f => 8 + f.length + (f.length & 1)).sum
    val buf = java.nio.ByteBuffer.allocate(moviLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    frameJpegs.foreach { f =>
      buf.put("00dc".getBytes("US-ASCII")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    encodeAviHeader(width, height, fps, frameJpegs.size.toLong,
      buf.array())
  }

  /** Minimal header-only AVI writer: RIFF(AVI ) > LIST(hdrl) > avih,
    * followed by an opaque `movi` payload (not decodable frame data —
    * the synthetic tables carry text bytes there). */
  def encodeAviHeader(width: Int, height: Int, fps: Double,
      nFrames: Long, moviPayload: Array[Byte] = Array.emptyByteArray)
      : Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0)
    val usPerFrame = math.round(1e6 / fps)
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame.toInt).putInt(0).putInt(0).putInt(0)
      .putInt(nFrames.toInt).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height)
    // 4 reserved dwords stay zero (allocate() zero-fills)
    val hdrlLen = 4 + 8 + 56 // "hdrl" + avih chunk header + body
    val moviLen = 4 + moviPayload.length
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(hdrlLen)
      .put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(56).put(avih.array())
    buf.put("LIST".getBytes("US-ASCII")).putInt(moviLen)
      .put("movi".getBytes("US-ASCII")).put(moviPayload)
    buf.array()
  }
}
