package graft.doc

/** From-scratch WAV (RIFF/WAVE) codec: chunk-walking decode of PCM
  * payloads plus a PCM16 encoder for fixtures and the synthetic media
  * table — the audio analogue of [[ImageCodec]], so `kind = audio`
  * rows in [[graft.multimodal.Multimodal]] carry REAL decodable
  * payloads and the decode stub shrinks to video only (no ffmpeg in
  * this container; reference analog: the scraped-binary handling in
  * `scraper.py`'s download path, which trusts no payload either).
  *
  * Format notes (public RIFF spec): little-endian throughout;
  * `RIFF <size> WAVE` then a chunk walk of `<id:4><size:4le><data>`
  * with odd-sized chunks padded to even offsets. Only `fmt ` and
  * `data` are consumed; every other chunk (LIST, fact, cue…) is
  * skipped by size — the property that makes chunk-walking robust to
  * real-world encoder junk. Supported sample formats: PCM (format 1)
  * at 8 (unsigned) / 16 / 24 / 32 (signed) bits, and IEEE float 32
  * (format 3). Anything else — ADPCM, extensible, truncated or
  * hostile headers — returns None and the caller degrades to
  * hash-only features, never a task failure.
  */
object AudioCodec {

  /** Decoded PCM audio. `samples` is interleaved (frame-major),
    * normalized to [-1, 1]. */
  final case class WavAudio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long, samples: Array[Float]) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nFrames * 1000L / sampleRate
  }

  /** Decoded-size cap: 16M samples (~64 MB of floats). A WAV
    * declaring more is refused rather than ballooning an executor —
    * the same bounded-decode discipline as [[ImageCodec]]. */
  private val MaxSamples = 1L << 24

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def decode(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" ||
      tag(bytes, 8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
    var data: Option[(Int, Int)] = None // offset, length
    var off = 12
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      val declared = u32(bytes, off + 4)
      if (declared > Int.MaxValue.toLong) return None
      val size = declared.toInt
      val body = off + 8
      id match {
        case "fmt " if size >= 16 && body + 16 <= bytes.length =>
          fmt = Some((u16(bytes, body), u16(bytes, body + 2),
            u32(bytes, body + 4).toInt, u16(bytes, body + 14)))
        case "data" =>
          // tolerate a size field overrunning the buffer (truncated
          // downloads write the header first): clamp to what's there
          data = Some((body, math.min(size, bytes.length - body)))
        case _ => () // skip LIST/fact/cue/bext/...
      }
      off = body + size + (size & 1) // chunks are word-aligned
      if (off <= body) return None // size overflow / hostile 0-loop
    }
    for {
      (format, channels, rate, bits) <- fmt
      (dOff, dLen) <- data
      if channels >= 1 && channels <= 64 && rate >= 1 && rate <= 1000000
      bytesPer = bits / 8
      if (format == 1 && (bits == 8 || bits == 16 || bits == 24 ||
        bits == 32)) || (format == 3 && bits == 32)
      frameBytes = bytesPer * channels
      nFrames = dLen.toLong / frameBytes
      if nFrames * channels <= MaxSamples
    } yield {
      val n = (nFrames * channels).toInt
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        val o = dOff + i * bytesPer
        out(i) = (format, bits) match {
          case (1, 8) => ((bytes(o) & 0xff) - 128) / 128.0f
          case (1, 16) => (u16(bytes, o).toShort) / 32768.0f
          case (1, 24) =>
            val v = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
              (bytes(o + 2) << 16) // sign-extends via the top byte
            v / 8388608.0f
          case (1, 32) => u32(bytes, o).toInt / 2147483648.0f
          case _ => // format 3: IEEE float32 LE
            java.lang.Float.intBitsToFloat(u32(bytes, o).toInt)
        }
        i += 1
      }
      WavAudio(rate, channels, bits, nFrames, out)
    }
  }

  /** Minimal canonical PCM16 WAV writer (44-byte header + data). */
  def encodePcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}
