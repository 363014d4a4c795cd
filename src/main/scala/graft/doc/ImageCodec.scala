package graft.doc

import java.util.zip.{CRC32, Deflater, Inflater}

/** Raster decode for the two formats DOCX embeds in practice, targeting
  * PDF image XObjects (no imaging libraries exist on this classpath, so
  * the engine carries the minimal codecs itself):
  *
  *  - JPEG passes through verbatim: PDF's DCTDecode filter IS baseline
  *    JPEG, so only the dimensions/components are sniffed from the SOF
  *    marker.
  *  - PNG is decoded (IDAT inflate + per-row defilter) to raw samples
  *    and re-deflated for a FlateDecode XObject: every depth/color
  *    combination the spec allows (1/2/4/8/16-bit; gray, RGB, palette,
  *    gray+alpha, RGBA), sequential AND Adam7-interlaced. Alpha drops
  *    (PDF images have no alpha channel without an SMask, and agenda
  *    documents never need one), palette indexes expand through PLTE
  *    to plain RGB, sub-byte samples unpack MSB-first and gray ones
  *    scale to 8-bit range, 16-bit samples keep their high byte,
  *    interlaced passes defilter independently and scatter into the
  *    full raster.
  *  - 4-component (CMYK/YCCK) JPEG embeds as DeviceCMYK DCTDecode,
  *    with the Adobe-APP14 inverted-sample convention expressed as a
  *    PDF /Decode array.
  *
  * Anything else (WMF/EMF, exotic JPEG component counts) returns None
  * and the caller drops the image — the pre-round-8 behavior, now the
  * exception instead of the rule — with recognized-but-out-of-scope
  * formats counted in [[unsupportedDrops]] and logged with a reason.
  * Reference analog: mammoth carries DOCX images into HTML and
  * WeasyPrint rasterizes them (scraper_glostrup.py:42-100).
  */
object ImageCodec {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Cap on decoded PNG sample bytes (256 MiB). Hostile IHDR dimensions
    * otherwise overflow `(stride + 1) * height` in Int — a negative
    * allocation size — or demand a multi-GB buffer; either way the task
    * dies instead of the image being dropped. */
  private val MaxDecodedBytes = 1L << 28

  /** Images dropped because the format is recognized but out of scope
    * (e.g. a JPEG with an exotic component count): the counted, logged
    * drop every lossy path in the engine carries, so a corpus full of
    * such images degrades visibly rather than silently. Per-JVM (i.e.
    * per-executor) count; the warn log carries the reason. */
  private[graft] val unsupportedDrops =
    new java.util.concurrent.atomic.AtomicLong

  private def dropUnsupported(reason: String): None.type = {
    unsupportedDrops.incrementAndGet()
    log.warn(s"ImageCodec: dropping image, unsupported format ($reason)")
    None
  }

  /** A decoded image ready to embed: `bytes` is the XObject stream,
    * `filter` its PDF filter (None = raw samples), `decode` an optional
    * /Decode array literal (Adobe CMYK JPEGs store inverted samples). */
  final case class PdfImage(bytes: Array[Byte], width: Int, height: Int,
      colorSpace: String, bitsPerComponent: Int, filter: Option[String],
      decode: Option[String] = None)

  def decode(data: Array[Byte]): Option[PdfImage] =
    try {
      if (data == null || data.length < 8) None
      else if ((data(0) & 0xFF) == 0xFF && (data(1) & 0xFF) == 0xD8)
        decodeJpeg(data)
      else if ((data(0) & 0xFF) == 0x89 && data(1) == 'P' && data(2) == 'N' &&
        data(3) == 'G') decodePng(data)
      else None
    } catch {
      // drop-not-crash: a corrupt or hostile image inside a scraped DOCX
      // must never fail the task, whatever the decode path threw
      case scala.util.control.NonFatal(_) => None
    }

  // ------------------------------------------------------------ JPEG

  /** Walk the marker stream to the first SOF0/1/2; the JPEG itself is
    * embedded untouched (DCTDecode). 4-component (CMYK/YCCK) JPEGs embed
    * as DeviceCMYK; when the Adobe APP14 marker is present the samples
    * are stored inverted (Adobe convention), which PDF expresses with a
    * /Decode [1 0 ...] array rather than a pixel rewrite. */
  private def decodeJpeg(d: Array[Byte]): Option[PdfImage] = {
    var i = 2
    var adobeApp14 = false
    while (i + 9 < d.length) {
      if ((d(i) & 0xFF) != 0xFF) return None // desynced marker stream
      val marker = d(i + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else if (marker == 0x01 || marker == 0xFF) i += 2
      else {
        val len = ((d(i + 2) & 0xFF) << 8) | (d(i + 3) & 0xFF)
        if (marker == 0xEE && len >= 7 && i + 9 <= d.length &&
          d(i + 4) == 'A' && d(i + 5) == 'd' && d(i + 6) == 'o' &&
          d(i + 7) == 'b' && d(i + 8) == 'e') adobeApp14 = true
        if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2) {
          val h = ((d(i + 5) & 0xFF) << 8) | (d(i + 6) & 0xFF)
          val w = ((d(i + 7) & 0xFF) << 8) | (d(i + 8) & 0xFF)
          val comps = d(i + 9) & 0xFF
          val (cs, dec) = comps match {
            case 1 => ("DeviceGray", None)
            case 3 => ("DeviceRGB", None)
            case 4 => ("DeviceCMYK",
              if (adobeApp14) Some("[1 0 1 0 1 0 1 0]") else None)
            case _ => return dropUnsupported(s"JPEG with $comps components")
          }
          return Some(PdfImage(d, w, h, cs, 8, Some("DCTDecode"), dec))
        }
        if (marker == 0xDA) return None // hit scan data before any SOF
        i += 2 + len
      }
    }
    None
  }

  // ------------------------------------------------------------- PNG

  private def be32(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xFF) << 24) | ((d(i + 1) & 0xFF) << 16) |
      ((d(i + 2) & 0xFF) << 8) | (d(i + 3) & 0xFF)

  private def decodePng(d: Array[Byte]): Option[PdfImage] = {
    // chunk walk: IHDR is mandatory-first; IDATs concatenate
    if (d.length < 33) return None
    var i = 8
    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
    var interlace = 0
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var sawIhdr = false
    while (i + 8 <= d.length) {
      val len = be32(d, i)
      val typ = new String(d, i + 4, 4, "US-ASCII")
      val dataAt = i + 8
      // len is attacker-controlled: negative (high bit set) would leave
      // `i` un-advanced — an infinite loop — and a huge positive value
      // overflows `dataAt + len` in Int, so compare in Long
      if (len < 0 || dataAt.toLong + len > d.length) return None
      typ match {
        case "IHDR" =>
          width = be32(d, dataAt); height = be32(d, dataAt + 4)
          bitDepth = d(dataAt + 8) & 0xFF; colorType = d(dataAt + 9) & 0xFF
          interlace = d(dataAt + 12) & 0xFF
          sawIhdr = true
        case "IDAT" => idat.write(d, dataAt, len)
        case "PLTE" => palette = java.util.Arrays.copyOfRange(d, dataAt,
          dataAt + len)
        case _ => ()
      }
      i = dataAt + len + 4 // skip CRC
    }
    if (!sawIhdr || width <= 0 || height <= 0) return None
    if (interlace != 0 && interlace != 1) return None // invalid IHDR
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 3 => if (palette == null) return None else 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return None // invalid color type
    }
    // every depth/color combination the PNG spec allows is decoded;
    // anything else is a malformed file, not an unsupported format
    val depthOk = colorType match {
      case 0 => Seq(1, 2, 4, 8, 16).contains(bitDepth)
      case 3 => Seq(1, 2, 4, 8).contains(bitDepth)
      case _ => bitDepth == 8 || bitDepth == 16
    }
    if (!depthOk) return None
    // filtering operates on BYTES: 16-bit samples double the row stride
    // and the filter's "previous pixel" distance; sub-byte depths pack
    // several pixels per byte with the distance floored at one byte
    val bitsPerPixel = bitDepth * channels
    def rowBytesOf(w: Int): Long = (w.toLong * bitsPerPixel + 7) / 8
    val bpp = math.max(1, bitsPerPixel / 8)
    val strideL = rowBytesOf(width)
    if ((strideL + 1L) * height > MaxDecodedBytes ||
      width.toLong * height * channels > MaxDecodedBytes) return None
    val stride = strideL.toInt
    // expected inflated size: one filter byte per scanline — per image
    // row when sequential, per sub-image row of each Adam7 pass when
    // interlaced (pass geometry below)
    val expected: Long =
      if (interlace == 0) (strideL + 1L) * height
      else Adam7.map { case (x0, y0, dx, dy) =>
        val wp = passExtent(width, x0, dx); val hp = passExtent(height, y0, dy)
        if (wp > 0 && hp > 0) hp.toLong * (1L + rowBytesOf(wp)) else 0L
      }.sum
    if (expected <= 0 || expected > MaxDecodedBytes) return None
    val raw = inflate(idat.toByteArray, expected.toInt)
      .getOrElse(return None)
    if (raw.length < expected) return None
    // gray sub-byte samples scale to the full 8-bit range (1->255,
    // 2->85, 4->17); palette indexes pass through untouched
    val scale =
      if (colorType == 0 && bitDepth < 8) 255 / ((1 << bitDepth) - 1) else 1
    // out8: the defiltered, unpacked, high-byte raster — one byte per
    // sample, `channels` samples per pixel
    val out8 = new Array[Byte](width * height * channels)
    if (interlace == 0) {
      val packed = new Array[Byte](stride * height)
      if (!defilterInto(raw, 0, stride, height, bpp, packed)) return None
      unpackInto(packed, stride, width, height, bitDepth, channels, scale,
        out8)
    } else {
      // Adam7: each pass is an independently-filtered sub-image; defilter
      // and unpack it, then scatter its pixels to their
      // (y0 + r*dy, x0 + x*dx) cells
      var off = 0
      for ((x0, y0, dx, dy) <- Adam7) {
        val wp = passExtent(width, x0, dx)
        val hp = passExtent(height, y0, dy)
        if (wp > 0 && hp > 0) {
          val strideP = rowBytesOf(wp).toInt
          val sub = new Array[Byte](strideP * hp)
          if (!defilterInto(raw, off, strideP, hp, bpp, sub)) return None
          val subPix = new Array[Byte](wp * hp * channels)
          unpackInto(sub, strideP, wp, hp, bitDepth, channels, scale, subPix)
          var r = 0
          while (r < hp) {
            var x = 0
            while (x < wp) {
              System.arraycopy(subPix, (r * wp + x) * channels, out8,
                ((y0 + r * dy) * width + (x0 + x * dx)) * channels, channels)
              x += 1
            }
            r += 1
          }
          off += hp * (1 + strideP)
        }
      }
    }
    // drop alpha (PDF image XObjects carry no alpha channel); expand
    // palette indexes through PLTE to plain RGB
    val samples =
      if (channels == 4) {
        val rgb = new Array[Byte](width * height * 3)
        var p = 0; var q = 0
        while (p < out8.length) {
          rgb(q) = out8(p); rgb(q + 1) = out8(p + 1); rgb(q + 2) = out8(p + 2)
          p += 4; q += 3
        }
        rgb
      } else if (channels == 2) { // gray + alpha -> gray
        val g = new Array[Byte](width * height)
        var p = 0; var q = 0
        while (p < out8.length) { g(q) = out8(p); p += 2; q += 1 }
        g
      } else if (colorType == 3) {
        val rgb = new Array[Byte](width * height * 3)
        var p = 0
        while (p < out8.length) {
          val ix = (out8(p) & 0xFF) * 3
          if (ix + 2 >= palette.length) return None // index past PLTE
          rgb(p * 3) = palette(ix)
          rgb(p * 3 + 1) = palette(ix + 1)
          rgb(p * 3 + 2) = palette(ix + 2)
          p += 1
        }
        rgb
      } else out8
    val cs = if (colorType == 0 || colorType == 4) "DeviceGray"
      else "DeviceRGB"
    Some(PdfImage(deflate(samples), width, height, cs, 8,
      Some("FlateDecode")))
  }

  /** Adam7 pass geometry: (x_start, y_start, x_step, y_step), per the
    * PNG spec's starting_col/starting_row/col_increment/row_increment
    * tables. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Pixels a pass covers along one axis: ceil((total - start) / step). */
  private def passExtent(total: Int, start: Int, step: Int): Int =
    math.max(0, (total - start + step - 1) / step)

  /** Undo PNG adaptive filtering for one (sub-)image of `h` scanlines
    * of `stride` packed bytes each, starting at `rawOff` (each raw row:
    * one filter-type byte + `stride` bytes), writing defiltered packed
    * bytes into `out` (sized stride*h). `bpp` is the spec's filter
    * distance — bytes per pixel, floored at 1 for sub-byte depths.
    * False on an unknown filter type. */
  private def defilterInto(raw: Array[Byte], rawOff: Int, stride: Int,
      h: Int, bpp: Int, out: Array[Byte]): Boolean = {
    var r = 0
    while (r < h) {
      val ft = raw(rawOff + r * (stride + 1)) & 0xFF
      val src = rawOff + r * (stride + 1) + 1
      val dst = r * stride
      var c = 0
      while (c < stride) {
        val x = raw(src + c) & 0xFF
        val a = if (c >= bpp) out(dst + c - bpp) & 0xFF else 0
        val b = if (r > 0) out(dst - stride + c) & 0xFF else 0
        val cc = if (r > 0 && c >= bpp)
          out(dst - stride + c - bpp) & 0xFF else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, cc)
          case _ => return false
        }
        out(dst + c) = (v & 0xFF).toByte
        c += 1
      }
      r += 1
    }
    true
  }

  /** Expand a defiltered packed (sub-)image to one byte per sample:
    * sub-byte rows unpack MSB-first (times `scale` for gray), 8-bit
    * rows copy through, 16-bit rows keep each big-endian sample's high
    * byte (the PDF page renders at 8 bits). Sub-byte depths only occur
    * with channels == 1 (gray or palette index). */
  private def unpackInto(packed: Array[Byte], stride: Int, w: Int, h: Int,
      bitDepth: Int, channels: Int, scale: Int, out: Array[Byte]): Unit = {
    if (bitDepth == 8) System.arraycopy(packed, 0, out, 0, stride * h)
    else if (bitDepth == 16) {
      var k = 0
      while (k < out.length) { out(k) = packed(2 * k); k += 1 }
    } else {
      val mask = (1 << bitDepth) - 1
      var r = 0
      while (r < h) {
        var x = 0
        while (x < w) {
          val bit = x * bitDepth
          val b = packed(r * stride + (bit >> 3)) & 0xFF
          val shift = 8 - bitDepth - (bit & 7)
          out(r * w + x) = ((((b >> shift) & mask) * scale) & 0xFF).toByte
          x += 1
        }
        r += 1
      }
    }
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(data: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off == expected) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  private[graft] def deflate(data: Array[Byte]): Array[Byte] = {
    val defl = new Deflater()
    try {
      defl.setInput(data); defl.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      out.toByteArray
    } finally defl.end()
  }

  /** Minimal PNG ENCODER (tests + fixtures): 8-bit RGB, filter 0 rows.
    * Lives here so specs can fabricate real decodable PNGs without any
    * imaging library. */
  def encodePngRgb(width: Int, height: Int,
      rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb buffer size")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new CRC32(); crc.update(body)
      val c = crc.getValue.toInt
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte) // bit depth 8, color type RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    chunk("IHDR", ihdr.array())
    val stride = width * 3
    val filtered = new Array[Byte]((stride + 1) * height)
    var r = 0
    while (r < height) {
      filtered(r * (stride + 1)) = 0 // filter type None
      System.arraycopy(rgb, r * stride, filtered, r * (stride + 1) + 1, stride)
      r += 1
    }
    chunk("IDAT", deflate(filtered))
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** Minimal marker-stream JPEG writer: SOI + SOF0 (3 components at
    * the given dims) + EOI — no entropy-coded scan data, but a valid
    * marker stream whose geometry [[decode]] reads back. The
    * synthetic MJPEG video frames and the codec specs share it. */
  def encodeMarkerJpeg(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && width < 65536 && height > 0 && height < 65536)
    Array(0xFF, 0xD8,
      0xFF, 0xC0, 0x00, 0x11, 0x08,
      (height >> 8) & 0xFF, height & 0xFF,
      (width >> 8) & 0xFF, width & 0xFF, 0x03,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1,
      0xFF, 0xD9).map(_.toByte)
  }
}
