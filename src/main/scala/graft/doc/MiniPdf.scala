package graft.doc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal pure-JVM PDF writer + merger (no external libraries are
  * available on this classpath, so the engine carries its own tiny
  * kernel).
  *
  * Scope: text-only A4 pages with Helvetica — exactly what the
  * reference's cover-page synthesis needs (B4,
  * scraper_ringkoebing_skjern.py:33-67 reportlab canvas), plus a merge
  * (B5, scraper_ringkoebing_skjern.py:188-243 PdfWriter.append) that
  * handles the uncompressed single-content-stream PDFs this writer and
  * the engine's render kernels produce. A production deployment would
  * swap [[merge]]'s parser for a full PDF library behind the same
  * byte[]->byte[] signature; every caller is agnostic to that.
  */
object MiniPdf {

  val PageWidth = 595
  val PageHeight = 842

  /** One page of text lines at (x, startY), descending by `leading`. */
  final case class Page(lines: Seq[String], x: Int = 72, startY: Int = 770,
      leading: Int = 16, fontSize: Int = 11)

  /** A styled run within a line; bold renders as Helvetica-Bold. */
  final case class Seg(text: String, bold: Boolean = false)

  /** A line of styled runs; fontSize applies to the whole line. */
  final case class StyledLine(segs: Seq[Seg], fontSize: Int = 11)

  /** A raster image placed on a page: `(x, y)` is the bottom-left
    * corner in page coordinates, `(w, h)` the rendered size in
    * points. */
  final case class PlacedImage(img: ImageCodec.PdfImage, x: Double,
      y: Double, w: Double, h: Double)

  /** A page of styled lines (B1's structured DOCX render), plus any
    * placed raster images (page-local /Im0, /Im1, ... resources). */
  final case class StyledPage(lines: Seq[StyledLine], x: Int = 72,
      startY: Int = 770, leading: Int = 16,
      images: Seq[PlacedImage] = Seq.empty)

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c < 256 => c.toString
      case _ => "?" // Helvetica/WinAnsi can't encode it; keep layout stable
    }

  private def contentStream(p: Page): String = {
    val sb = new StringBuilder
    sb.append("BT\n")
    sb.append(s"/F1 ${p.fontSize} Tf\n")
    sb.append(s"${p.x} ${p.startY} Td\n")
    sb.append(s"${p.leading} TL\n")
    p.lines.zipWithIndex.foreach { case (line, i) =>
      if (i > 0) sb.append("T*\n")
      sb.append(s"(${escape(line)}) Tj\n")
    }
    sb.append("ET\n")
    sb.toString
  }

  private def styledContentStream(p: StyledPage): String = {
    val sb = new StringBuilder
    sb.append("BT\n")
    sb.append(s"${p.x} ${p.startY} Td\n")
    sb.append(s"${p.leading} TL\n")
    var curFont = ""
    p.lines.zipWithIndex.foreach { case (line, i) =>
      if (i > 0) sb.append("T*\n")
      val segs = if (line.segs.isEmpty) Seq(Seg("")) else line.segs
      segs.foreach { seg =>
        val font = s"${if (seg.bold) "/F2" else "/F1"} ${line.fontSize} Tf"
        if (font != curFont) { sb.append(font).append("\n"); curFont = font }
        // Tj advances the pen, so consecutive runs concatenate in-line
        sb.append(s"(${escape(seg.text)}) Tj\n")
      }
    }
    sb.append("ET\n")
    p.images.zipWithIndex.foreach { case (pi, k) =>
      sb.append(f"q ${pi.w}%.2f 0 0 ${pi.h}%.2f ${pi.x}%.2f ${pi.y}%.2f " +
        s"cm /Im$k Do Q\n")
    }
    sb.toString
  }

  /** One page's payload for the object writer: a text/graphics content
    * stream plus the images its /Im0../ImN names refer to. */
  private final case class PageContent(stream: String,
      images: Seq[ImageCodec.PdfImage] = Seq.empty)

  private def imageObject(id: Int, img: ImageCodec.PdfImage): Array[Byte] = {
    val filter = img.filter.fold("")(f => s"/Filter /$f ")
    val decode = img.decode.fold("")(d => s"/Decode $d ")
    val head = s"$id 0 obj\n<< /Type /XObject /Subtype /Image " +
      s"/Width ${img.width} /Height ${img.height} " +
      s"/ColorSpace /${img.colorSpace} " +
      s"/BitsPerComponent ${img.bitsPerComponent} " +
      s"$filter$decode/Length ${img.bytes.length} >>\nstream\n"
    head.getBytes(StandardCharsets.ISO_8859_1) ++ img.bytes ++
      "\nendstream\nendobj\n".getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Shared object-level writer: one content stream per page, both
    * fonts (F1 Helvetica, F2 Helvetica-Bold) in every page's
    * resources, and per-page image XObjects under page-LOCAL names
    * (/Im0, /Im1, ...) so content streams survive [[merge]]'s
    * re-numbering verbatim. */
  private def emitPdf(pages: Seq[PageContent]): Array[Byte] = {
    require(pages.nonEmpty, "PDF needs at least one page")
    val out = new ByteArrayOutputStream()
    def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def writeObj(b: Array[Byte]): Unit = { offsets += out.size(); out.write(b) }

    out.write(bytes("%PDF-1.4\n%âãÏÓ\n"))
    val n = pages.size
    // object ids: 1 catalog, 2 pages, 3+4 fonts, then per page: its
    // image objects, the page object, the content object
    val imageIds = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
    val pageIds = scala.collection.mutable.ArrayBuffer[Int]()
    var nextId = 5
    pages.foreach { p =>
      imageIds += p.images.indices.map(nextId + _)
      nextId += p.images.size
      pageIds += nextId
      nextId += 2 // page object + content object
    }
    writeObj(bytes("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
    val kids = pageIds.map(id => s"$id 0 R").mkString(" ")
    writeObj(bytes(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n"))
    writeObj(bytes("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"))
    writeObj(bytes("4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>\nendobj\n"))
    pages.zipWithIndex.foreach { case (p, i) =>
      p.images.zip(imageIds(i)).foreach { case (img, id) =>
        writeObj(imageObject(id, img))
      }
      val pageId = pageIds(i)
      val contId = pageId + 1
      val xobj = if (p.images.isEmpty) ""
        else imageIds(i).zipWithIndex
          .map { case (id, k) => s"/Im$k $id 0 R" }
          .mkString("/XObject << ", " ", " >> ")
      writeObj(bytes(s"$pageId 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $PageWidth $PageHeight] " +
        s"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> $xobj>> " +
        s"/Contents $contId 0 R >>\nendobj\n"))
      val csBytes = bytes(p.stream)
      writeObj(bytes(s"$contId 0 obj\n<< /Length ${csBytes.length} >>\nstream\n" +
        p.stream + "endstream\nendobj\n"))
    }
    val xrefPos = out.size()
    val total = offsets.size + 1
    val sb = new StringBuilder
    sb.append(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.write(bytes(sb.toString))
    out.toByteArray
  }

  /** Build a PDF from pages of text lines. */
  def makePdf(pages: Seq[Page]): Array[Byte] =
    emitPdf(pages.map(p => PageContent(contentStream(p))))

  /** Build a PDF from pages of styled lines (bold runs, per-line
    * sizes, placed images) — the B1 structured render target. */
  def makeStyledPdf(pages: Seq[StyledPage]): Array[Byte] =
    emitPdf(pages.map(p => PageContent(styledContentStream(p),
      p.images.map(_.img))))

  /** B4: cover page — title, date, bulleted participants
    * (scraper_ringkoebing_skjern.py:33-67 layout semantics). */
  def makeCover(title: String, date: String,
      participants: Seq[String]): Array[Byte] = {
    val lines = Seq(title, "", s"Dato: $date", "", "Deltagere:") ++
      participants.map(p => s"  • $p".replace("•", "*"))
    makePdf(Seq(Page(lines, startY = 720, leading = 20, fontSize = 14)))
  }

  // --------------------------------------------------------- parsing

  private val pageRe = "(?s)/Type\\s*/Page(?!s)".r

  /** Page count (works on this writer's output and other uncompressed
    * PDFs that spell /Type /Page per page object). */
  def pageCount(pdf: Array[Byte]): Int = {
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    pageRe.findAllIn(s).length
  }

  /** Content streams in document order (uncompressed streams only). */
  private[doc] def contentStreams(pdf: Array[Byte]): Seq[String] = {
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val re = "(?s)<<\\s*/Length\\s+\\d+\\s*>>\\s*stream\\r?\\n(.*?)endstream".r
    re.findAllMatchIn(s).map(_.group(1)).toSeq
  }

  /** Extracted text lines ("(..) Tj" operands) in order — the test
    * oracle for cover fields and merge ordering. */
  def extractText(pdf: Array[Byte]): Seq[String] = {
    val tj = "\\((?:[^()\\\\]|\\\\.)*\\)\\s*Tj".r
    contentStreams(pdf).flatMap { cs =>
      tj.findAllIn(cs).map { t =>
        t.stripSuffix("Tj").trim.stripPrefix("(").stripSuffix(")")
          .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")
      }
    }
  }

  // page object (ends at endobj; the dict nests Resources, so match to
  // the object terminator, not the first '>>')
  private val pageObjRe =
    "(?s)\\d+ 0 obj\\s*<<\\s*/Type\\s*/Page(?!s)(.*?)endobj".r
  private val contentsRefRe = "/Contents\\s+(\\d+)\\s+0\\s+R".r
  private val xobjDictRe = "(?s)/XObject\\s*<<(.*?)>>".r
  private val xobjEntryRe = "/Im(\\d+)\\s+(\\d+)\\s+0\\s+R".r

  /** Fetch object `id`'s dict text and raw stream bytes (exact /Length
    * bytes — image streams are binary and may contain any byte
    * sequence, so the length is authoritative, never a terminator
    * scan). */
  private def streamObject(s: String, id: Int): Option[(String, String)] = {
    val re = (s"(?s)(?:^|[\\r\\n])$id 0 obj\\s*<<(.*?)>>\\s*" +
      "stream\\r?\\n").r
    re.findFirstMatchIn(s).flatMap { m =>
      val dict = m.group(1)
      "/Length\\s+(\\d+)".r.findFirstMatchIn(dict).map { lm =>
        val len = lm.group(1).toInt
        (dict, s.substring(m.end, m.end + len))
      }
    }
  }

  private def parseImage(dict: String, stream: String)
      : Option[ImageCodec.PdfImage] = {
    def intOf(key: String): Option[Int] =
      (key + "\\s+(\\d+)").r.findFirstMatchIn(dict).map(_.group(1).toInt)
    for {
      w <- intOf("/Width")
      h <- intOf("/Height")
      bpc <- intOf("/BitsPerComponent")
      cs <- "/ColorSpace\\s*/(\\w+)".r.findFirstMatchIn(dict)
        .map(_.group(1))
    } yield ImageCodec.PdfImage(
      stream.getBytes(StandardCharsets.ISO_8859_1), w, h, cs, bpc,
      "/Filter\\s*/(\\w+)".r.findFirstMatchIn(dict).map(_.group(1)),
      "/Decode\\s*(\\[[\\d\\s]+\\])".r.findFirstMatchIn(dict)
        .map(_.group(1)))
  }

  /** Pages of a PDF as (content stream, image XObjects), in appearance
    * order — this writer's output parses fully; foreign uncompressed
    * single-stream PDFs fall back to their text streams. */
  private def parsePages(pdf: Array[Byte]): Seq[PageContent] = {
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val pages = pageObjRe.findAllMatchIn(s).flatMap { pm =>
      val body = pm.group(1)
      contentsRefRe.findFirstMatchIn(body).flatMap { cm =>
        streamObject(s, cm.group(1).toInt).map { case (_, content) =>
          val images = xobjDictRe.findFirstMatchIn(body).toSeq.flatMap {
            xm =>
              xobjEntryRe.findAllMatchIn(xm.group(1)).toSeq
                .sortBy(_.group(1).toInt)
                .flatMap(e => streamObject(s, e.group(2).toInt))
                .flatMap { case (d, st) => parseImage(d, st) }
          }
          PageContent(content, images)
        }
      }
    }.toSeq
    if (pages.nonEmpty) pages
    else contentStreams(pdf).map(PageContent(_))
  }

  /** B5: merge — re-emit every source page (text content AND image
    * XObjects) into one document, preserving order (PdfWriter.append
    * semantics for the engine's own uncompressed PDFs). Both fonts ride
    * along in every page's resources and image names are page-local, so
    * plain, styled, and image-bearing pages merge freely. */
  def merge(pdfs: Seq[Array[Byte]]): Array[Byte] = {
    val pages = pdfs.flatMap(parsePages)
    require(pages.nonEmpty, "merge of zero pages")
    emitPdf(pages)
  }

  /** Number of embedded image XObjects (test oracle for B1 image
    * fidelity and image-preserving merge). */
  def imageCount(pdf: Array[Byte]): Int = {
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    "/Subtype\\s*/Image".r.findAllIn(s).length
  }

  /** (width, height, colorSpace, filter) of each embedded image, in
    * object order — the structure golden for the codec path. */
  def imageInfos(pdf: Array[Byte]): Seq[(Int, Int, String, String)] = {
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val re = ("/Subtype\\s*/Image\\s*/Width\\s+(\\d+)\\s*/Height\\s+(\\d+)" +
      "\\s*/ColorSpace\\s*/(\\w+)\\s*/BitsPerComponent\\s+\\d+" +
      "\\s*(?:/Filter\\s*/(\\w+))?").r
    re.findAllMatchIn(s).map(m =>
      (m.group(1).toInt, m.group(2).toInt, m.group(3),
        Option(m.group(4)).getOrElse("Raw"))).toSeq
  }

  /** Extracted (text, font) runs in order — font is "F1" (regular) or
    * "F2" (bold); the test oracle for B1's styled render. */
  def extractTextWithFonts(pdf: Array[Byte]): Seq[(String, String)] = {
    val tok = "/(F\\d+)\\s+[\\d.]+\\s+Tf|\\(((?:[^()\\\\]|\\\\.)*)\\)\\s*Tj".r
    var font = "F1"
    contentStreams(pdf).flatMap { cs =>
      tok.findAllMatchIn(cs).flatMap { m =>
        if (m.group(1) != null) { font = m.group(1); None }
        else Some((m.group(2)
          .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\"),
          font))
      }
    }
  }
}
