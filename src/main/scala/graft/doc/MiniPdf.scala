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

  /** A page of styled lines (B1's structured DOCX render). */
  final case class StyledPage(lines: Seq[StyledLine], x: Int = 72,
      startY: Int = 770, leading: Int = 16)

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
    sb.toString
  }

  /** Shared object-level writer: one content stream per page, both
    * fonts (F1 Helvetica, F2 Helvetica-Bold) in every page's
    * resources. */
  private def emitPdf(contents: Seq[String]): Array[Byte] = {
    require(contents.nonEmpty, "PDF needs at least one page")
    val out = new ByteArrayOutputStream()
    def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def writeObj(s: String): Unit = { offsets += out.size(); out.write(bytes(s)) }

    out.write(bytes("%PDF-1.4\n%âãÏÓ\n"))
    val n = contents.size
    // object ids: 1 catalog, 2 pages, 3+4 fonts, then per page: page
    // obj (5+2i) and content obj (6+2i)
    writeObj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until n).map(i => s"${5 + 2 * i} 0 R").mkString(" ")
    writeObj(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    writeObj("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    writeObj("4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>\nendobj\n")
    contents.zipWithIndex.foreach { case (cs, i) =>
      val pageId = 5 + 2 * i
      val contId = 6 + 2 * i
      writeObj(s"$pageId 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $PageWidth $PageHeight] " +
        s"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> " +
        s"/Contents $contId 0 R >>\nendobj\n")
      val csBytes = bytes(cs)
      writeObj(s"$contId 0 obj\n<< /Length ${csBytes.length} >>\nstream\n" +
        cs + "endstream\nendobj\n")
    }
    val xrefPos = out.size()
    val total = 4 + 2 * n + 1
    val sb = new StringBuilder
    sb.append(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.write(bytes(sb.toString))
    out.toByteArray
  }

  /** Build a PDF from pages of text lines. */
  def makePdf(pages: Seq[Page]): Array[Byte] =
    emitPdf(pages.map(contentStream))

  /** Build a PDF from pages of styled lines (bold runs, per-line
    * sizes) — the B1 structured render target. */
  def makeStyledPdf(pages: Seq[StyledPage]): Array[Byte] =
    emitPdf(pages.map(styledContentStream))

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

  /** B5: merge — re-emit every source page (text content) into one
    * document, preserving order (PdfWriter.append semantics for the
    * engine's own uncompressed text PDFs). Both fonts ride along in
    * every page's resources, so plain and styled pages merge freely. */
  def merge(pdfs: Seq[Array[Byte]]): Array[Byte] = {
    val pages = pdfs.flatMap(contentStreams)
    require(pages.nonEmpty, "merge of zero pages")
    emitPdf(pages)
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
