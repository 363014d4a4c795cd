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

  /** Build a PDF from pages of text lines. */
  def makePdf(pages: Seq[Page]): Array[Byte] = {
    require(pages.nonEmpty, "PDF needs at least one page")
    val out = new ByteArrayOutputStream()
    def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def writeObj(s: String): Unit = { offsets += out.size(); out.write(bytes(s)) }

    out.write(bytes("%PDF-1.4\n%âãÏÓ\n"))
    val n = pages.size
    // object ids: 1 catalog, 2 pages, 3 font, then per page: page obj
    // (4+2i) and content obj (5+2i)
    writeObj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    writeObj(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    writeObj("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    pages.zipWithIndex.foreach { case (p, i) =>
      val pageId = 4 + 2 * i
      val contId = 5 + 2 * i
      writeObj(s"$pageId 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $PageWidth $PageHeight] " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents $contId 0 R >>\nendobj\n")
      val cs = contentStream(p)
      val csBytes = bytes(cs)
      writeObj(s"$contId 0 obj\n<< /Length ${csBytes.length} >>\nstream\n" +
        cs + "endstream\nendobj\n")
    }
    val xrefPos = out.size()
    val total = 3 + 2 * n + 1
    val sb = new StringBuilder
    sb.append(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.write(bytes(sb.toString))
    out.toByteArray
  }

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
    * engine's own uncompressed text PDFs). */
  def merge(pdfs: Seq[Array[Byte]]): Array[Byte] = {
    val pages = pdfs.flatMap { pdf =>
      contentStreams(pdf).map(raw => RawPage(raw))
    }
    require(pages.nonEmpty, "merge of zero pages")
    makeRawPdf(pages)
  }

  private final case class RawPage(content: String)

  /** Rebuild a PDF from raw content streams (used by merge). */
  private def makeRawPdf(pages: Seq[RawPage]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def writeObj(s: String): Unit = { offsets += out.size(); out.write(bytes(s)) }
    out.write(bytes("%PDF-1.4\n"))
    val n = pages.size
    writeObj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    writeObj(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    writeObj("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    pages.zipWithIndex.foreach { case (p, i) =>
      val pageId = 4 + 2 * i
      val contId = 5 + 2 * i
      writeObj(s"$pageId 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $PageWidth $PageHeight] " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents $contId 0 R >>\nendobj\n")
      writeObj(s"$contId 0 obj\n<< /Length ${p.content.length} >>\nstream\n" +
        p.content + "endstream\nendobj\n")
    }
    val xrefPos = out.size()
    val total = 3 + 2 * n + 1
    val sb = new StringBuilder
    sb.append(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.write(bytes(sb.toString))
    out.toByteArray
  }
}
