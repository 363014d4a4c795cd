package graft.doc

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.parse.HtmlParser

/** Per-row binary document kernels (SURVEY.md §2.10, B1-B5) as Scala
  * UDFs + a typed merge Aggregator. All pure JVM, deterministic, no
  * I/O — safe inside executors, one invocation per row, scale-out by
  * partitioning.
  */
object DocKernels {

  // ------------------------------------------------------------- B1
  /** Structured DOCX content: headings, paragraphs with (text, bold)
    * runs, and simple tables — the subset mammoth carries into HTML
    * and WeasyPrint then renders (scraper_glostrup.py:42-100). */
  sealed trait DocxBlock
  final case class DocxHeading(level: Int,
      runs: Seq[(String, Boolean)]) extends DocxBlock
  final case class DocxPara(runs: Seq[(String, Boolean)]) extends DocxBlock
  final case class DocxTable(rows: Seq[Seq[String]]) extends DocxBlock
  /** An embedded raster image with its declared size in points. */
  final case class DocxImage(data: Array[Byte], widthPt: Double,
      heightPt: Double) extends DocxBlock

  /** The zip entries a render needs: document.xml, the relationship
    * map (rId -> media path), and the media bytes — one zip pass. */
  private final case class DocxParts(xml: String,
      rels: Map[String, String], media: Map[String, Array[Byte]])

  private def docxParts(docx: Array[Byte]): DocxParts = {
    val zis = new ZipInputStream(new ByteArrayInputStream(docx))
    var xml = ""
    var relsXml = ""
    val media = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zis.getNextEntry
      while (e != null) {
        e.getName match {
          case "word/document.xml" =>
            xml = new String(zis.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
          case "word/_rels/document.xml.rels" =>
            relsXml = new String(zis.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
          case n if n.startsWith("word/media/") =>
            media += (n -> zis.readAllBytes())
          case _ => ()
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    // attribute order varies across producers: pull Id and Target
    // independently per <Relationship .../> tag
    val rels = "<Relationship\\s[^>]*>".r.findAllIn(relsXml).flatMap { tag =>
      for {
        id <- "\\bId=\"([^\"]+)\"".r.findFirstMatchIn(tag).map(_.group(1))
        t <- "\\bTarget=\"([^\"]+)\"".r.findFirstMatchIn(tag).map(_.group(1))
      } yield id -> t
    }.toMap
    DocxParts(xml, rels, media.result())
  }

  private val blockRe =
    "(?s)(<w:tbl[ >].*?</w:tbl>)|(<w:p[ >].*?</w:p>|<w:p/>)".r
  private val runRe = "(?s)<w:r[ >].*?</w:r>".r
  private val textRe = "(?s)<w:t(?: [^>]*)?>(.*?)</w:t>".r
  private val headingRe = "<w:pStyle [^>]*w:val=\"Heading(\\d)\"".r
  private val boldRe = "<w:b(?:\\s[^>]*)?/>".r
  private val rowRe = "(?s)<w:tr[ >].*?</w:tr>".r
  private val cellRe = "(?s)<w:tc[ >].*?</w:tc>".r
  private val paraRe = "(?s)<w:p[ >].*?</w:p>|<w:p/>".r
  private val drawingRe = "(?s)<w:drawing>.*?</w:drawing>".r
  private val extentRe = "<wp:extent[^>]*\\bcx=\"(\\d+)\"[^>]*\\bcy=\"(\\d+)\"".r
  private val blipRe = "<a:blip\\s[^>]*\\br:embed=\"([^\"]+)\"".r
  private val EmuPerPoint = 12700.0

  /** DOCX -> structured blocks. The scanning regex consumes whole
    * tables first, so cell paragraphs never leak as top-level
    * paragraphs. Raster images (PNG/JPEG drawings) become
    * [[DocxImage]] blocks after their paragraph's text, sized from the
    * declared wp:extent (EMU -> pt); WMF/EMF and all other non-text,
    * non-raster content is dropped entirely, the P21 semantic
    * (scraper_glostrup.py:69-74). */
  def docxToBlocks(docx: Array[Byte]): Seq[DocxBlock] = {
    val parts = docxParts(docx)
    val xml = parts.xml
    def imagesOf(p: String): Seq[DocxImage] =
      drawingRe.findAllIn(p).flatMap { dr =>
        for {
          blip <- blipRe.findFirstMatchIn(dr).map(_.group(1))
          target <- parts.rels.get(blip)
          bytes <- parts.media.get("word/" + target)
          ext <- extentRe.findFirstMatchIn(dr)
        } yield DocxImage(bytes,
          ext.group(1).toLong / EmuPerPoint,
          ext.group(2).toLong / EmuPerPoint)
      }.toSeq
    def runs(p: String): Seq[(String, Boolean)] = {
      val rs = runRe.findAllIn(p).map { r =>
        val bold = boldRe.findFirstIn(r)
          .exists(b => !b.contains("\"0\"") && !b.contains("\"false\""))
        val text = textRe.findAllMatchIn(r)
          .map(m => HtmlParser.unescape(m.group(1))).mkString
        (text, bold)
      }.filter(_._1.nonEmpty).toSeq
      // coalesce adjacent runs of equal style (Word splits arbitrarily)
      rs.foldLeft(Vector.empty[(String, Boolean)]) {
        case (acc :+ ((t, b)), (t2, b2)) if b == b2 => acc :+ (t + t2, b)
        case (acc, r) => acc :+ r
      }
    }
    blockRe.findAllMatchIn(xml).flatMap { m =>
      if (m.group(1) != null) {
        Seq(DocxTable(rowRe.findAllIn(m.group(1)).map { tr =>
          cellRe.findAllIn(tr).map { tc =>
            // paragraph-per-paragraph, joined with a space: two cell
            // paragraphs "Budget" / "2024" read "Budget 2024", not
            // "Budget2024"
            val paras = paraRe.findAllIn(tc)
              .map(p => textRe.findAllMatchIn(p)
                .map(x => HtmlParser.unescape(x.group(1))).mkString)
              .filter(_.nonEmpty).toSeq
            if (paras.nonEmpty) paras.mkString(" ")
            else textRe.findAllMatchIn(tc)
              .map(x => HtmlParser.unescape(x.group(1))).mkString
          }.toSeq
        }.toSeq))
      } else {
        val p = m.group(2)
        val text = headingRe.findFirstMatchIn(p) match {
          case Some(h) => Seq(DocxHeading(h.group(1).toInt, runs(p)))
          case None =>
            val rs = runs(p)
            if (rs.nonEmpty) Seq(DocxPara(rs)) else Seq.empty
        }
        val imgs = imagesOf(p)
        // preserve empty paragraphs only when they carry no image
        // (vertical rhythm), matching the old output byte-for-byte on
        // image-free documents
        if (text.isEmpty && imgs.isEmpty) Seq(DocxPara(Seq.empty))
        else text ++ imgs
      }
    }.toSeq
  }

  /** DOCX -> plain text: paragraph per line, table rows as
    * pipe-joined cells. Mirrors mammoth's text extraction semantics
    * minus styling (scraper_glostrup.py:42-66). */
  def docxToText(docx: Array[Byte]): String =
    docxToBlocks(docx).flatMap {
      case DocxHeading(_, runs) => Seq(runs.map(_._1).mkString)
      case DocxPara(runs) => Seq(runs.map(_._1).mkString)
      case DocxTable(rows) => rows.map(_.mkString(" | "))
      case DocxImage(_, _, _) => Seq.empty // text extraction: skip
    }.mkString("\n")

  /** B1: DOCX -> PDF with structure fidelity toward the
    * mammoth+WeasyPrint render (scraper_glostrup.py:42-100): headings
    * become larger bold lines with leading space, bold runs keep
    * their weight inside wrapped paragraphs, table rows render as
    * pipe-joined lines, and embedded PNG/JPEG drawings render as
    * image XObjects at their declared size (downscaled to the text
    * column; formats [[ImageCodec]] can't decode are dropped, the old
    * behavior). Pagination is incremental: an image consumes its
    * height in line slots and never straddles a page break. */
  def docxToPdf(docx: Array[Byte]): Array[Byte] = {
    val startY = 770
    val leading = 16
    val pages = scala.collection.mutable.ArrayBuffer[MiniPdf.StyledPage]()
    var lines = Vector.empty[MiniPdf.StyledLine]
    var images = Vector.empty[MiniPdf.PlacedImage]
    def flush(): Unit =
      if (lines.nonEmpty || images.nonEmpty) {
        pages += MiniPdf.StyledPage(lines, images = images)
        lines = Vector.empty
        images = Vector.empty
      }
    def addLine(l: MiniPdf.StyledLine): Unit = {
      if (lines.size >= LinesPerPage) flush()
      lines :+= l
    }
    docxToBlocks(docx).foreach {
      case DocxHeading(level, runs) =>
        if (lines.nonEmpty || pages.nonEmpty)
          addLine(MiniPdf.StyledLine(Seq.empty))
        val size = math.max(15 - level, 12)
        wrapSegs(runs.map { case (t, _) => (t, true) }).foreach(segs =>
          addLine(MiniPdf.StyledLine(segs, fontSize = size)))
      case DocxPara(runs) =>
        wrapSegs(runs).foreach(segs => addLine(MiniPdf.StyledLine(segs)))
      case DocxTable(rows) =>
        rows.foreach { r =>
          wrapSegs(Seq((r.mkString(" | "), false))).foreach(segs =>
            addLine(MiniPdf.StyledLine(segs)))
        }
      case DocxImage(data, w0, h0) =>
        ImageCodec.decode(data).foreach { img =>
          val maxW = 451.0 // text column width
          val maxH = (LinesPerPage - 2).toDouble * leading
          val wDecl = if (w0 > 0) w0 else img.width.toDouble
          val hDecl = if (h0 > 0) h0 else img.height.toDouble
          val sc = math.min(1.0, math.min(maxW / wDecl, maxH / hDecl))
          val w = wDecl * sc
          val h = hDecl * sc
          val slots = math.ceil(h / leading).toInt + 1
          if (lines.size + slots > LinesPerPage) flush()
          val yBottom = startY - (lines.size + slots - 1) * leading
          images :+= MiniPdf.PlacedImage(img, 72.0, yBottom, w, h)
          lines ++= Vector.fill(slots)(MiniPdf.StyledLine(Seq.empty))
        }
    }
    flush()
    if (pages.isEmpty)
      pages += MiniPdf.StyledPage(Seq(MiniPdf.StyledLine(Seq.empty)))
    MiniPdf.makeStyledPdf(pages.toSeq)
  }

  /** Greedy column-budget wrap that preserves run boundaries (and so
    * bold spans); splits inside over-long runs like the plain wrap. */
  private def wrapSegs(runs: Seq[(String, Boolean)],
      max: Int = MaxCols): Seq[Seq[MiniPdf.Seg]] = {
    val out = scala.collection.mutable.ArrayBuffer[Seq[MiniPdf.Seg]]()
    var cur = Vector.empty[MiniPdf.Seg]
    var len = 0
    runs.foreach { case (t0, b) =>
      var t = t0
      while (t.nonEmpty) {
        if (len == max) { out += cur; cur = Vector.empty; len = 0 }
        val take = math.min(max - len, t.length)
        cur = cur :+ MiniPdf.Seg(t.take(take), b)
        len += take
        t = t.drop(take)
      }
    }
    if (cur.nonEmpty || out.isEmpty) out += cur
    out.toSeq
  }

  // ---------------------------------------------------------- B2/B3
  /** Selectors hidden before print (B3's cleanup-JS semantic,
    * scraper_svendborg.py:229-268: nav/cookie/footer suppression). */
  val defaultHideSelectors: Seq[String] =
    Seq("nav", "header", "footer", "script", "style", "#cookie-banner",
      ".cookie", ".navigation")

  /** HTML -> visible text lines: parse, drop hidden/cruft subtrees,
    * emit block-level text in document order. */
  def htmlToText(html: String,
      hide: Seq[String] = defaultHideSelectors): String = {
    val root = HtmlParser.parse(html)
    val hidden = hide.flatMap(sel => HtmlParser.select(root, sel)).toSet
    val blocks = Seq("h1", "h2", "h3", "h4", "p", "li", "tr", "div")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(n: HtmlParser.Node): Unit = {
      if (hidden.contains(n)) return
      val isBlockLeaf = blocks.contains(n.tag) &&
        !n.descendants.exists(d => blocks.contains(d.tag))
      if (isBlockLeaf) { val t = n.text; if (t.nonEmpty) out += t }
      else n.children.foreach(walk)
    }
    walk(root)
    out.mkString("\n")
  }

  /** B2/B3: HTML -> PDF. */
  def htmlToPdf(html: String): Array[Byte] = {
    val text = htmlToText(html)
    val lines = wrap(text.split("\n").toSeq)
    MiniPdf.makePdf(paginate(if (lines.isEmpty) Seq("") else lines))
  }

  // ------------------------------------------------------------- B4
  def makeCover(title: String, date: String,
      participants: Seq[String]): Array[Byte] =
    MiniPdf.makeCover(title, date, participants)

  // ------------------------------------------------------------- B5 / A5
  /** Typed merge Aggregator: fold (order, pdf) parts into one document
    * in part order — the reference's cover+items merge
    * (scraper_ringkoebing_skjern.py:188-243) as a groupBy aggregate. */
  class MergePdfs extends Aggregator[(Int, Array[Byte]),
      Seq[(Int, Array[Byte])], Array[Byte]] {
    def zero: Seq[(Int, Array[Byte])] = Seq.empty
    def reduce(b: Seq[(Int, Array[Byte])],
        a: (Int, Array[Byte])): Seq[(Int, Array[Byte])] = b :+ a
    def merge(b1: Seq[(Int, Array[Byte])],
        b2: Seq[(Int, Array[Byte])]): Seq[(Int, Array[Byte])] = b1 ++ b2
    def finish(b: Seq[(Int, Array[Byte])]): Array[Byte] =
      MiniPdf.merge(b.sortBy(_._1).map(_._2))
    def bufferEncoder: Encoder[Seq[(Int, Array[Byte])]] =
      Encoders.kryo[Seq[(Int, Array[Byte])]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** merge_pdfs(idx, pdf) aggregate column. */
  def mergePdfs(idx: Column, pdf: Column): Column =
    udaf(new MergePdfs()).apply(idx.cast("int"), pdf)

  // ------------------------------------------------------------- A6
  /** HTML document assembly: fold per-item sections (sorted by number)
    * under a meeting header into one styled HTML doc
    * (scraper_copenhagen.py:197-230). Pure column expression. */
  def assembleHtml(title: Column, sections: Column): Column =
    concat(
      lit("<html><head><meta charset=\"utf-8\"/></head><body><h1>"),
      title, lit("</h1>"),
      array_join(sections, ""),
      lit("</body></html>"))

  // --------------------------------------------------------- UDFs
  /** Registered row-level UDF forms (non-deterministic NOT set — these
    * are pure; Catalyst may collapse/reorder them freely). */
  val docxToPdfUdf = udf((b: Array[Byte]) => if (b == null) null else docxToPdf(b))
  val htmlToPdfUdf = udf((s: String) => if (s == null) null else htmlToPdf(s))
  val makeCoverUdf = udf((t: String, d: String, p: Seq[String]) =>
    makeCover(Option(t).getOrElse(""), Option(d).getOrElse(""),
      Option(p).getOrElse(Seq.empty)))
  val pageCountUdf = udf((b: Array[Byte]) => if (b == null) 0 else MiniPdf.pageCount(b))

  // ------------------------------------------------------- helpers
  private val MaxCols = 90
  private val LinesPerPage = 44

  private def wrap(lines: Seq[String]): Seq[String] =
    lines.flatMap { l =>
      if (l.length <= MaxCols) Seq(l)
      else l.grouped(MaxCols).toSeq
    }

  private def paginate(lines: Seq[String]): Seq[MiniPdf.Page] = {
    val ls = if (lines.isEmpty) Seq("") else lines
    ls.grouped(LinesPerPage).map(g => MiniPdf.Page(g)).toSeq
  }
}
