package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.doc.{DocKernels, ImageCodec, MiniPdf}

/** Golden tests for the document kernels (B1-B5, A5/A6) per
  * FIXTURES.md §5: page counts, merge order, cover fields. */
class DocSpec extends SparkTestBase {
  import spark.implicits._

  test("makeCover produces a one-page PDF with title/date/participants (B4)") {
    val pdf = MiniPdf.makeCover("Økonomiudvalget", "2025-11-19",
      Seq("Anna", "Bo", "Carla"))
    assert(MiniPdf.pageCount(pdf) == 1)
    val text = MiniPdf.extractText(pdf).mkString("\n")
    assert(text.contains("konomiudvalget"))
    assert(text.contains("Dato: 2025-11-19"))
    assert(text.contains("* Anna") && text.contains("* Carla"))
    assert(new String(pdf.take(5), "ISO-8859-1") == "%PDF-")
  }

  test("makePdf paginates long content (44 lines/page)") {
    val lines = (1 to 100).map(i => s"line $i")
    val pdf = MiniPdf.makePdf(lines.grouped(44).map(g => MiniPdf.Page(g)).toSeq)
    assert(MiniPdf.pageCount(pdf) == 3)
    val text = MiniPdf.extractText(pdf)
    assert(text.head == "line 1" && text.last == "line 100")
  }

  test("merge preserves page count and order (B5)") {
    val a = MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("doc A page 1")),
      MiniPdf.Page(Seq("doc A page 2"))))
    val b = MiniPdf.makeCover("Cover B", "2025-01-01", Seq("X"))
    val c = MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("doc C"))))
    val merged = MiniPdf.merge(Seq(b, a, c)) // cover first, then parts
    assert(MiniPdf.pageCount(merged) == 4)
    val text = MiniPdf.extractText(merged)
    assert(text.indexOf("Cover B") < text.indexOf("doc A page 1"))
    assert(text.indexOf("doc A page 2") < text.indexOf("doc C"))
  }

  test("mergePdfs aggregator folds parts per group in part order (A5)") {
    val p0 = MiniPdf.makeCover("Cover", "2025-01-01", Seq("A"))
    val p1 = MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("item one"))))
    val p2 = MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("item two"))))
    // deliberately out-of-order rows; aggregator must sort by idx
    val df = Seq(("m1", 2, p2), ("m1", 0, p0), ("m1", 1, p1),
      ("m2", 0, p1)).toDF("meeting", "idx", "pdf")
    val out = df.groupBy($"meeting")
      .agg(DocKernels.mergePdfs($"idx", $"pdf").as("merged"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(MiniPdf.pageCount(out("m1")) == 3)
    val t1 = MiniPdf.extractText(out("m1"))
    assert(t1.indexOf("Cover") < t1.indexOf("item one"))
    assert(t1.indexOf("item one") < t1.indexOf("item two"))
    assert(MiniPdf.pageCount(out("m2")) == 1)
  }

  private def fakeDocx(paragraphs: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("[Content_Types].xml"))
    zos.write("<Types/>".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    val body = paragraphs.map(p =>
      s"<w:p><w:r><w:t>$p</w:t></w:r></w:p>").mkString
    zos.write(
      s"""<?xml version="1.0"?><w:document><w:body>$body</w:body></w:document>"""
        .getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  test("docxToText extracts paragraph runs from the zip (B1)") {
    val docx = fakeDocx(Seq("Referat af m&amp;de", "Punkt 1: Budget"))
    val text = DocKernels.docxToText(docx)
    assert(text == "Referat af m&de\nPunkt 1: Budget")
  }

  test("docxToPdf renders extracted text (B1)") {
    val pdf = DocKernels.docxToPdf(fakeDocx(Seq("Hello", "World")))
    assert(MiniPdf.pageCount(pdf) == 1)
    val t = MiniPdf.extractText(pdf)
    assert(t.contains("Hello") && t.contains("World"))
  }

  /** A DOCX with heading + mixed-weight runs + a 2x2 table. */
  private def structuredDocx: Array[Byte] = {
    val body =
      """<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>
        |<w:r><w:t>Referat</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Punkt 1: </w:t></w:r>
        |<w:r><w:rPr><w:b/></w:rPr><w:t>Budget</w:t></w:r>
        |<w:r><w:rPr><w:b/></w:rPr><w:t> vedtaget</w:t></w:r>
        |<w:r><w:t> uden bem&amp;rkninger</w:t></w:r></w:p>
        |<w:tbl><w:tr><w:tc><w:p><w:r><w:t>Navn</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:t>Rolle</w:t></w:r></w:p></w:tc></w:tr>
        |<w:tr><w:tc><w:p><w:r><w:t>Anne</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:t>Formand</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
        |""".stripMargin.replace("\n", "")
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(
      s"""<?xml version="1.0"?><w:document><w:body>$body</w:body></w:document>"""
        .getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  test("docxToBlocks: heading level, coalesced bold runs, table cells (B1)") {
    val blocks = DocKernels.docxToBlocks(structuredDocx)
    assert(blocks == Seq(
      // run-level style is reported as written (no <w:b/> on the
      // heading run); the renderer bolds headings itself
      DocKernels.DocxHeading(1, Seq(("Referat", false))),
      // adjacent same-style runs coalesce; bold span survives
      DocKernels.DocxPara(Seq(("Punkt 1: ", false),
        ("Budget vedtaget", true), (" uden bem&rkninger", false))),
      DocKernels.DocxTable(Seq(Seq("Navn", "Rolle"), Seq("Anne", "Formand")))))
    // cell paragraphs never leak as top-level paragraphs
    assert(!blocks.exists {
      case DocKernels.DocxPara(rs) => rs.exists(_._1 == "Anne")
      case _ => false
    })
  }

  test("docxToPdf structured render: bold heading/runs, table rows (B1)") {
    val pdf = DocKernels.docxToPdf(structuredDocx)
    val runs = MiniPdf.extractTextWithFonts(pdf)
    // the heading renders bold (F2); the bold span keeps its weight
    assert(runs.contains(("Referat", "F2")))
    assert(runs.contains(("Budget vedtaget", "F2")))
    assert(runs.contains(("Punkt 1: ", "F1")))
    // table rows are pipe-joined plain lines
    assert(runs.contains(("Navn | Rolle", "F1")))
    assert(runs.contains(("Anne | Formand", "F1")))
    // plain-text extraction sees everything in order
    val txt = MiniPdf.extractText(pdf).mkString("\n")
    assert(txt.indexOf("Referat") < txt.indexOf("Punkt 1: "))
    assert(txt.indexOf("Punkt 1: ") < txt.indexOf("Navn | Rolle"))
  }

  test("multi-paragraph table cells keep word boundaries (B1)") {
    val body =
      """<w:tbl><w:tr><w:tc><w:p><w:r><w:t>Budget</w:t></w:r></w:p>
        |<w:p><w:r><w:t>2024</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"""
        .stripMargin.replace("\n", "")
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(s"<w:document><w:body>$body</w:body></w:document>"
      .getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val blocks = DocKernels.docxToBlocks(bos.toByteArray)
    assert(blocks == Seq(DocKernels.DocxTable(Seq(Seq("Budget 2024")))))
  }

  test("docxToText flattens headings and tables to lines (B1)") {
    val txt = DocKernels.docxToText(structuredDocx)
    assert(txt == "Referat\nPunkt 1: Budget vedtaget uden bem&rkninger\n" +
      "Navn | Rolle\nAnne | Formand")
  }

  test("merged styled+plain PDFs keep both font resources (B5)") {
    val styled = DocKernels.docxToPdf(structuredDocx)
    val plain = MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("cover"))))
    val merged = MiniPdf.merge(Seq(plain, styled))
    assert(MiniPdf.pageCount(merged) == 2)
    val runs = MiniPdf.extractTextWithFonts(merged)
    assert(runs.contains(("cover", "F1")))
    assert(runs.contains(("Referat", "F2")))
  }

  test("htmlToText keeps content blocks, hides nav/footer/cookie (B2/B3)") {
    val html =
      """<html><body><nav>menu items</nav>
        |<h1>Referat</h1><p>Punkt 1 besluttet</p>
        |<div class="cookie">accept cookies</div>
        |<footer>kontakt os</footer></body></html>""".stripMargin
    val text = DocKernels.htmlToText(html)
    assert(text.contains("Referat") && text.contains("Punkt 1 besluttet"))
    assert(!text.contains("menu") && !text.contains("cookies")
      && !text.contains("kontakt"))
  }

  test("assembleHtml + htmlToPdf: meeting document synthesis (A6/B2)") {
    val df = Seq(
      ("m1", 2, "<p>Punkt 2: Plan</p>"),
      ("m1", 1, "<p>Punkt 1: Budget</p>"))
      .toDF("meeting", "number", "section")
    val assembled = df.groupBy($"meeting")
      .agg(sort_array(collect_list(struct($"number", $"section")))
        .as("parts"))
      .select($"meeting", DocKernels.assembleHtml(lit("Økonomiudvalget"),
        expr("transform(parts, p -> p.section)")).as("html"))
      .withColumn("pdf", DocKernels.htmlToPdfUdf($"html"))
      .collect()(0)
    val html = assembled.getString(1)
    assert(html.indexOf("Punkt 1") < html.indexOf("Punkt 2"))
    val pdf = assembled.getAs[Array[Byte]](2)
    assert(MiniPdf.pageCount(pdf) == 1)
    val t = MiniPdf.extractText(pdf).mkString(" ")
    assert(t.contains("Punkt 1: Budget") && t.contains("Punkt 2: Plan"))
  }

  // ------------------------------------------------ B1 image fidelity

  /** DOCX with one text paragraph and one embedded drawing: document
    * body references rId7, the rels part maps it to word/media, and
    * the declared extent is 72pt x 48pt (914400 x 609600 EMU). */
  private def imageDocx(img: Array[Byte], ext: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    val body =
      "<w:p><w:r><w:t>Figur 1</w:t></w:r></w:p>" +
        "<w:p><w:r><w:drawing><wp:inline>" +
        "<wp:extent cx=\"914400\" cy=\"609600\"/>" +
        "<a:blip r:embed=\"rId7\"/>" +
        "</wp:inline></w:drawing></w:r></w:p>"
    zos.write(s"<w:document><w:body>$body</w:body></w:document>"
      .getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("word/_rels/document.xml.rels"))
    zos.write(("<Relationships><Relationship " +
      s"""Target="media/image1.$ext" Id="rId7"/></Relationships>""")
      .getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry(s"word/media/image1.$ext"))
    zos.write(img)
    zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  /** Minimal baseline JPEG: SOI + SOF0 carrying the dimensions + EOI —
    * enough for the DCTDecode passthrough path, which only sniffs. */
  private def tinyJpeg(w: Int, h: Int): Array[Byte] =
    (Array(0xFF, 0xD8,
      0xFF, 0xC0, 0x00, 0x11, 0x08,
      (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF, 0x03,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1,
      0xFF, 0xD9)).map(_.toByte)

  test("ImageCodec decodes its own PNG output back to raw samples") {
    val rgb = Array.tabulate(18)(i => (i * 7).toByte)
    val png = ImageCodec.encodePngRgb(3, 2, rgb)
    val img = ImageCodec.decode(png).get
    assert(img.width == 3 && img.height == 2)
    assert(img.colorSpace == "DeviceRGB")
    assert(img.filter.contains("FlateDecode"))
    val inf = new java.util.zip.Inflater()
    inf.setInput(img.bytes)
    val out = new Array[Byte](18)
    assert(inf.inflate(out) == 18 && inf.finished())
    assert(out.sameElements(rgb))
  }

  /** Assemble a PNG from pre-filtered scanline bytes — lets the specs
    * exercise decode filters 1-4, which libpng-produced (real Word)
    * images always use and the filter-0-only encoder never emits. */
  private def pngFromFiltered(w: Int, h: Int, colorType: Int,
      filtered: Array[Byte], plte: Array[Byte] = null,
      interlace: Int = 0, bitDepth: Int = 8): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32(); crc.update(body)
      val c = crc.getValue.toInt
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
    chunk("IHDR", ihdr.array())
    if (plte != null) chunk("PLTE", plte)
    chunk("IDAT", ImageCodec.deflate(filtered))
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  test("PNG decode expands palette (colorType 3) through PLTE to RGB") {
    // 2x1, two palette entries: index 1 = (200,100,50), index 0 = (1,2,3)
    val plte = Array[Byte](1, 2, 3, 200.toByte, 100, 50)
    val png = pngFromFiltered(2, 1, 3, Array[Byte](0, 1, 0), plte)
    val img = ImageCodec.decode(png).get
    assert(img.colorSpace == "DeviceRGB" && img.width == 2)
    val inf = new java.util.zip.Inflater(); inf.setInput(img.bytes)
    val got = new Array[Byte](6)
    assert(inf.inflate(got) == 6)
    assert(got.sameElements(Array[Byte](200.toByte, 100, 50, 1, 2, 3)))
    // an index past the palette is malformed -> dropped, not a crash
    assert(ImageCodec.decode(
      pngFromFiltered(2, 1, 3, Array[Byte](0, 5, 0), plte)).isEmpty)
  }

  test("PNG decode handles Sub/Up/Average/Paeth filtered rows") {
    // 2x4 RGB image, known pixels; forward-filter each row with a
    // different filter type per the PNG spec, then decode must
    // reconstruct the original samples
    val w = 2; val ch = 3; val stride = w * ch
    val px = Array.tabulate(4 * stride)(i => ((i * 37 + 11) % 251).toByte)
    def p(r: Int, c: Int): Int = px(r * stride + c) & 0xFF
    val filtered = new Array[Byte](4 * (stride + 1))
    val types = Array(1, 2, 3, 4) // Sub, Up, Average, Paeth
    for (r <- 0 until 4) {
      filtered(r * (stride + 1)) = types(r).toByte
      for (c <- 0 until stride) {
        val a = if (c >= ch) p(r, c - ch) else 0
        val b = if (r > 0) p(r - 1, c) else 0
        val cc = if (r > 0 && c >= ch) p(r - 1, c - ch) else 0
        val paeth = {
          val q = a + b - cc
          val pa = math.abs(q - a); val pb = math.abs(q - b)
          val pc = math.abs(q - cc)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
        }
        val pred = types(r) match {
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth
        }
        filtered(r * (stride + 1) + 1 + c) = ((p(r, c) - pred) & 0xFF).toByte
      }
    }
    val img = ImageCodec.decode(pngFromFiltered(w, 4, 2, filtered)).get
    assert(img.width == 2 && img.height == 4)
    val inf = new java.util.zip.Inflater()
    inf.setInput(img.bytes)
    val got = new Array[Byte](px.length)
    assert(inf.inflate(got) == px.length)
    assert(got.sameElements(px))
  }

  test("PNG decode: RGBA drops alpha, grayscale maps to DeviceGray") {
    // 1x2 RGBA (filter 0): pixels (10,20,30,255) and (40,50,60,128)
    val rgba = pngFromFiltered(1, 2, 6, Array[Byte](
      0, 10, 20, 30, 255.toByte,
      0, 40, 50, 60, 128.toByte))
    val ia = ImageCodec.decode(rgba).get
    assert(ia.colorSpace == "DeviceRGB")
    val inf = new java.util.zip.Inflater(); inf.setInput(ia.bytes)
    val got = new Array[Byte](6)
    assert(inf.inflate(got) == 6)
    assert(got.sameElements(Array[Byte](10, 20, 30, 40, 50, 60)))
    // 2x1 grayscale (filter 1/Sub: 7, then delta 5 -> 12)
    val gray = pngFromFiltered(2, 1, 0, Array[Byte](1, 7, 5))
    val ig = ImageCodec.decode(gray).get
    assert(ig.colorSpace == "DeviceGray")
    val inf2 = new java.util.zip.Inflater(); inf2.setInput(ig.bytes)
    val got2 = new Array[Byte](2)
    assert(inf2.inflate(got2) == 2)
    assert(got2.sameElements(Array[Byte](7, 12)))
  }

  test("docxToPdf embeds a PNG drawing as an image XObject (B1)") {
    val png = ImageCodec.encodePngRgb(3, 2,
      Array.tabulate(18)(i => (i * 11).toByte))
    val pdf = DocKernels.docxToPdf(imageDocx(png, "png"))
    assert(MiniPdf.pageCount(pdf) == 1)
    assert(MiniPdf.imageCount(pdf) == 1)
    assert(MiniPdf.imageInfos(pdf) ==
      Seq((3, 2, "DeviceRGB", "FlateDecode")))
    // the paragraph text still renders, and the content stream places
    // the image at its declared 72x48 pt size
    assert(MiniPdf.extractText(pdf).contains("Figur 1"))
    val s = new String(pdf, "ISO-8859-1")
    assert(s.contains("72.00 0 0 48.00") && s.contains("/Im0 Do"))
  }

  test("docxToPdf embeds a JPEG drawing via DCTDecode passthrough (B1)") {
    val jpg = tinyJpeg(40, 30)
    val pdf = DocKernels.docxToPdf(imageDocx(jpg, "jpg"))
    assert(MiniPdf.imageInfos(pdf) ==
      Seq((40, 30, "DeviceRGB", "DCTDecode")))
    // passthrough: the JPEG bytes ride inside the PDF verbatim
    assert(new String(pdf, "ISO-8859-1")
      .contains(new String(jpg, "ISO-8859-1")))
  }

  test("undecodable image formats are dropped, not fatal (B1/P21)") {
    val wmf = Array.tabulate(64)(_.toByte) // not a PNG/JPEG signature
    val pdf = DocKernels.docxToPdf(imageDocx(wmf, "wmf"))
    assert(MiniPdf.imageCount(pdf) == 0)
    assert(MiniPdf.extractText(pdf).contains("Figur 1"))
  }

  test("merge carries image XObjects with page-local names (B5+B1)") {
    val png = ImageCodec.encodePngRgb(3, 2,
      Array.tabulate(18)(i => (i * 3).toByte))
    val imgDoc = DocKernels.docxToPdf(imageDocx(png, "png"))
    val cover = MiniPdf.makeCover("Cover", "2025-01-01", Seq("A"))
    val merged = MiniPdf.merge(Seq(cover, imgDoc))
    assert(MiniPdf.pageCount(merged) == 2)
    assert(MiniPdf.imageCount(merged) == 1)
    assert(MiniPdf.imageInfos(merged) ==
      Seq((3, 2, "DeviceRGB", "FlateDecode")))
    val text = MiniPdf.extractText(merged)
    assert(text.indexOf("Cover") < text.indexOf("Figur 1"))
  }

  test("binaryFile scan reads documents as (path, content) rows (S13)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin_")
    java.nio.file.Files.write(dir.resolve("a.pdf"),
      MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("doc a")))))
    java.nio.file.Files.write(dir.resolve("b.pdf"),
      MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("b1")), MiniPdf.Page(Seq("b2")))))
    val df = spark.read.format("binaryFile").load(dir.toString)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        DocKernels.pageCountUdf(col("content")).as("pages"))
    val out = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a.pdf" -> 1, "b.pdf" -> 2))
  }

  test("pageCountUdf works on a DataFrame of documents") {
    val pdfs = Seq(
      ("a", MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("x"))))),
      ("b", MiniPdf.makePdf(Seq(MiniPdf.Page(Seq("y")), MiniPdf.Page(Seq("z"))))))
      .toDF("id", "pdf")
    val counts = pdfs.select($"id", DocKernels.pageCountUdf($"pdf").as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(counts == Map("a" -> 1, "b" -> 2))
  }

  test("hostile PNG with negative chunk length is dropped, not a hang") {
    // chunk len 0xFFFFFFF4 = -12 over an ancillary type: the pre-fix walk
    // left `i` un-advanced (dataAt + len + 4 == i), an infinite loop
    val evil = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A,
      0x0A, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xF4.toByte,
      't', 'E', 'X', 't')
    assert(ImageCodec.decode(evil).isEmpty)
    // and a huge positive len must not wrap dataAt + len past the array
    val wrap = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A,
      0x0A, 0x7F.toByte, 0xFF.toByte, 0xFF.toByte, 0xF0.toByte,
      'I', 'D', 'A', 'T')
    assert(ImageCodec.decode(wrap).isEmpty)
  }

  test("hostile IHDR dimensions are dropped, not an overflow crash") {
    // width 2^29 x height 8 RGB: stride*height overflows Int to a
    // negative allocation size pre-fix (NegativeArraySizeException)
    val png = pngFromFiltered(0x20000000, 8, 2, Array[Byte](0))
    assert(ImageCodec.decode(png).isEmpty)
  }

  private def inflated(img: ImageCodec.PdfImage, n: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(); inf.setInput(img.bytes)
    val got = new Array[Byte](n)
    assert(inf.inflate(got) == n)
    got
  }

  test("1-bit gray PNG unpacks MSB-first across byte boundaries") {
    // 10px row spans two packed bytes: 1011 0010 | 11xx xxxx
    val px = Array(1, 0, 1, 1, 0, 0, 1, 0, 1, 1)
    val png = pngFromFiltered(10, 1, 0,
      Array[Byte](0, 0xB2.toByte, 0xC0.toByte), bitDepth = 1)
    val img = ImageCodec.decode(png).get
    assert(img.colorSpace == "DeviceGray" && img.bitsPerComponent == 8)
    // gray scales to full range: 1 -> 255
    assert(inflated(img, 10).sameElements(px.map(v => (v * 255).toByte)))
  }

  test("4-bit palette PNG unpacks indexes unscaled through PLTE") {
    // 3px = indexes 1,0,2 packed as 0x10 0x20
    val plte = Array[Byte](1, 2, 3, 40, 50, 60, 70, 80, 90)
    val png = pngFromFiltered(3, 1, 3, Array[Byte](0, 0x10, 0x20),
      plte = plte, bitDepth = 4)
    val img = ImageCodec.decode(png).get
    assert(img.colorSpace == "DeviceRGB")
    assert(inflated(img, 9).sameElements(
      Array[Byte](40, 50, 60, 1, 2, 3, 70, 80, 90)))
  }

  test("gray+alpha PNG (colorType 4) drops alpha to DeviceGray") {
    val png = pngFromFiltered(2, 1, 4,
      Array[Byte](0, 10, 200.toByte, 20, 100))
    val img = ImageCodec.decode(png).get
    assert(img.colorSpace == "DeviceGray" && img.width == 2)
    assert(inflated(img, 2).sameElements(Array[Byte](10, 20)))
    // spec-invalid combos (4-bit RGB) are malformed -> None, uncounted
    val before = ImageCodec.unsupportedDrops.get
    assert(ImageCodec.decode(
      pngFromFiltered(2, 1, 2, Array[Byte](0, 0x12, 0x34, 0x56),
        bitDepth = 4)).isEmpty)
    assert(ImageCodec.unsupportedDrops.get == before)
  }

  test("Adam7-interlaced 1-bit PNG defilters per pass at packed stride") {
    // 5x3 1-bit gray, interlaced: pass rows pack their OWN widths
    val w = 5; val h = 3
    val px = Array.tabulate(h * w)(i => (i * 5 + 1) % 3 min 1)
    val startCol = Array(0, 4, 0, 2, 0, 1, 0)
    val startRow = Array(0, 0, 4, 0, 2, 0, 1)
    val colInc = Array(8, 8, 4, 4, 2, 2, 1)
    val rowInc = Array(8, 8, 8, 4, 4, 2, 2)
    val idat = new ByteArrayOutputStream()
    for (p <- 0 until 7) {
      val ys = startRow(p) until h by rowInc(p)
      val xs = startCol(p) until w by colInc(p)
      if (ys.nonEmpty && xs.nonEmpty) ys.foreach { y =>
        idat.write(0)
        val bits = xs.map(x => px(y * w + x))
        bits.grouped(8).foreach { g =>
          idat.write(g.zipWithIndex.map { case (b, i) => b << (7 - i) }.sum)
        }
      }
    }
    val png = pngFromFiltered(w, h, 0, idat.toByteArray, interlace = 1,
      bitDepth = 1)
    val img = ImageCodec.decode(png).get
    assert(img.width == w && img.height == h)
    assert(inflated(img, h * w).sameElements(px.map(v => (v * 255).toByte)))
  }

  test("16-bit gray PNG decodes, keeping each sample's high byte") {
    // 2x1 gray16, filter 0: samples 0xFF01, 0x00FE -> 8-bit 0xFF, 0x00
    val png = pngFromFiltered(2, 1, 0,
      Array[Byte](0, 0xFF.toByte, 0x01, 0x00, 0xFE.toByte), bitDepth = 16)
    val img = ImageCodec.decode(png).get
    assert(img.width == 2 && img.height == 1)
    assert(img.colorSpace == "DeviceGray" && img.bitsPerComponent == 8)
    val inf = new java.util.zip.Inflater(); inf.setInput(img.bytes)
    val got = new Array[Byte](2)
    assert(inf.inflate(got) == 2)
    assert(got.sameElements(Array[Byte](0xFF.toByte, 0x00)))
  }

  test("16-bit RGB PNG defilters at the doubled byte distance (Sub)") {
    // 2x1 rgb16 under filter 1 (Sub): the filter's `a` byte sits bpp=6
    // bytes back, not 3 — an 8-bit-only defilter reconstructs garbage
    val p0 = Array(0x12, 0x34, 0x56, 0x78, 0x9A, 0xBC)
    val p1 = Array(0x22, 0x44, 0x60, 0xAA, 0xA0, 0xFF)
    val row = Array(1) ++ p0 ++ p1.zip(p0).map { case (x, a) => (x - a) & 0xFF }
    val png = pngFromFiltered(2, 1, 2, row.map(_.toByte), bitDepth = 16)
    val img = ImageCodec.decode(png).get
    assert(img.colorSpace == "DeviceRGB" && img.bitsPerComponent == 8)
    val inf = new java.util.zip.Inflater(); inf.setInput(img.bytes)
    val got = new Array[Byte](6)
    assert(inf.inflate(got) == 6)
    // high bytes of (0x1234,0x5678,0x9ABC), (0x2244,0x60AA,0xA0FF)
    assert(got.sameElements(Array(0x12, 0x56, 0x9A, 0x22, 0x60, 0xA0)
      .map(_.toByte)))
  }

  /** Minimal 4-component JPEG: SOI + optional Adobe APP14 + SOF0. */
  private def tinyCmykJpeg(w: Int, h: Int, adobe: Boolean): Array[Byte] = {
    val app14 = if (!adobe) Array.empty[Int] else
      Array(0xFF, 0xEE, 0x00, 0x0E, 'A'.toInt, 'd'.toInt, 'o'.toInt,
        'b'.toInt, 'e'.toInt, 0, 100, 0, 0, 0, 0, 2)
    (Array(0xFF, 0xD8) ++ app14 ++
      Array(0xFF, 0xC0, 0x00, 0x14, 0x08,
        (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF, 0x04,
        1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1, 4, 0x11, 1,
        0xFF, 0xD9)).map(_.toByte)
  }

  test("Adobe CMYK JPEG embeds as DeviceCMYK with an inverted Decode") {
    val img = ImageCodec.decode(tinyCmykJpeg(20, 10, adobe = true)).get
    assert(img.colorSpace == "DeviceCMYK" && img.width == 20)
    assert(img.filter.contains("DCTDecode"))
    assert(img.decode.contains("[1 0 1 0 1 0 1 0]"))
    // non-Adobe 4-component: plain DeviceCMYK, samples not inverted
    val plain = ImageCodec.decode(tinyCmykJpeg(20, 10, adobe = false)).get
    assert(plain.colorSpace == "DeviceCMYK" && plain.decode.isEmpty)
    // the Decode array survives the PDF writer and a merge round-trip
    val pdf = DocKernels.docxToPdf(
      imageDocx(tinyCmykJpeg(20, 10, adobe = true), "jpg"))
    assert(new String(pdf, "ISO-8859-1").contains("/Decode [1 0 1 0 1 0 1 0]"))
    val merged = MiniPdf.merge(Seq(pdf))
    assert(new String(merged, "ISO-8859-1")
      .contains("/Decode [1 0 1 0 1 0 1 0]"))
    assert(MiniPdf.imageInfos(merged) ==
      Seq((20, 10, "DeviceCMYK", "DCTDecode")))
  }

  test("PNG decode reassembles an Adam7-interlaced image exactly") {
    // 5x3 grayscale: small enough that several passes are empty (pass 3
    // starts at row 4) and ragged (pass 2 covers only column 4), which
    // is exactly where a wrong pass table or offset bookkeeping shows.
    // Scanlines are generated from the spec's starting/increment tables
    // independently of the decoder's own pass geometry.
    val w = 5; val h = 3
    val px = Array.tabulate(h * w)(i => ((i * 29 + 3) % 251).toByte)
    val startCol = Array(0, 4, 0, 2, 0, 1, 0)
    val startRow = Array(0, 0, 4, 0, 2, 0, 1)
    val colInc = Array(8, 8, 4, 4, 2, 2, 1)
    val rowInc = Array(8, 8, 8, 4, 4, 2, 2)
    val idat = new ByteArrayOutputStream()
    for (p <- 0 until 7) {
      val ys = startRow(p) until h by rowInc(p)
      val xs = startCol(p) until w by colInc(p)
      if (ys.nonEmpty && xs.nonEmpty) ys.foreach { y =>
        val row = xs.map(x => px(y * w + x) & 0xFF)
        if (p == 6) { // Sub-filter the last pass: defilter state must be
          idat.write(1) // per pass, not per image
          row.foldLeft(0) { (last, v) => idat.write((v - last) & 0xFF); v }
        } else { idat.write(0); row.foreach(idat.write) }
      }
    }
    val png = pngFromFiltered(w, h, 0, idat.toByteArray, interlace = 1)
    val img = ImageCodec.decode(png).get
    assert(img.width == w && img.height == h)
    assert(img.colorSpace == "DeviceGray")
    val inf = new java.util.zip.Inflater(); inf.setInput(img.bytes)
    val got = new Array[Byte](h * w)
    assert(inf.inflate(got) == h * w)
    assert(got.sameElements(px))
  }
}
