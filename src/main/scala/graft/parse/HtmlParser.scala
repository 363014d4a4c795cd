package graft.parse

import scala.collection.mutable

/** Minimal, dependency-free HTML parser + CSS-ish selector engine.
  *
  * Purpose-built for the portal dialects the reference scrapes with
  * BeautifulSoup (SURVEY.md §2.3 P24: `find_all('a', ...)`, class/td
  * fingerprints, id lookups — scraper.py:122-123,
  * scraper_copenhagen.py:55-92,125-151). Tolerant of real-world HTML:
  * unclosed tags, void elements, attribute soup, comments, scripts.
  *
  * Selector grammar (whitespace = descendant):
  *   tag  .class  #id  [attr]  [attr=value]  and conjunctions like
  *   `a.row-link`  `tr.agenda--tr`  `#resultTable tbody tr`  `td a`
  */
object HtmlParser {

  final class Node(
      val tag: String,
      val attrs: Map[String, String],
      val parent: Node) {
    val children: mutable.ArrayBuffer[Node] = mutable.ArrayBuffer.empty
    val textParts: mutable.ArrayBuffer[(Int, String)] = mutable.ArrayBuffer.empty
    private var order = 0
    private[HtmlParser] def nextOrder(): Int = { order += 1; order - 1 }

    def attr(name: String): Option[String] = attrs.get(name)
    def classes: Set[String] =
      attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSet

    /** Concatenated descendant text, document order, trimmed. */
    def text: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = {
        val items: Seq[(Int, Either[Node, String])] =
          (n.children.zipWithIndex.map { case (c, _) =>
            (c.docPos, Left(c): Either[Node, String]) } ++
            n.textParts.map { case (p, t) => (p, Right(t): Either[Node, String]) })
            .toSeq.sortBy(_._1)
        items.foreach {
          case (_, Left(c)) => walk(c)
          case (_, Right(t)) => sb.append(t)
        }
      }
      walk(this)
      sb.toString.replaceAll("\\s+", " ").trim
    }

    private[HtmlParser] var docPos: Int = 0

    /** All descendants (document order), self excluded. */
    def descendants: Iterator[Node] =
      children.iterator.flatMap(c => Iterator(c) ++ c.descendants)

    def ancestors: Iterator[Node] =
      Iterator.iterate(parent)(_.parent).takeWhile(_ != null)
  }

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  private val attrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s>]+))?""".r

  /** Parse an HTML document into a tree rooted at a synthetic node. */
  def parse(html: String): Node = {
    val root = new Node("#root", Map.empty, null)
    var cur = root
    var i = 0
    var pos = 0
    val n = html.length
    def addText(t: String): Unit =
      if (t.nonEmpty) { cur.textParts += ((pos, unescape(t))); pos += 1 }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = n }
      else {
        if (lt > i) addText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html(lt + 1) == '!' || html(lt + 1) == '?')) {
          val end = html.indexOf('>', lt)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html(lt + 1) == '/') {
          val end = html.indexOf('>', lt)
          val name = html.substring(lt + 2, if (end < 0) n else end)
            .trim.toLowerCase
          // close the nearest matching open element (tolerates bad nesting)
          var p = cur
          while (p != null && p.tag != name) p = p.parent
          if (p != null && p != root) cur = p.parent
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', lt)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(lt + 1, end)
            val selfClosing = inner.endsWith("/")
            val body = if (selfClosing) inner.dropRight(1) else inner
            val sp = body.indexWhere(Character.isWhitespace)
            val name = (if (sp < 0) body else body.substring(0, sp))
              .trim.toLowerCase
            val attrStr = if (sp < 0) "" else body.substring(sp)
            if (name.nonEmpty && name.forall(c =>
                c.isLetterOrDigit || c == '-' || c == '_')) {
              val attrs = attrRe.findAllMatchIn(attrStr).map { m =>
                val v = Option(m.group(3)).orElse(Option(m.group(4)))
                  .getOrElse(Option(m.group(2)).getOrElse(""))
                m.group(1).toLowerCase -> unescape(v)
              }.toMap
              val node = new Node(name, attrs, cur)
              node.docPos = pos; pos += 1
              cur.children += node
              if (name == "script" || name == "style") {
                // raw text element: skip to the closing tag verbatim
                val close = html.toLowerCase.indexOf(s"</$name", end)
                i = if (close < 0) n
                else html.indexOf('>', close) match {
                  case -1 => n
                  case e => e + 1
                }
              } else {
                if (!selfClosing && !voidTags(name)) cur = node
                i = end + 1
              }
            } else { addText(html.substring(lt, end + 1)); i = end + 1 }
          }
        }
      }
    }
    root
  }

  /** The entity subset portals emit (matches Exprs.htmlUnescape). */
  def unescape(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&nbsp;", " ").replace("&amp;", "&")

  // ------------------------------------------------------- selectors

  final case class Part(tag: Option[String], id: Option[String],
      classes: Set[String], attrEq: Seq[(String, Option[String])]) {
    def matches(node: Node): Boolean =
      tag.forall(_ == node.tag) &&
        id.forall(i => node.attr("id").contains(i)) &&
        classes.subsetOf(node.classes) &&
        attrEq.forall { case (k, v) =>
          node.attr(k).exists(a => v.forall(_ == a)) }
  }

  private val partRe =
    """([a-zA-Z][-a-zA-Z0-9_]*)?((?:[#.][-a-zA-Z0-9_]+|\[[^\]]+\])*)""".r

  def parseSelector(sel: String): Seq[Part] =
    sel.trim.split("\\s+").filter(_.nonEmpty).toSeq.map { p =>
      partRe.findFirstMatchIn(p) match {
        case Some(m) =>
          val tag = Option(m.group(1)).map(_.toLowerCase)
          var id: Option[String] = None
          val classes = mutable.Set.empty[String]
          val attrEq = mutable.ArrayBuffer.empty[(String, Option[String])]
          val rest = Option(m.group(2)).getOrElse("")
          val tokenRe = """([#.][-a-zA-Z0-9_]+)|(\[[^\]]+\])""".r
          tokenRe.findAllIn(rest).foreach { t =>
            if (t.startsWith("#")) id = Some(t.drop(1))
            else if (t.startsWith(".")) classes += t.drop(1)
            else {
              val body = t.drop(1).dropRight(1)
              val eq = body.indexOf('=')
              if (eq < 0) attrEq += ((body.toLowerCase, None))
              else attrEq += ((body.take(eq).toLowerCase,
                Some(body.drop(eq + 1).stripPrefix("\"").stripSuffix("\"")
                  .stripPrefix("'").stripSuffix("'"))))
            }
          }
          Part(tag, id, classes.toSet, attrEq.toSeq)
        case None => Part(Some(p.toLowerCase), None, Set.empty, Nil)
      }
    }

  /** All nodes matching the selector, in document order. */
  def select(root: Node, selector: String): Seq[Node] = {
    val parts = parseSelector(selector)
    if (parts.isEmpty) return Seq.empty
    root.descendants.filter { node =>
      parts.last.matches(node) && {
        // remaining parts must match some chain of ancestors, in order
        var rest = parts.init.reverse // nearest-ancestor-first
        var anc = node.ancestors
        rest.forall { part =>
          var found = false
          while (!found && anc.hasNext) {
            val a = anc.next()
            if (part.matches(a)) found = true
          }
          found
        }
      }
    }.toSeq
  }

  /** Parse + select in one call. */
  def selectAll(html: String, selector: String): Seq[Node] =
    select(parse(html), selector)
}
