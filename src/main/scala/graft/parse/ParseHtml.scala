package graft.parse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `parse_html(html, selector)` — the engine's UDTF surface (SURVEY.md
  * §2.3 P24, §2.12): turns an HTML document column into one row per
  * selector match, modeled on Catalyst's built-in `xpath()`/`explode`
  * generators.
  *
  * Output schema per match (document order):
  *   pos INT, tag STRING, href STRING, text STRING,
  *   attrs MAP<STRING,STRING>
  *
  * Reference behavior mirrored: BeautifulSoup row extraction at
  * scraper.py:122-123, scraper_copenhagen.py:55-92,125-151,
  * scraper_middelfart.py:108-127.
  *
  * Runs as a Generate node: per-row, no shuffle, stays distributed.
  * Evaluation is interpreted (CodegenFallback) — the parser dominates
  * cost, not the expression glue.
  */
case class ParseHtml(html: Expression, selector: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(html, selector)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("href", StringType, nullable = true),
    StructField("text", StringType, nullable = false),
    StructField("attrs", MapType(StringType, StringType), nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val doc = html.eval(input)
    val sel = selector.eval(input)
    if (doc == null || sel == null) return Iterator.empty
    val nodes = HtmlParser.selectAll(doc.toString, sel.toString)
    nodes.iterator.zipWithIndex.map { case (node, i) =>
      val attrKeys = node.attrs.keys.toArray.sorted
      val row = new GenericInternalRow(5)
      row.update(0, i)
      row.update(1, UTF8String.fromString(node.tag))
      row.update(2, node.attr("href").map(UTF8String.fromString).orNull)
      row.update(3, UTF8String.fromString(node.text))
      row.update(4, new ArrayBasedMapData(
        new GenericArrayData(attrKeys.map(UTF8String.fromString(_): Any)),
        new GenericArrayData(attrKeys.map(k =>
          UTF8String.fromString(node.attrs(k)): Any))))
      row
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParseHtml =
    copy(html = newChildren(0), selector = newChildren(1))
}

/** Registers graft's custom Catalyst functions on a session
  * (idempotent — re-registration replaces the same builders). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    // guard on the NEWEST function so a session registered by an older
    // build of this object still picks up later additions
    if (spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("pq_adc"))) return
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("parse_html"),
      new ExpressionInfo(classOf[ParseHtml].getName, "parse_html"),
      (exprs: Seq[Expression]) => ParseHtml(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.expr.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => graft.expr.DotProduct(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.expr.CosineSimilarity].getName,
        "cosine_sim"),
      (exprs: Seq[Expression]) =>
        graft.expr.CosineSimilarity(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[graft.expr.PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) =>
        graft.expr.PqEncode(exprs(0), exprs(1), exprs(2), exprs(3)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[graft.expr.PqAdc].getName, "pq_adc"),
      (exprs: Seq[Expression]) =>
        graft.expr.PqAdc(exprs(0), exprs(1), exprs(2)))
  }
}
