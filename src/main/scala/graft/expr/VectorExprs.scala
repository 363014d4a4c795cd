package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst vector expressions (SURVEY.md §2 custom-operator
  * path b: codegen'd `Expression` beats interpreted higher-order
  * functions beats UDFs).
  *
  * Both operate on `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` columns, accumulate
  * in double precision in element order, and generate a single tight
  * loop inside whole-stage codegen — one array traversal per row where
  * the `zip_with`/`aggregate` formulation costs three interpreted
  * folds with per-element closure dispatch. Accumulation order is
  * identical to the fold formulation, so results are bit-for-bit equal
  * (the DuckDB oracle of q42 checks this transitively).
  */
trait VectorBinaryExpression extends BinaryExpression {
  private def vectorTyped(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vectorTyped(left.dataType) && vectorTyped(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemIsFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def getElemCode(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** dot_product(a, b): sum_i a[i]*b[i] over the common prefix length. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += getElem(left, x, i) * getElem(right, y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: nullSafeCodeGen does not brace the block for
      // non-nullable inputs, so fixed locals would collide when two of
      // these land in one codegen scope (Janino error -> interpreted
      // fallback)
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${getElemCode(left, a, i)}) * (${getElemCode(right, b, i)});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** cosine_sim(a, b): dot / (||a|| * ||b||) in ONE pass (three
  * accumulators, one traversal); null for zero-norm inputs — same
  * contract as dot/nullif(norm*norm, 0). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xv = getElem(left, x, i); val yv = getElem(right, y, i)
      ab += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) null else ab / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names for the same scope-collision reason as DotProduct
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $ab = 0.0, $aa = 0.0, $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getElemCode(left, a, i)};
         |  double $yv = ${getElemCode(right, b, i)};
         |  $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |}
         |double $denom = Math.sqrt($aa) * Math.sqrt($bb);
         |if ($denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $ab / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
