package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native product-quantization expressions (SURVEY.md §2 custom-operator
  * path b) — the kernel of the PQ ANN path in [[graft.ops.Pq]].
  *
  * Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) splits a d-dim vector
  * into M subvectors and quantizes each against its own K-centroid
  * codebook, so a 64-float embedding compresses to M bytes (16x less
  * at M=8, K<=256) and a query scans CODES, not vectors — the shape
  * that makes billion-vector ANN feasible. Both expressions carry
  * their table (codebook / query lookup table) as a FOLDABLE literal
  * child: the driver evaluates it once (codegen embeds it as a
  * reference object, the interpreted path caches it in a transient
  * lazy val), so per-row work is a tight primitive loop inside
  * whole-stage codegen — no per-row array materialization, no UDF
  * boxing. */
trait PqExpression { self: Expression =>
  protected def vectorTyped(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Evaluate a foldable child once (driver-side) to a double[]. */
  protected def foldedDoubles(e: Expression): Array[Double] =
    e.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  protected def foldedInt(e: Expression): Int =
    e.eval(null).asInstanceOf[Int]
}

/** pq_encode(vec, codebook, m, ksub): BINARY of length m — byte mm is
  * the index of the L2-nearest of codebook's ksub centroids for
  * subvector mm. `codebook` is flat row-major
  * [m][ksub][dsub = len(vec)/m]; ties pick the lowest index, so the
  * encoding is deterministic. */
case class PqEncode(vec: Expression, codebook: Expression,
    m: Expression, ksub: Expression) extends QuaternaryExpression
    with PqExpression {

  override def first: Expression = vec
  override def second: Expression = codebook
  override def third: Expression = m
  override def fourth: Expression = ksub
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vectorTyped(vec.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an ARRAY<FLOAT>/ARRAY<DOUBLE> vector, got " +
          vec.dataType.simpleString)
    else if (!codebook.foldable || !vectorTyped(codebook.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a foldable numeric-array codebook")
    else if (!m.foldable || m.dataType != IntegerType ||
      !ksub.foldable || ksub.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs foldable INT m and ksub")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val cb: Array[Double] = foldedDoubles(codebook)
  @transient private lazy val mV: Int = foldedInt(m)
  @transient private lazy val kV: Int = foldedInt(ksub)

  private def elemIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any, c: Any, mm0: Any,
      kk0: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dsub = x.numElements() / mV
    val out = new Array[Byte](mV)
    var mm = 0
    while (mm < mV) {
      var best = 0
      var bestD = Double.MaxValue
      var kk = 0
      while (kk < kV) {
        val cbase = (mm * kV + kk) * dsub
        val vbase = mm * dsub
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val e =
            (if (elemIsFloat) x.getFloat(vbase + j).toDouble
             else x.getDouble(vbase + j)) - cb(cbase + j)
          acc += e * e
          j += 1
        }
        if (acc < bestD) { bestD = acc; best = kk }
        kk += 1
      }
      out(mm) = best.toByte
      mm += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _, _) => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
      val getElem =
        if (elemIsFloat) (i: String) => s"(double) $a.getFloat($i)"
        else (i: String) => s"$a.getDouble($i)"
      val dsub = ctx.freshName("dsub")
      val out = ctx.freshName("out")
      val mm = ctx.freshName("mm")
      val kk = ctx.freshName("kk")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val acc = ctx.freshName("acc")
      val e = ctx.freshName("e")
      val cbase = ctx.freshName("cbase")
      val vbase = ctx.freshName("vbase")
      s"""
         |int $dsub = $a.numElements() / $mV;
         |byte[] $out = new byte[$mV];
         |for (int $mm = 0; $mm < $mV; $mm++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  int $vbase = $mm * $dsub;
         |  for (int $kk = 0; $kk < $kV; $kk++) {
         |    int $cbase = ($mm * $kV + $kk) * $dsub;
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      double $e = ${getElem(s"$vbase + $j")} - $cbRef[$cbase + $j];
         |      $acc += $e * $e;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $kk; }
         |  }
         |  $out[$mm] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): PqEncode =
    copy(vec = newFirst, codebook = newSecond, m = newThird,
      ksub = newFourth)
}

/** pq_adc(codes, lut, ksub): asymmetric-distance lookup — for an
  * m-byte code, sum_mm lut[mm * ksub + codes[mm]]. With
  * lut[mm][k] = dot(query_sub_mm, centroid[mm][k]) the result is the
  * quantized approximation of dot(query, vector): one add per
  * SUBSPACE instead of one multiply-add per DIMENSION, over a code
  * that is 16x smaller than the vector it stands for. */
case class PqAdc(codes: Expression, lut: Expression,
    ksub: Expression) extends TernaryExpression with PqExpression {

  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = ksub
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (codes.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs BINARY codes, got " +
          codes.dataType.simpleString)
    else if (!lut.foldable || !vectorTyped(lut.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a foldable numeric-array lookup table")
    else if (!ksub.foldable || ksub.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a foldable INT ksub")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val lutArr: Array[Double] = foldedDoubles(lut)
  @transient private lazy val kV: Int = foldedInt(ksub)

  override protected def nullSafeEval(c: Any, l: Any, k0: Any): Any = {
    val code = c.asInstanceOf[Array[Byte]]
    var acc = 0.0
    var mm = 0
    while (mm < code.length) {
      acc += lutArr(mm * kV + (code(mm) & 0xff))
      mm += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _, _) => {
      val lutRef = ctx.addReferenceObj("pqLut", lutArr, "double[]")
      val acc = ctx.freshName("acc")
      val mm = ctx.freshName("mm")
      s"""
         |double $acc = 0.0;
         |for (int $mm = 0; $mm < $c.length; $mm++) {
         |  $acc += $lutRef[$mm * $kV + ($c[$mm] & 0xff)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAdc =
    copy(codes = newFirst, lut = newSecond, ksub = newThird)
}
