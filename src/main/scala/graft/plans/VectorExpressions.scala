package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dense-vector hot path.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * interpreted — roughly microseconds per element — which at
  * pair-comparison cardinalities (ANN scoring, near-dup verification,
  * LSH bucketing) dominates the operator. These expressions run the
  * same arithmetic as a tight loop inside whole-stage codegen: one
  * array traversal, no per-element boxing, no lambda dispatch.
  *
  * Fold order matches the HOF forms (left-to-right, double
  * accumulator), so scores are bit-identical to the previous
  * implementations and to the DuckDB oracle. Element null-ness is not
  * checked: embeddings are dense arrays (`containsNull` may be true in
  * parquet schemas, but a null element would be a data bug — the HOF
  * forms returned null-poisoned sums for those, this returns whatever
  * the primitive read yields).
  */
private[graft] trait VectorElementType { self: Expression =>
  protected def checkVectorType(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<float> or array<double>, got ${other.catalogString}")
  }

  /** Java accessor snippet for array element i of the given type. */
  protected def readElem(arr: String, i: String, dt: DataType): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  protected def readElemValue(arr: ArrayData, i: Int, dt: DataType): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
}

/** Σ aᵢ·bᵢ over two float/double arrays (mixed element types allowed).
  * Arrays of different lengths dot over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorElementType {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVectorType(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkVectorType(right.dataType, "right")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += readElemValue(x, i, left.dataType) * readElemValue(y, i, right.dataType)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${readElem(a, i, left.dataType)} * ${readElem(b, i, right.dataType)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ‖a‖₂ of a float/double array. */
case class L2Norm(child: Expression)
    extends UnaryExpression with VectorElementType {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVectorType(child.dataType, "input")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = readElemValue(x, i, child.dataType)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${readElem(a, i, child.dataType)};
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** A vector shorter/longer than the plane would silently bucket on a
    * prefix and quietly degrade LSH recall — fail loudly instead.
    * Called from generated code, so it must be public + static-shaped.
    */
  def checkDim(vecLen: Int, planeLen: Int): Unit =
    if (vecLen != planeLen)
      throw new IllegalArgumentException(
        s"hyperplaneBucket: vector dim $vecLen != plane dim $planeLen — " +
          "pass dim=<vector dimensionality> explicitly")
}

/** Cosine similarity in ONE pass: Σab, Σa², Σb² accumulate in the
  * same loop, then dot / (√Σa²·√Σb²). Null when either norm is zero
  * (or either input is null) — matching the composed
  * `when(nn === 0, null).otherwise(dot/nn)` form bit-for-bit.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with VectorElementType {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVectorType(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkVectorType(right.dataType, "right")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      val xv = readElemValue(x, i, left.dataType)
      val yv = readElemValue(y, i, right.dataType)
      sab += xv * yv; saa += xv * xv; sbb += yv * yv
      i += 1
    }
    val nn = math.sqrt(saa) * math.sqrt(sbb)
    if (nn == 0.0) null else sab / nn
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val sab = ctx.freshName("sab"); val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb"); val nn = ctx.freshName("nn")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sab = 0.0, $saa = 0.0, $sbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${readElem(a, i, left.dataType)};
         |  double $yv = ${readElem(b, i, right.dataType)};
         |  $sab += $xv * $yv; $saa += $xv * $xv; $sbb += $yv * $yv;
         |}
         |double $nn = java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb);
         |if ($nn == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $sab / $nn; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `nbits` hyperplane sign bits in ONE pass over the vector:
  * bit b = sign of ⟨v, plane_b⟩, packed into a long. Plane components
  * are plan-time constants shipped as a codegen reference object —
  * versus the HOF form's nbits separate interpreted dot products
  * against literal arrays.
  */
case class HyperplaneBuckets(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with VectorElementType {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVectorType(child.dataType, "input")
  override def dataType: DataType = LongType

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bucket = 0L
    var b = 0
    while (b < planeArr.length) {
      val plane = planeArr(b)
      HyperplaneBuckets.checkDim(x.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < plane.length) {
        s += readElemValue(x, i, child.dataType) * plane(i)
        i += 1
      }
      if (s >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bk = ctx.freshName("bucket")
      val pl = ctx.freshName("plane")
      s"""
         |long $bk = 0L;
         |for (int $b = 0; $b < $planesRef.length; $b++) {
         |  double[] $pl = $planesRef[$b];
         |  graft.plans.HyperplaneBuckets.checkDim($a.numElements(), $pl.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $pl.length; $i++) {
         |    $s += ${readElem(a, i, child.dataType)} * $pl[$i];
         |  }
         |  if ($s >= 0) $bk |= (1L << $b);
         |}
         |${ev.value} = $bk;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
