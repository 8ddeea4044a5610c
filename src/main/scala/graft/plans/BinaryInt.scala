package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** COBOL COMP/COMP-4/BINARY codecs as native codegen'd expressions —
  * the third numeric usage of the fixed-width enterprise-feed surface
  * (copybook `PIC S9(p−s)V9(s) COMP` fields): a BIG-ENDIAN
  * two's-complement integer holding the decimal's UNSCALED value, in
  * the IBM storage sizes — a halfword (2 bytes) for 1–4 declared
  * digits, a fullword (4) for 5–9, a doubleword (8) for 10–18. The
  * scale is declaration metadata, exactly as in COMP-3: nothing on
  * the wire marks the decimal point.
  *
  * Decode follows the poisoned-blob discipline: every bit pattern IS
  * a lawful two's-complement integer, so the only detectable
  * corruption is a magnitude outside the declared digit count —
  * |unscaled| ≥ 10^precision decodes to SQL NULL (the same
  * more-digits-than-declared rejection the packed decoder applies).
  * Encode cannot overflow its storage: a DecimalType(p, s) value has
  * ≤ p digits and 10^p − 1 always fits the storage size chosen for p.
  * Unsigned pictures store in-range values identically (the sign bit
  * is never set below 10^precision), so one codec serves both.
  * Both directions are single static calls from generated code — no
  * UDF, whole-stage codegen keeps flowing.
  */
object BinaryInt {
  val MaxPrecision = 18 // unscaled value must fit a long

  /** IBM binary storage size for a declared digit count. */
  def bytesFor(precision: Int): Int =
    if (precision <= 4) 2 else if (precision <= 9) 4 else 8

  private[plans] def checkDeclaration(precision: Int, scale: Int): Unit = {
    require(precision >= 1 && precision <= MaxPrecision,
      s"binary-int precision must be in [1, $MaxPrecision]: $precision")
    require(scale >= 0 && scale <= precision,
      s"binary-int scale must be in [0, precision]: $scale")
  }

  private val pow10: Array[Long] = {
    val a = new Array[Long](MaxPrecision + 1)
    a(0) = 1L
    for (i <- 1 to MaxPrecision) a(i) = a(i - 1) * 10
    a
  }

  /** Decimal → big-endian two's-complement bytes. */
  def encode(d: Decimal, precision: Int): Array[Byte] = {
    var v = d.toUnscaledLong
    val n = bytesFor(precision)
    val out = new Array[Byte](n)
    var i = n - 1
    while (i >= 0) { out(i) = (v & 0xFF).toByte; v >>= 8; i -= 1 }
    out
  }

  /** Big-endian bytes → Decimal(precision, scale); null on a wrong
    * span length or a magnitude beyond the declared digits.
    */
  def decode(b: Array[Byte], precision: Int, scale: Int): Decimal = {
    if (b == null || b.length != bytesFor(precision)) return null
    var v: Long = b(0) // sign-extends
    var i = 1
    while (i < b.length) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
    val lim = pow10(precision)
    if (v >= lim || v <= -lim) return null
    Decimal(v, precision, scale)
  }
}

/** `decimal(precision, scale)` → COMP big-endian binary bytes. */
case class BinaryIntEncode(child: Expression, precision: Int, scale: Int)
  extends UnaryExpression {
  BinaryInt.checkDeclaration(precision, scale)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case dt: DecimalType if dt.precision == precision && dt.scale == scale =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"binary_encode($precision,$scale) expects decimal($precision,$scale), " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(d: Any): Any =
    BinaryInt.encode(d.asInstanceOf[Decimal], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BinaryInt.encode($c, $precision);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** COMP big-endian binary bytes → `decimal(precision, scale)`; null
  * on a malformed span (poisoned-blob discipline).
  */
case class BinaryIntDecode(child: Expression, precision: Int, scale: Int)
  extends UnaryExpression {
  BinaryInt.checkDeclaration(precision, scale)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"binary_decode expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = DecimalType(precision, scale)

  override def nullable: Boolean = true // malformed spans decode to null

  override def nullSafeEval(b: Any): Any =
    BinaryInt.decode(b.asInstanceOf[Array[Byte]], precision, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.BinaryInt.decode($c, $precision, $scale);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
