package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** COBOL COMP-3 (packed decimal) codecs as native codegen'd
  * expressions — the numeric half of the fixed-width enterprise-feed
  * surface (copybook `PIC S9(p−s)V9(s) COMP-3` fields): each byte
  * carries two BCD nibbles, the final nibble is the sign (0xC
  * positive / 0xD negative on encode; 0xA/0xC/0xE/0xF positive and
  * 0xB/0xD negative accepted on decode — the IBM convention), and a
  * `precision`-digit field occupies `precision/2 + 1` bytes. The
  * digits are the decimal's UNSCALED value; the scale is declaration
  * metadata (copybooks carry no decimal point on the wire).
  *
  * Decode follows the poisoned-blob discipline: a malformed span
  * (wrong length, digit nibble > 9, sign nibble < 0xA, or more
  * significant digits than the declared precision allows) decodes to
  * SQL NULL rather than killing a 100 TB scan — the caller chooses
  * whether nulls are tolerable (profile them) or fatal (a count
  * guard). Both directions are single static calls from generated
  * code (the [[Md5Prefix64]] discipline): no UDF, no boxing beyond
  * the Decimal itself, whole-stage codegen keeps flowing.
  */
object PackedDecimal {
  val MaxPrecision = 18 // unscaled value must fit a long

  def bytesFor(precision: Int): Int = precision / 2 + 1

  private val pow10: Array[Long] = {
    val a = new Array[Long](MaxPrecision + 2)
    a(0) = 1L
    for (i <- 1 to MaxPrecision + 1) a(i) = a(i - 1) * 10
    a
  }

  /** Decimal → packed bytes. The input is already validated to
    * `precision` digits by its DecimalType, so encode cannot overflow.
    */
  def encode(d: Decimal, precision: Int): Array[Byte] = {
    val unscaled = d.toUnscaledLong
    val neg = unscaled < 0
    var v = if (neg) -unscaled else unscaled
    val n = bytesFor(precision)
    val out = new Array[Byte](n)
    out(n - 1) = (((v % 10) << 4) | (if (neg) 0x0D else 0x0C)).toByte
    v /= 10
    var i = n - 2
    while (i >= 0) {
      val lo = v % 10; v /= 10
      val hi = v % 10; v /= 10
      out(i) = ((hi << 4) | lo).toByte
      i -= 1
    }
    out
  }

  /** Packed bytes → Decimal(precision, scale), or null when the span
    * is malformed (see object doc for the exact rejections).
    */
  def decode(b: Array[Byte], precision: Int, scale: Int): Decimal = {
    if (b == null || b.length != bytesFor(precision)) return null
    val sign = b(b.length - 1) & 0x0F
    if (sign < 0x0A) return null // a digit where the sign must live
    val neg = sign == 0x0B || sign == 0x0D
    var v = 0L
    var i = 0
    while (i < b.length) {
      val hi = (b(i) >> 4) & 0x0F
      if (hi > 9) return null
      v = v * 10 + hi
      if (i < b.length - 1) {
        val lo = b(i) & 0x0F
        if (lo > 9) return null
        v = v * 10 + lo
      }
      i += 1
    }
    // an even precision leaves one extra leading nibble on the wire —
    // a value using it exceeds the declared field and must not decode
    if (v >= pow10(precision)) return null
    Decimal(if (neg) -v else v, precision, scale)
  }

  private[plans] def checkDeclaration(precision: Int, scale: Int): Unit = {
    require(precision >= 1 && precision <= MaxPrecision,
      s"packed-decimal precision must be in [1, $MaxPrecision]: $precision")
    require(scale >= 0 && scale <= precision,
      s"packed-decimal scale must be in [0, precision]: $scale")
  }
}

/** ZONED decimal (COBOL `PIC S9(p−s)V9(s)` DISPLAY, ASCII convention)
  * — COMP-3's human-readable sibling, one digit per byte with the
  * SIGN OVERPUNCHED into the final digit: '{' = +0, 'A'..'I' =
  * +1..+9, '}' = −0, 'J'..'R' = −1..−9, and a plain trailing digit
  * reads as positive (unsigned fields). This is the standard form
  * after an EBCDIC→ASCII transfer; a `precision`-digit field occupies
  * exactly `precision` bytes. Same malformed-span-to-null posture as
  * [[PackedDecimal]].
  */
object ZonedDecimal {
  val MaxPrecision: Int = PackedDecimal.MaxPrecision

  private val posPunch = "{ABCDEFGHI".toCharArray // +0..+9
  private val negPunch = "}JKLMNOPQR".toCharArray // −0..−9

  def encode(d: Decimal, precision: Int): Array[Byte] = {
    val unscaled = d.toUnscaledLong
    val neg = unscaled < 0
    var v = if (neg) -unscaled else unscaled
    val out = new Array[Byte](precision)
    val last = (v % 10).toInt
    out(precision - 1) =
      (if (neg) negPunch(last) else posPunch(last)).toByte
    v /= 10
    var i = precision - 2
    while (i >= 0) { out(i) = ('0' + (v % 10)).toByte; v /= 10; i -= 1 }
    out
  }

  def decode(b: Array[Byte], precision: Int, scale: Int): Decimal = {
    if (b == null || b.length != precision) return null
    var v = 0L
    var i = 0
    while (i < precision - 1) {
      val c = b(i)
      if (c < '0' || c > '9') return null
      v = v * 10 + (c - '0')
      i += 1
    }
    val last = b(precision - 1).toChar
    val (digit, neg) =
      if (last >= '0' && last <= '9') (last - '0', false) // unsigned
      else {
        val p = posPunch.indexOf(last)
        if (p >= 0) (p, false)
        else {
          val n = negPunch.indexOf(last)
          if (n >= 0) (n, true) else return null
        }
      }
    v = v * 10 + digit
    Decimal(if (neg) -v else v, precision, scale)
  }
}

/** `decimal(precision, scale)` → zoned-decimal bytes (overpunch sign). */
case class ZonedDecimalEncode(child: Expression, precision: Int, scale: Int)
  extends UnaryExpression {
  PackedDecimal.checkDeclaration(precision, scale)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case dt: DecimalType if dt.precision == precision && dt.scale == scale =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zoned_encode($precision,$scale) expects decimal($precision,$scale), " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(d: Any): Any =
    ZonedDecimal.encode(d.asInstanceOf[Decimal], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ZonedDecimal.encode($c, $precision);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Zoned-decimal bytes → `decimal(precision, scale)`; null on a
  * malformed span.
  */
case class ZonedDecimalDecode(child: Expression, precision: Int, scale: Int)
  extends UnaryExpression {
  PackedDecimal.checkDeclaration(precision, scale)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zoned_decode expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = DecimalType(precision, scale)

  override def nullable: Boolean = true

  override def nullSafeEval(b: Any): Any =
    ZonedDecimal.decode(b.asInstanceOf[Array[Byte]], precision, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.ZonedDecimal.decode($c, $precision, $scale);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `decimal(precision, scale)` → COMP-3 packed bytes. */
case class PackedDecimalEncode(child: Expression, precision: Int, scale: Int)
  extends UnaryExpression {
  PackedDecimal.checkDeclaration(precision, scale)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case dt: DecimalType if dt.precision == precision && dt.scale == scale =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"packed_encode($precision,$scale) expects decimal($precision,$scale), " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(d: Any): Any =
    PackedDecimal.encode(d.asInstanceOf[Decimal], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PackedDecimal.encode($c, $precision);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** COMP-3 packed bytes → `decimal(precision, scale)`; null on a
  * malformed span (poisoned-blob discipline).
  */
case class PackedDecimalDecode(child: Expression, precision: Int, scale: Int)
  extends UnaryExpression {
  PackedDecimal.checkDeclaration(precision, scale)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"packed_decode expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = DecimalType(precision, scale)

  override def nullable: Boolean = true // malformed spans decode to null

  override def nullSafeEval(b: Any): Any =
    PackedDecimal.decode(b.asInstanceOf[Array[Byte]], precision, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.PackedDecimal.decode($c, $precision, $scale);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
