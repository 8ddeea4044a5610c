package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-byte-codepage text codecs as native codegen'd expressions —
  * the EBCDIC half of the fixed-record enterprise-feed surface
  * (copybook `PIC X(n)` fields on an UNTRANSLATED mainframe transfer
  * arrive in IBM037/EBCDIC, not ASCII). Spark's built-in
  * `encode`/`decode` whitelist exactly six charsets (US-ASCII,
  * ISO-8859-1 and the UTF family — `StringDecode.supportedCharsets`),
  * none of them EBCDIC, so these kernels carry any SINGLE-BYTE JDK
  * charset instead.
  *
  * The charset is compiled ONCE per executor into two flat lookup
  * tables (byte→char and char→byte), so the per-row work is a tight
  * array-indexed loop — no `CharsetEncoder` allocation, no boxing, and
  * both directions are single static calls from generated code (the
  * [[PackedDecimal]] discipline). Only TOTAL single-byte charsets are
  * accepted (every byte decodes to one char — IBM037 maps all 256),
  * and encode inverts the decode table, so ENCODE→DECODE is an exact
  * identity on every mappable string — the property the fixed-record
  * round-trip gate relies on. (The byte-level converse is almost an
  * identity too, except where the JDK table maps two control bytes to
  * one char — IBM037's NL 0x15 and LF 0x25 both decode to U+000A —
  * and re-encoding canonicalizes to the HIGHEST such byte, the
  * standard LF.)
  *
  * Posture split, matching the fixed-record sinks/sources:
  *  - ENCODE (write side) is fail-fast: a char the codepage cannot
  *    represent raises with the offending codepoint — silently writing
  *    the substitution byte would corrupt a 100 TB feed invisibly.
  *  - DECODE (read side) is total for a single-byte codepage, so the
  *    poisoned-blob question does not arise (every byte has a char).
  */
object Codepage {

  /** Flat lookup tables for one single-byte charset. */
  final class Table(name: String) {
    private val cs = java.nio.charset.Charset.forName(name)
    /** byte (0..255) → char. */
    val byteToChar: Array[Char] = {
      val a = new Array[Char](256)
      var i = 0
      while (i < 256) {
        val s = new String(Array(i.toByte), cs)
        require(s.length == 1 && s.charAt(0) != '\uFFFD',
          s"codepage $name is not a total single-byte charset " +
            s"(byte 0x${i.toHexString} does not decode to one char)")
        a(i) = s.charAt(0)
        i += 1
      }
      a
    }
    /** char → byte + 1; 0 = unmappable (so the array default is the
      * rejection sentinel and no second presence array is needed).
      * Built by inverting [[byteToChar]] ascending, so where two bytes
      * share a char the highest byte wins (deterministic) and
      * decode(encode(c)) == c still holds for every mappable char.
      */
    val charToByte1: Array[Short] = {
      val a = new Array[Short](65536)
      var i = 0
      while (i < 256) { a(byteToChar(i)) = (i + 1).toShort; i += 1 }
      a
    }
  }

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Table]()

  def table(name: String): Table =
    tables.computeIfAbsent(name, n => new Table(n))

  /** UTF-8 string → codepage bytes; throws on an unmappable char
    * (write-side fail-fast — see object doc).
    */
  def encode(s: UTF8String, name: String): Array[Byte] = {
    val t = table(name)
    val str = s.toString
    val out = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val b1 = t.charToByte1(str.charAt(i))
      if (b1 == 0) throw new IllegalArgumentException(
        s"codepage $name cannot encode char U+${str.charAt(i).toInt.toHexString.toUpperCase} " +
          s"at position $i of '$str'")
      out(i) = (b1 - 1).toByte
      i += 1
    }
    out
  }

  /** Codepage bytes → UTF-8 string (total: every byte has a char). */
  def decode(b: Array[Byte], name: String): UTF8String = {
    val t = table(name)
    val chars = new Array[Char](b.length)
    var i = 0
    while (i < b.length) { chars(i) = t.byteToChar(b(i) & 0xFF); i += 1 }
    UTF8String.fromString(new String(chars))
  }

  def checkCharset(name: String): Unit = {
    require(java.nio.charset.Charset.isSupported(name),
      s"charset not supported by this JVM: $name")
    table(name): Unit // fail construction early if not single-byte bijective
  }
}

/** `string` → single-byte-codepage bytes; raises on an unmappable
  * char (write-side fail-fast).
  */
case class CodepageEncode(child: Expression, charsetName: String)
  extends UnaryExpression {
  Codepage.checkCharset(charsetName)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"codepage_encode($charsetName) expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(s: Any): Any =
    Codepage.encode(s.asInstanceOf[UTF8String], charsetName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val name = ctx.addReferenceObj("charsetName", charsetName, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Codepage.encode($c, $name);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-byte-codepage bytes → `string` (total — every byte decodes). */
case class CodepageDecode(child: Expression, charsetName: String)
  extends UnaryExpression {
  Codepage.checkCharset(charsetName)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"codepage_decode($charsetName) expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(b: Any): Any =
    Codepage.decode(b.asInstanceOf[Array[Byte]], charsetName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val name = ctx.addReferenceObj("charsetName", charsetName, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Codepage.decode($c, $name);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
