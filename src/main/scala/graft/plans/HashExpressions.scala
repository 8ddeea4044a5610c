package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine-neutral 60-bit document hash as ONE fused kernel.
  *
  * The sketch operators (minhash, simhash, centroid seeding, shard
  * assignment) hash every shingle/token with
  * `conv(substring(md5(s), 1, 15), 16, 10)` — three chained
  * expressions that materialize a 32-char hex string, slice it, and
  * parse it back to a long. This expression computes the identical
  * value (the digest's top 60 bits; hex is big-endian nibbles, so the
  * first 15 hex chars ARE bits 127..68) straight from the digest
  * bytes: no hex string, no substring copy, no radix parse. The
  * number is bit-identical to the chain, so every DuckDB oracle that
  * replays `('0x' || substr(md5(s), 1, 15))::BIGINT` still matches.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5prefix64 expects a string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5Prefix64.prefix60(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Md5Prefix64.prefix60($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix64 {
  // MessageDigest is stateful — one per task thread, reset per call
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes) as a non-negative long — numerically
    * identical to parsing the first 15 hex chars of the digest.
    */
  def prefix60(bytes: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
