package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates (`Aggregator[IN, BUF, OUT]` via `udaf()`) —
  * the idiomatic Spark 3+/4 path for user aggregation: the buffer is a
  * case-class Encoder (Tungsten-serialized), merge is associative, and
  * partial aggregation happens map-side like any built-in aggregate.
  */
object Aggregators {

  case class LogSum(sumLog: Double, n: Long)

  /** Geometric mean = exp(mean(ln x)), null-ignoring, null on empty /
    * non-positive-only input. Log-domain accumulation keeps the
    * product from overflowing at any group size — the reason this
    * can't be written as pow(product(x), 1/n) at scale.
    */
  val geometricMean: Aggregator[java.lang.Double, LogSum, java.lang.Double] =
    new Aggregator[java.lang.Double, LogSum, java.lang.Double] {
      def zero: LogSum = LogSum(0.0, 0L)
      def reduce(b: LogSum, a: java.lang.Double): LogSum =
        if (a == null || a.doubleValue() <= 0.0) b
        else LogSum(b.sumLog + math.log(a.doubleValue()), b.n + 1)
      def merge(x: LogSum, y: LogSum): LogSum = LogSum(x.sumLog + y.sumLog, x.n + y.n)
      def finish(b: LogSum): java.lang.Double =
        if (b.n == 0) null else Double.box(math.exp(b.sumLog / b.n))
      def bufferEncoder: Encoder[LogSum] = Encoders.product[LogSum]
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Column form: geomean(col). */
  def geomean(c: Column): Column = udaf(geometricMean).apply(c)

  /** SimHash signature aggregate: consumes per-token hash values,
    * accumulates the per-bit ±1 counts in ONE primitive long[bits]
    * buffer, finishes to the packed sign-bit signature. Replaces the
    * previous 60 separate SUM(CASE…) columns — one aggregate
    * expression instead of 60, and the partial/merge buffer is a
    * single array column rather than 60 wide long columns, which cuts
    * hash-aggregate memory and per-row merge dispatch ~bits-fold.
    * Runs as an ObjectHashAggregate with normal map-side partial
    * aggregation; bit semantics identical to the SUM form (bit j set
    * iff Σ±1 ≥ 0).
    */
  final class SimHashSig(bits: Int) extends Aggregator[java.lang.Long, Array[Long], java.lang.Long] {
    def zero: Array[Long] = new Array[Long](bits)
    def reduce(b: Array[Long], h: java.lang.Long): Array[Long] = {
      if (h != null) {
        val v = h.longValue()
        var j = 0
        while (j < bits) { b(j) += (((v >>> j) & 1L) * 2L) - 1L; j += 1 }
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var j = 0
      while (j < bits) { x(j) += y(j); j += 1 }
      x
    }
    def finish(b: Array[Long]): java.lang.Long = {
      var sig = 0L
      var j = 0
      while (j < bits) { if (b(j) >= 0) sig |= (1L << j); j += 1 }
      Long.box(sig)
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
  }

  /** Column form: simhashSig(tokenHash, bits). */
  def simhashSig(c: Column, bits: Int): Column = udaf(new SimHashSig(bits)).apply(c)
}
