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
}
