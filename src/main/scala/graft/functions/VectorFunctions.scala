package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns,
  * built on Spark's higher-order functions (`zip_with` / `aggregate`).
  * Everything is per-row, embarrassingly parallel, and null-safe; the
  * `double` cast happens element-wise so Spark and the DuckDB oracle
  * accumulate in the same precision and order (left-to-right fold).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ aᵢ·bᵢ — sequential left fold, deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), _ + _))

  /** Cosine similarity in double precision; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = l2Norm(a) * l2Norm(b)
    when(nn === 0.0, lit(null)).otherwise(d / nn)
  }

  /** Squared Euclidean distance. */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Random-hyperplane (SimHash-style) LSH bucket id: `nbits` sign
    * bits of projections onto deterministic pseudo-random hyperplanes.
    * Plane components derive from xxhash64(seed, bit, dim) mapped to
    * ±[0,1) — fully deterministic, no fitting step, no driver state,
    * so the same bucketing function applies at any scale and on
    * streams. Buckets cosine-similar vectors together; used as the
    * 100 TB path for near-dup and ANN (candidate generation), with
    * exact cosine re-ranking on candidates only.
    */
  def hyperplaneBucket(v: Column, nbits: Int, seed: Int = 7): Column = {
    val dv = asDouble(v)
    val bits = (0 until nbits).map { b =>
      // projection = Σ_i v_i * plane(b, i); plane in [-1, 1)
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(dv) - 1),
          (x, i) => x * (pmod(xxhash64(lit(seed), lit(b), i), lit(2000000L)).cast("double") / 1000000.0 - 1.0)),
        lit(0.0), _ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
