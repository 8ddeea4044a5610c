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

  /** Explicit double-cast of a float vector — materialize this once
    * per row (withColumn) before a pairwise stage so the cast isn't
    * re-done per pair.
    */
  def toDoubleVec(v: Column): Column = asDouble(v)

  /** Dot product of already-double vectors (no per-pair cast). */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** Cosine from a pair dot and per-side precomputed norms (scalar
    * columns materialized on each join side). Pair cost drops from
    * dot + 2 norm passes (3 array traversals) to ONE traversal + a
    * scalar divide — at n² pair counts that is the difference between
    * feasible and not. Bit-identical to [[cosine]] (same op order).
    */
  def cosineFromParts(dot: Column, normA: Column, normB: Column): Column =
    when(normA * normB === 0.0, lit(null)).otherwise(dot / (normA * normB))

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Random-hyperplane (SimHash-style) LSH bucket id: `nbits` sign
    * bits of projections onto deterministic pseudo-random hyperplanes.
    * Plane components are PLAN-TIME literal arrays (splitmix64-seeded,
    * in [-1, 1)) — no fitting step, no driver state, and no per-row
    * hashing of plane components; each bit costs one dot product.
    * The same bucketing function applies at any scale and on streams.
    * Candidate generation for the 100 TB near-dup / ANN paths, with
    * exact cosine re-ranking on candidates only.
    *
    * @param dim vector dimensionality (plane literals are built at
    *            plan time, so it cannot be inferred from data)
    */
  def hyperplaneBucket(v: Column, nbits: Int, seed: Int = 7, dim: Int = 64): Column = {
    val dv = asDouble(v)
    val bits = (0 until nbits).map { b =>
      val plane = (0 until dim).map { i =>
        val h = splitmix64(seed.toLong * 1000003L + b.toLong * 10007L + i.toLong)
        (java.lang.Math.floorMod(h, 2000000L).toDouble / 1000000.0) - 1.0
      }
      val proj = aggregate(
        zip_with(dv, typedlit(plane), _ * _), lit(0.0), _ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
