package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns.
  *
  * The dot/norm/bucket kernels are native Catalyst expressions with
  * codegen (`graft.plans.VectorExpressions`) — the interpreted
  * higher-order-function forms cost ~µs per element, which at ANN /
  * near-dup pair cardinalities dominates the whole operator. Float
  * elements are widened to double per element, and accumulation is a
  * left-to-right double fold, so scores are bit-identical to the HOF
  * forms and to the DuckDB oracle (`list_cosine_similarity` over
  * `::DOUBLE[]`).
  */
object VectorFunctions {

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  import graft.plans.{DotProduct, HyperplaneBuckets, L2Norm => L2NormExpr}

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ aᵢ·bᵢ — codegen'd single-pass kernel, deterministic order. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** ‖a‖₂ — codegen'd single-pass kernel. */
  def l2Norm(a: Column): Column =
    column(L2NormExpr(expression(a)))

  /** Cosine similarity in double precision; null when either norm is
    * 0. Single codegen'd pass (dot and both norms in one loop).
    */
  def cosine(a: Column, b: Column): Column =
    column(graft.plans.CosineSim(expression(a), expression(b)))

  /** Squared Euclidean distance. */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Explicit double-cast of a float vector. The native kernels read
    * float arrays directly (per-element widening), so this is only
    * needed where a true `array<double>` column type is required.
    */
  def toDoubleVec(v: Column): Column = asDouble(v)

  /** Alias of [[dot]] — the native kernel needs no pre-cast, so the
    * historical "already-double" variant is the same expression.
    */
  def dotD(a: Column, b: Column): Column = dot(a, b)

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
    * Plane components are PLAN-TIME constants (splitmix64-seeded, in
    * [-1, 1)) shipped into the codegen'd kernel — no fitting step, no
    * driver state; all nbits projections happen in ONE pass over the
    * vector. The same bucketing function applies at any scale and on
    * streams. Candidate generation for the 100 TB near-dup / ANN
    * paths, with exact cosine re-ranking on candidates only.
    *
    * @param dim vector dimensionality (plane constants are built at
    *            plan time, so it cannot be inferred from data)
    */
  def hyperplaneBucket(v: Column, nbits: Int, seed: Int = 7, dim: Int = 64): Column =
    column(HyperplaneBuckets(expression(v), planeConstants(nbits, seed, dim)))

  /** The deterministic plane constants behind [[hyperplaneBucket]] —
    * public so oracle SQL can be generated against the SAME planes
    * (bucket = Σ_b (⟨v, plane_b⟩ ≥ 0 ? 2^b : 0), left-to-right double
    * summation; `Double.toString` round-trips, so SQL literals parse
    * back to bit-identical values in any IEEE-754 engine).
    */
  def planeConstants(nbits: Int, seed: Int, dim: Int): IndexedSeq[IndexedSeq[Double]] =
    (0 until nbits).map { b =>
      (0 until dim).map { i =>
        val h = splitmix64(seed.toLong * 1000003L + b.toLong * 10007L + i.toLong)
        (java.lang.Math.floorMod(h, 2000000L).toDouble / 1000000.0) - 1.0
      }
    }
}
