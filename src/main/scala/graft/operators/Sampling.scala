package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling for training-mix curation. The hash-rate /
  * stratified / split samplers live in the gate layer as one-line
  * filters; this hosts the samplers that need real machinery.
  *
  * Determinism: the "random" uniform is md5-derived from the row id,
  * so kept sets are reproducible across runs, engines, and cluster
  * sizes (no rand() reseeding hazards), and a SQL oracle can replay
  * every draw exactly.
  */
object Sampling {

  /** Deterministic uniform from 32 bits of md5(id). `halfOpen` gives
    * u ∈ [0, 1) (Bernoulli `u < rate` filters); otherwise u ∈ (0, 1]
    * (safe under ln). One audit point for the formula — the DuckDB
    * twin is `('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT
    * [+ 1] / 4294967296.0`. Division by 2^32 is exact.
    */
  private def md5Uniform(idCol: String, halfOpen: Boolean): Column = {
    val bits = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double")
    (if (halfOpen) bits else bits + 1.0) / 4294967296.0
  }

  /** Weighted reservoir sample of k rows per group, à la
    * Efraimidis–Spirakis: each row draws a deterministic uniform
    * u ∈ (0, 1] (md5 of its id) and is ranked by ln(u)/w descending —
    * the top-k per group is then a weight-proportional sample without
    * replacement. Rows with non-positive weight are excluded (the
    * E-S key is undefined there); callers clamp weights to a floor
    * when every row must stay eligible.
    *
    * Scale shape: one window partitioned by the group key — work
    * shuffles once on the group, each group ranks independently,
    * never a global sort. Output: the input columns plus `rk`
    * (1-based rank within the group's kept set).
    */
  def weightedReservoirPerGroup(df: DataFrame, groupCol: String, idCol: String,
                                weightCol: String, k: Int): DataFrame = {
    require(k > 0, "weightedReservoirPerGroup needs k > 0")
    // maximize u^(1/w)  <=>  maximize ln(u)/w  (w > 0)
    val w = Window.partitionBy(groupCol).orderBy(desc("_es_key"), col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn("_es_key", log(md5Uniform(idCol, halfOpen = false)) / col(weightCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .drop("_es_key")
  }

  /** Source-mixing downsampler: compute per-group keep rates that cap
    * each group at ~`targetPerGroup` rows in expectation
    * (rate = min(1, target/n)), then apply them with the deterministic
    * md5 uniform — the "stop one source/language from swamping the
    * mix" step, as rates instead of ranks (no window, no per-group
    * sort; composes with a later global shuffle).
    *
    * Scale shape: one hash aggregate for the per-group counts (tiny —
    * one row per group), broadcast back onto the corpus, map-only
    * Bernoulli filter. Output: input columns plus `keep_rate`
    * (rounded to 6).
    */
  /** Temperature-scaled source mixing (the multilingual-corpus
    * standard): target share of group i ∝ nᵢ^α, flattening the
    * distribution toward uniform as α → 0 (α = 1 keeps natural
    * proportions). Keep rate = min(1, targetTotal·qᵢ/nᵢ) with
    * qᵢ = nᵢ^α / Σⱼ nⱼ^α, applied via the deterministic md5 uniform —
    * rare sources keep (relatively) more of their rows, dominant ones
    * are cut, and the expected output size is ≤ targetTotal.
    *
    * Scale shape: per-group counts (one tiny hash aggregate) + a
    * one-row normalizer, both broadcast back; the filter is map-only.
    * Output: input columns plus `keep_rate` (rounded to 6).
    */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
                     alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, "temperatureMix needs 0 < alpha <= 1")
    require(targetTotal > 0, "temperatureMix needs targetTotal > 0")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("_n"))
    val z = counts.agg(sum(pow(col("_n").cast("double"), alpha)).as("_z"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col(groupCol),
        least(lit(1.0),
          pow(col("_n").cast("double"), alpha) / col("_z")
            * targetTotal.toDouble / col("_n")).as("_rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .where(md5Uniform(idCol, halfOpen = true) < col("_rate"))
      .withColumn("keep_rate", round(col("_rate"), 6))
      .drop("_rate")
  }

  def mixToGroupTarget(df: DataFrame, groupCol: String, idCol: String,
                       targetPerGroup: Long): DataFrame = {
    require(targetPerGroup > 0, "mixToGroupTarget needs targetPerGroup > 0")
    val rates = df.groupBy(groupCol)
      .agg(count(lit(1)).as("_n"))
      .select(col(groupCol),
        least(lit(1.0), lit(targetPerGroup.toDouble) / col("_n")).as("_rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .where(md5Uniform(idCol, halfOpen = true) < col("_rate"))
      .withColumn("keep_rate", round(col("_rate"), 6))
      .drop("_rate")
  }
}
