package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling for training-mix curation. The hash-rate /
  * stratified / split samplers live in the gate layer as one-line
  * filters; this hosts the one sampler that needs real machinery.
  *
  * Scale shape: one window partitioned by the group key — work
  * shuffles once on the group, each group ranks independently, never
  * a global sort. Determinism: the "random" uniform is md5-derived
  * from the row id, so the kept set is reproducible across runs,
  * engines, and cluster sizes (no rand() reseeding hazards).
  */
object Sampling {

  /** Weighted reservoir sample of k rows per group, à la
    * Efraimidis–Spirakis: each row draws a deterministic uniform
    * u ∈ (0, 1] (md5 of its id) and is ranked by ln(u)/w descending —
    * the top-k per group is then a weight-proportional sample without
    * replacement. Rows with non-positive weight are excluded (the
    * E-S key is undefined there); callers clamp weights to a floor
    * when every row must stay eligible.
    *
    * Output: the input columns plus `rk` (1-based rank within the
    * group's kept set).
    */
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
  def mixToGroupTarget(df: DataFrame, groupCol: String, idCol: String,
                       targetPerGroup: Long): DataFrame = {
    require(targetPerGroup > 0, "mixToGroupTarget needs targetPerGroup > 0")
    val rates = df.groupBy(groupCol)
      .agg(count(lit(1)).as("_n"))
      .select(col(groupCol),
        least(lit(1.0), lit(targetPerGroup.toDouble) / col("_n")).as("_rate"))
    // u in [0,1): 32 bits of md5(id) over an exact power-of-two divisor
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    df.join(broadcast(rates), Seq(groupCol))
      .where(u < col("_rate"))
      .withColumn("keep_rate", round(col("_rate"), 6))
      .drop("_rate")
  }

  def weightedReservoirPerGroup(df: DataFrame, groupCol: String, idCol: String,
                                weightCol: String, k: Int): DataFrame = {
    require(k > 0, "weightedReservoirPerGroup needs k > 0")
    // u in (0,1]: 32 bits of md5(id), +1 so ln never sees 0
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    // maximize u^(1/w)  <=>  maximize ln(u)/w  (w > 0)
    val w = Window.partitionBy(groupCol).orderBy(desc("_es_key"), col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn("_es_key", log(u) / col(weightCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .drop("_es_key")
  }
}
