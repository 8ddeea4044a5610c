package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding storage/prep operators for large-scale vector pipelines
  * (the "write 100 TB of vectors affordably" side of the ANN stack in
  * [[Similarity]]).
  */
object Embeddings {

  /** Embedding hygiene — the checks a vector corpus needs BEFORE any
    * ANN/dedup pass trusts it: dimensionality, L2 norm, NaN presence,
    * and a degenerate flag (near-zero norm or NaN — cosine against
    * such vectors is meaningless/unstable). Map-only: a narrow
    * projection over the scan, no shuffle; at 100 TB this runs at
    * scan speed as a pre-ingest filter.
    */
  def embeddingQuality(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", graft.functions.VectorFunctions.l2Norm(col("vec")))
      .withColumn("has_nan", exists(col("vec"), x => isnan(x.cast("double"))))
      .select(
        col("id"),
        size(col("vec")).cast("long").as("dim"),
        round(col("nrm"), 6).as("norm"),
        col("has_nan"),
        (col("has_nan") || col("nrm") < 1e-6).as("is_degenerate"))

  /** Symmetric int8 scalar quantization, long form (id, dim, q,
    * scale): per vector, scale = 127 / max|vᵢ| and qᵢ =
    * ⌊vᵢ·scale + 0.5⌋. `floor(x + 0.5)` instead of round() so Spark
    * and any SQL engine agree on halfway cases (round() half-up vs
    * half-even differs per engine on negatives). All-zero vectors
    * (scale undefined) are dropped. Dequantize error ≤ 0.5/scale per
    * component; storage drops 4× (plus one double per vector).
    *
    * Scale shape: map-only — a narrow projection + posexplode, no
    * shuffle at all; quantization streams through at scan speed. The
    * emitted `scale` column is rounded to 6 for display; qᵢ uses the
    * raw scale so both engines compute identical integers.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      // max|v| via array_max/-array_min: single-pass collection ops,
      // no per-element lambda
      .withColumn("maxabs",
        greatest(array_max(col("vec")).cast("double"), -array_min(col("vec")).cast("double")))
      .where(col("maxabs") > 0)
      .withColumn("scale", lit(127.0) / col("maxabs"))
      .select(col("id"), col("scale"), posexplode(col("vec")))
      .select(
        col("id"),
        (col("pos") + 1).cast("long").as("dim"),
        floor(col("col").cast("double") * col("scale") + 0.5).cast("long").as("q"),
        round(col("scale"), 6).as("scale"))
}
