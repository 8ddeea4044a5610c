package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: values in [-127, 127], dequantize error bounded") {
    val e = Tables.embeddings(spark, sf001)
    val q = Embeddings.quantizeInt8(e, "vec_id", "embedding")
    val rows = q.select("id", "dim", "q", "scale").as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, qv, _) => qv >= -127 && qv <= 127 },
      "quantized values must fit int8")
    // dequantized component must be within half a quantization step
    val err = q.join(e.select(col("vec_id").as("id"), posexplode(col("embedding"))),
        Seq("id"))
      .where(col("dim") === col("pos") + 1)
      .select(abs(col("q") / col("scale") - col("col").cast("double")).as("e"),
              (lit(0.5) / col("scale")).as("bound"))
      .where(col("e") > col("bound") + 1e-9)
    assert(err.count() == 0, "dequantize error must stay within 0.5/scale")
  }

  test("quantization drops all-zero vectors instead of dividing by zero") {
    val z = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val q = Embeddings.quantizeInt8(z, "vec_id", "embedding")
    val ids = q.select("id").distinct().as[Long].collect().toSet
    assert(ids == Set(2L))
    // max-magnitude component maps to ±127 exactly
    val qm = q.where(col("dim") === 2).select("q").as[Long].head()
    assert(qm == -127L)
  }
}
