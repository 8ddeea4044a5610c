package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Per-bucket LSH state for [[StreamingDedup.embeddingPairsStream]]:
  * the vectors seen in this (table, bucket) within the state TTL,
  * as parallel sequences (stable product encoding).
  */
case class EmbBucketState(ids: Seq[Long], vecs: Seq[Array[Float]], nrms: Seq[Double])

/** Streaming near-duplicate detection over an embedding stream — the
  * Structured Streaming twin of `Dedup.embeddingPairsLsh`.
  *
  * Each arriving vector buckets into `numTables` hyperplane-LSH
  * tables (the same deterministic, stateless bucket function as the
  * batch path — a vector's buckets are computable in isolation, so
  * batch and stream agree by construction). Per (table, bucket) a
  * custom keyed state (flatMapGroupsWithState) holds the vectors seen
  * within the TTL; a new arrival compares against ONLY its bucket's
  * residents — state is bounded by bucket occupancy × TTL, never the
  * stream history, and the quadratic cost stays inside buckets
  * exactly like the batch plan.
  *
  * Emission is at-least-once across tables (a pair colliding in two
  * tables emits twice — downstream sinks dedup on (id_a, id_b), or a
  * bounded consumer takes `.dropDuplicates`); within one bucket each
  * pair emits once.
  *
  * `stateTtl = Some(d)` expires idle buckets after `d` of processing
  * time — the unbounded-stream posture. NOTE: with a processing-time
  * timeout registered, the micro-batch engine schedules batches
  * indefinitely to fire future timeouts, so
  * `StreamingQuery.processAllAvailable()` never returns — bounded
  * batch-equivalence runs (and tests) must pass `stateTtl = None`
  * (no timeout; state lives for the bounded run's duration, which is
  * exactly the batch-twin semantics).
  */
object StreamingDedup {

  /** Streaming exact dedup — the Structured Streaming twin of
    * `Dedup.exact`: a streaming aggregate keyed on the md5 content
    * hash. State is one row per DISTINCT content (hash, min id,
    * count) — bounded by the dedup'd corpus size, never the stream
    * length — and min/count are arrival-order-independent, so the
    * final table equals the batch answer by construction (unlike
    * streaming dropDuplicates, which keeps whichever copy arrives
    * first). Unbounded deployments run it in update mode behind a
    * watermark; the bounded gate runs complete mode so the final
    * memory table IS the batch result.
    */
  def exactDedupStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(md5(col(textCol)).as("content_hash"), col(idCol).as("id"))
      .groupBy("content_hash")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))

  private def jvmRound6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Left-to-right double dot product — bit-identical to the codegen'd
    * DotProduct kernel (same order, same per-element widening).
    */
  private def jvmDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length && i < b.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def embeddingPairsStream(emb: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, nbits: Int = 4, numTables: Int = 16,
                           stateTtl: Option[String] = Some("1 hour")): DataFrame = {
    import emb.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf = stateTtl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    val bucketed = emb
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", l2Norm(col("vec")))
      .select(col("id"), col("vec"), col("nrm"),
        explode(array((0 until numTables).map(t =>
          struct(lit(t).as("t"),
            hyperplaneBucket(col("vec"), nbits, seed = 7 + t).as("bucket"))): _*)).as("tb"))
      .select(col("tb.t").as("t"), col("tb.bucket").as("bucket"),
              col("id"), col("vec"), col("nrm"))
      .as[(Int, Long, Long, Array[Float], Double)]
    bucketed
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[EmbBucketState, (Long, Long, Double)](
        OutputMode.Append, timeoutConf) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, Array[Float], Double)],
         state: GroupState[EmbBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(EmbBucketState(Nil, Nil, Nil))
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            for ((_, _, id, vec, nrm) <- rows.toSeq.sortBy(_._3)) {
              if (!st.ids.contains(id)) {
                var i = 0
                while (i < st.ids.length) {
                  val denom = nrm * st.nrms(i)
                  if (denom != 0.0) {
                    val cos = jvmRound6(jvmDot(vec, st.vecs(i)) / denom)
                    if (cos >= threshold)
                      out += ((math.min(id, st.ids(i)), math.max(id, st.ids(i)), cos))
                  }
                  i += 1
                }
                st = EmbBucketState(st.ids :+ id, st.vecs :+ vec, st.nrms :+ nrm)
              }
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
      .toDF("id_a", "id_b", "cos")
  }
}
