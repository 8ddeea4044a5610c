package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingEvents
import graft.operators.{Events, Multimodal}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** File-source streams need a directory; testdata ships single
    * parquet files — stage one into a temp dir.
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling agg equals the batch operator on bounded input") {
    val batch = Events.tumblingAgg(Tables.events(spark, sf001))
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    val stream = StreamingEvents.readEvents(spark, eventsDir)
    // complete mode: bounded input, final state = batch answer
    val got = StreamingEvents.runToCompletion(
      spark, StreamingEvents.tumblingAgg(stream), "t_agg", mode = "complete")
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    assert(got == batch)
  }

  test("streaming hopping agg equals the batch operator on bounded input") {
    val batch = Events.hoppingAgg(Tables.events(spark, sf001))
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    val stream = StreamingEvents.readEvents(spark, eventsDir)
    val got = StreamingEvents.runToCompletion(
      spark, StreamingEvents.hoppingAgg(stream), "h_agg", mode = "complete")
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    assert(got == batch)
  }

  test("streaming dedup keeps each event_id once within the horizon") {
    val stream = StreamingEvents.readEvents(spark, eventsDir)
    val got = StreamingEvents.runToCompletion(
      spark, StreamingEvents.dedupEvents(stream), "t_dedup")
    val n = Tables.events(spark, sf001).count()
    assert(got.count() == n) // event_ids unique in testdata → nothing dropped
    assert(got.select("event_id").distinct().count() == n)
  }

  test("streaming session windows match batch sessionize session count") {
    val stream = StreamingEvents.readEvents(spark, eventsDir)
    val got = StreamingEvents.runToCompletion(
      spark, StreamingEvents.sessionAgg(stream), "t_sess", mode = "complete")
    val batchSessions = Events.sessionize(Tables.events(spark, sf001)).count()
    assert(got.count() == batchSessions)
    // per-user totals must agree too
    val a = got.groupBy("user_id").agg(sum("n_events").as("n")).orderBy("user_id")
      .as[(Long, Long)].collect().toSeq
    val b = Events.sessionize(Tables.events(spark, sf001))
      .groupBy("user_id").agg(sum("n_events").as("n")).orderBy("user_id")
      .as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("streaming funnel custom state matches batch funnel on bounded input") {
    val steps = Seq("view", "click", "purchase")
    val batch = Events.funnel(Tables.events(spark, sf001), steps)
      .as[(Long, Long)].collect().toMap
    val stream = StreamingEvents.readEvents(spark, eventsDir)
    val hits = StreamingEvents.runToCompletion(
      spark, StreamingEvents.funnelState(stream, steps), "t_funnel")
    // streaming emits one row per advance; the max step per user must
    // equal the batch operator's reached_step
    val got = hits.groupBy("user_id").agg(max("reached_step").as("r"))
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty && got == batch)
  }

  test("streaming embedding near-dup pairs equal the batch LSH pairs on bounded input") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    val sub = Tables.embeddings(spark, sf001).where(col("vec_id") < 150)
    val batch = Dedup.embeddingPairsLsh(sub, "vec_id", "embedding",
        threshold = 0.25, nbits = 4, numTables = 8)
      .as[(Long, Long, Double)].collect().toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_stream_emb")
    sub.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .parquet(dir.toString)
    val got = StreamingEvents.runToCompletion(
      spark, StreamingDedup.embeddingPairsStream(stream, "vec_id", "embedding",
        threshold = 0.25, nbits = 4, numTables = 8, stateTtl = None), "t_embdedup")
      .as[(Long, Long, Double)].collect().toSet // at-least-once → set compare
    assert(batch.nonEmpty && got == batch)
  }

  test("multimodal: partition-batched stub decode produces typed, deterministic metadata") {
    val docs = Multimodal.withPayload(Tables.documents(spark, sf001), "text")
    val meta = Multimodal.extractMeta(docs, "doc_id")
    val rows = meta.collect()
    assert(rows.length == 500)
    assert(rows.forall(m => m.n_bytes > 0 && m.sha256.length == 64 && m.feature.length == 8))
    // deterministic: second run identical
    val again = Multimodal.extractMeta(docs, "doc_id").collect()
    assert(rows.map(_.sha256).toSeq == again.map(_.sha256).toSeq)
    // frame sampling plan: 0-based indices stepped by k, bounded by n_frames
    val plan = Multimodal.frameSamplePlan(meta, everyK = 2)
    assert(plan.where(col("frame_idx") >= 5).count() == 0) // stub caps n_frames at 4
    // resize plan: inside the box, aspect preserved (within floor), no upscale
    val rs = Multimodal.resizePlan(meta, maxW = 256, maxH = 256)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(rs.forall { case (_, w, h, ow, oh) =>
      ow <= 256 && oh <= 256 && ow <= w && oh <= h &&
        // floor() may land a px under the box; unscaled stays exact
        (ow == w || ow >= 255 || oh >= 255) })
  }
}
