package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingEvents
import graft.operators.{Events, Multimodal}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** File-source streams need a directory; stage the fixture into a
    * temp dir in the canonical stream format (long-µs `ts`,
    * [[StreamingEvents.rawSchema]]) — same normalization the
    * SparkEntry stagers apply, so the fixture's physical timestamp
    * encoding is irrelevant here.
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    Tables.events(spark, sf001)
      .withColumn("ts", unix_micros(col("ts")))
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
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

  test("watermark DROPS late rows: two-batch file stream, append mode emits finalized windows only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_late")
    def write(rows: Seq[(Long, Long, Long, String, Double, String)],
              name: String, mtime: Long): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft_stream_late_stage")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir.toFile, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    // one event per hour at HH:15 (off window/watermark boundaries);
    // batch 0 = hours 0..9, so the watermark lands at 09:15 − 2h =
    // 07:15. Late-event FILTERING uses the PREVIOUS batch's watermark
    // (eviction the current one — the SPARK-40925 split), so the drop
    // takes effect two batches after the advancing data: batch 1 is a
    // filler (open window, never emitted) that commits 07:15 as the
    // late-event bound, batch 2 replays hours 1 and 2 — both now far
    // below it and DROPPED
    val h = 3600L * 1000000L // canonical stream ts is epoch-µs
    val base = 1704067200L * 1000000L + 900L * 1000000L
    val onTime = (0 until 10).map(i => (i.toLong, base + i * h, 1L, "a", 1.0, "{}"))
    val filler = Seq((50L, base + 8 * h + 60L * 1000000L, 3L, "a", 1.0, "{}"))
    val late = Seq((100L, base + 1 * h, 2L, "a", 1.0, "{}"),
                   (101L, base + 2 * h, 2L, "a", 1.0, "{}"))
    val t0 = System.currentTimeMillis() - 600000
    write(onTime, "b0.parquet", t0)
    write(filler, "b1.parquet", t0 + 60000)
    write(late, "b2.parquet", t0 + 120000)
    val got = StreamingEvents.runToCompletion(spark,
      StreamingEvents.tumblingAgg(StreamingEvents.readEvents(spark, dir.toString)),
      "late_drop_spec", mode = "append")
      .select("window_start", "n_events")
      .as[(java.sql.Timestamp, Long)].collect().toSeq.sortBy(_._1.getTime)
    // finalized = window end ≤ 07:15 → starts 00:00..06:00; every count
    // stays 1: the replayed rows were DROPPED, not re-aggregated, and
    // no window row appears twice (a failed drop would re-emit hours
    // 1-2 under the already-passed watermark)
    val expect = (0 until 7).map { i =>
      (new java.sql.Timestamp(1704067200000L + i * 3600000L), 1L)
    }
    assert(got == expect,
      s"expected 7 finalized windows with count 1, got $got")
  }

  test("streaming dedup keeps each event_id once within the horizon") {
    val stream = StreamingEvents.readEvents(spark, eventsDir)
    val got = StreamingEvents.runToCompletion(
      spark, StreamingEvents.dedupEvents(stream), "t_dedup")
    val n = Tables.events(spark, sf001).count()
    assert(got.count() == n) // event_ids unique in testdata → nothing dropped
    assert(got.select("event_id").distinct().count() == n)
  }

  test("dropDuplicatesWithinWatermark swallows in-horizon replays; stale keys evict") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dup")
    def write(rows: Seq[(Long, Long, Long, String, Double, String)],
              name: String, mtime: Long): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft_stream_dup_stage")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir.toFile, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val h = 3600L * 1000000L
    val base = 1704067200L * 1000000L + 900L * 1000000L
    // batch 0: ids 0..9, one per hour. Watermark after it = 09:15−2h
    // = 07:15. Batch 1 replays id 9 (ts 09:15, state present → must
    // be swallowed) and adds the fresh id 100.
    val b0 = (0 until 10).map(i => (i.toLong, base + i * h, 1L, "a", 1.0, "{}"))
    val b1 = Seq((9L, base + 9 * h, 1L, "a", 1.0, "{}"),
                 (100L, base + 9 * h + 60L * 1000000L, 2L, "a", 1.0, "{}"))
    val t0 = System.currentTimeMillis() - 600000
    write(b0, "b0.parquet", t0)
    write(b1, "b1.parquet", t0 + 60000)
    val got = StreamingEvents.runToCompletion(spark,
      StreamingEvents.dedupWithinWatermark(
        StreamingEvents.readEvents(spark, dir.toString)),
      "dup_spec", mode = "append")
      .select("event_id").as[Long].collect().toSeq.sorted
    // the replay of id 9 vanished; everything else exactly once
    assert(got == ((0L until 10L) :+ 100L), s"got $got")
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

  test("outer stream-stream join: unmatched click emits null-padded at watermark expiry") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_outer")
    def write(rows: Seq[(Long, Long, Long, String, Double, String)],
              name: String, mtime: Long): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft_stream_outer_stage")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir.toFile, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val m = 60L * 1000000L // µs per minute
    val base = 1704067200L * 1000000L
    // u1's click converts 30 min later; u2's click never converts
    val real = Seq(
      (1L, base, 1L, "click", 1.0, "{}"),
      (2L, base + 30 * m, 1L, "purchase", 5.0, "{}"),
      (3L, base + 10 * m, 2L, "click", 1.0, "{}"))
    // two flush batches push the watermark past every real row's
    // state expiry; sentinel users match nothing
    def flush(id: Long, ts: Long) = Seq(
      (id, ts, -1L, "click", 0.0, "{}"), (id - 1, ts, -2L, "purchase", 0.0, "{}"))
    val t0 = System.currentTimeMillis() - 600000
    write(real, "b0.parquet", t0)
    write(flush(-1L, base + 600 * m), "b1.parquet", t0 + 60000)
    write(flush(-3L, base + 1200 * m), "b2.parquet", t0 + 120000)
    val got = StreamingEvents.runToCompletion(spark,
      StreamingEvents.attributionJoinOuter(
        StreamingEvents.readEvents(spark, dir.toString)),
      "outer_join_spec", mode = "append")
      .where(col("click_id") >= 0)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 1L, Some(2L), Some(30L * 60 * 1000)),
      (2L, 3L, None, None)),
      s"got $got — the unmatched click must emit null-padded, the matched one exactly once")
  }

  test("full-outer stream-stream join: unmatched rows on BOTH sides emit null-padded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_full")
    def write(rows: Seq[(Long, Long, Long, String, Double, String)],
              name: String, mtime: Long): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft_stream_full_stage")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir.toFile, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val m = 60L * 1000000L
    val base = 1704067200L * 1000000L
    // u1 converts; u2's click dangles; u3's purchase is ORGANIC (no
    // click) — the side left-outer cannot express
    val real = Seq(
      (1L, base, 1L, "click", 1.0, "{}"),
      (2L, base + 30 * m, 1L, "purchase", 5.0, "{}"),
      (3L, base + 10 * m, 2L, "click", 1.0, "{}"),
      (4L, base + 20 * m, 3L, "purchase", 7.0, "{}"))
    def flush(id: Long, ts: Long) = Seq(
      (id, ts, -1L, "click", 0.0, "{}"), (id - 1, ts, -2L, "purchase", 0.0, "{}"))
    val t0 = System.currentTimeMillis() - 600000
    write(real, "b0.parquet", t0)
    write(flush(-1L, base + 600 * m), "b1.parquet", t0 + 60000)
    write(flush(-3L, base + 1200 * m), "b2.parquet", t0 + 120000)
    val got = StreamingEvents.runToCompletion(spark,
      StreamingEvents.attributionJoinFull(
        StreamingEvents.readEvents(spark, dir.toString)),
      "full_join_spec", mode = "append")
      .where(coalesce(col("click_id"), lit(0L)) >= 0 &&
             coalesce(col("purchase_id"), lit(0L)) >= 0)
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, Some(1L), Some(2L), Some(30L * 60 * 1000)),
      (2L, Some(3L), None, None),
      (3L, None, Some(4L), None)),
      s"got $got — organic purchase and dangling click must both null-pad")
  }

  test("stream-stream interval join equals the batch join on bounded input") {
    val stream = StreamingEvents.readEvents(spark, eventsDir)
    val got = StreamingEvents.runToCompletion(spark,
      StreamingEvents.attributionJoin(
        stream.where(col("event_type") === "click"),
        stream.where(col("event_type") === "purchase")),
      "t_ssjoin", mode = "append")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ev = Tables.events(spark, sf001)
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") && col("cts") <= col("pts"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_millis(col("pts")) - unix_millis(col("cts"))).as("gap_ms"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty && got == batch,
      s"stream join ${got.size} pairs != batch ${batch.size}")
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

  test("stream-maintained BM25 index equals the all-at-once build, re-ingest included") {
    import graft.streaming.StreamingIndex
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_ingest")
    def write(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft_bm25_ingest_stage")
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir.toFile, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 600000
    write(Seq((1L, "alpha beta"), (2L, "gamma delta")), "b0.parquet", t0)
    // batch 1 carries a NEW doc and a RE-INGEST of doc 2 with changed
    // text — the upsert path must replace doc 2's postings everywhere
    write(Seq((3L, "epsilon alpha"), (2L, "zeta eta")), "b1.parquet", t0 + 60000)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_bm25_stream_${System.nanoTime()}"
    StreamingIndex.bm25IngestToCompletion(spark, dir.toString, path, numBuckets = 16)
    val full = Seq((1L, "alpha beta"), (2L, "zeta eta"), (3L, "epsilon alpha"))
      .toDF("doc_id", "text")
    Seq(Seq("gamma"), Seq("alpha", "zeta"), Seq("epsilon")).foreach { terms =>
      val served = TextAnalysis.bm25TopKIndexed(spark, path, terms, k = 5,
        numBuckets = 16).collect().toSeq
      val direct = TextAnalysis.bm25TopK(full, "doc_id", "text", terms, k = 5)
        .collect().toSeq
      assert(served == direct, s"stream-built index must serve the final corpus for $terms")
    }
  }

  test("audio chunks: overlapping windows cover the duration, tail clamped, exact sample counts") {
    // 25 s @ 16 kHz, 10 s chunks with 2 s overlap → starts every 8 s
    val meta = Seq(Multimodal.AudioMeta(1L, 10L, 25000L, 16000L)).toDS()
    val got = Multimodal.audioChunks(meta, chunkMs = 10000L, overlapMs = 2000L)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_ms", "end_ms", "n_samples")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 10000L, 160000L),
      (1L, 8000L, 18000L, 160000L),
      (2L, 16000L, 25000L, 144000L),
      (3L, 24000L, 25000L, 16000L)),
      s"hand-computed chunk plan mismatch: $got")
    // an overlap as large as the chunk would loop forever — refused
    intercept[IllegalArgumentException] {
      Multimodal.audioChunks(meta, chunkMs = 1000L, overlapMs = 1000L)
    }
  }

  test("shard manifest: fixed-boundary packing — offsets exact, shards bounded, partitioning-independent") {
    // hand-sized blobs: 100-byte cap, items 60/60/60/30/120 in id order
    // → prefixes 0/60/120/180/210 → shards 0/0/1/1/2
    val docs = Seq((1L, "a" * 60), (2L, "b" * 60), (3L, "c" * 60),
      (4L, "d" * 30), (5L, "e" * 120)).toDF("doc_id", "text")
    val m = Multimodal.withPayload(docs, "text")
    val got = Multimodal.shardManifest(m, "doc_id", "payload",
        shardBytes = 100L, numBuckets = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_bytes", "stream_offset", "shard_id", "shard_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 60L, 0L, 0L, 0L),
      (2L, 60L, 60L, 0L, 60L),
      (3L, 60L, 120L, 1L, 20L),
      (4L, 30L, 180L, 1L, 80L),
      (5L, 120L, 210L, 2L, 10L)),
      s"hand-computed manifest mismatch: $got")
    // invariants at fixture scale: conservation (offsets chain), offset
    // inside the shard, realized shard size ≤ cap + one item, and the
    // result is a pure function of the data (not its partitioning)
    val fx = Multimodal.withPayload(
      spark.read.parquet(s"$sf001/documents.parquet"), "text")
    val a = Multimodal.shardManifest(fx, "doc_id", "payload", shardBytes = 16384L)
    val rows = a.orderBy("doc_id")
      .select("doc_id", "n_bytes", "stream_offset", "shard_id", "shard_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    rows.sliding(2).foreach { case Seq(p, n) =>
      assert(n._3 == p._3 + p._2, s"offset chain broken at ${n._1}")
    }
    assert(rows.forall(r => r._5 >= 0 && r._5 < 16384L))
    val maxItem = rows.map(_._2).max
    rows.groupBy(_._4).foreach { case (sid, items) =>
      assert(items.map(_._2).sum <= 16384L + maxItem,
        s"shard $sid overshoots by more than one item")
    }
    val b = Multimodal.shardManifest(
      fx.repartition(7, col("doc_id")), "doc_id", "payload", shardBytes = 16384L)
      .orderBy("doc_id")
      .select("doc_id", "n_bytes", "stream_offset", "shard_id", "shard_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(b == rows, "manifest must not depend on input partitioning")
  }

  test("interleaved pack: closed-form tile count equals the tile explode; cost and offsets consistent") {
    val raw = spark.read.parquet(s"$sf001/documents.parquet")
    val docs = Multimodal.withPayload(raw, "text")
    val meta = Multimodal.extractMeta(docs, "doc_id")
    val packed = Multimodal.interleavedPack(meta, raw, "doc_id", "text",
      tileW = 256, tileH = 256, overlap = 64, tokensPerTile = 64,
      seqTokens = 2048L)
    val tiles = Multimodal.imageTiles(meta, 256, 256, 64)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(packed.join(tiles, "doc_id")
      .where(col("n_tiles") =!= col("n")).count() == 0,
      "closed-form tile count must equal the explode count")
    val rows = packed.orderBy("doc_id")
      .select("n_text_tokens", "n_tiles", "n_tokens", "stream_offset", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.forall(r => r._3 == r._1 + r._2 * 64))
    assert(rows.forall(r => r._5 >= 0 && r._5 < 2048L))
    rows.sliding(2).foreach { case Seq(p, n) =>
      assert(n._4 == p._4 + p._3, "token-offset chain broken")
    }
  }

  test("image tiles: overlapping grid covers the image, edge tiles clamped, exact areas") {
    // 500x300 image, 256x256 tiles, 64 overlap → starts every 192 px:
    // x0 ∈ {0, 192, 384}, y0 ∈ {0, 192}
    val meta = Seq(Multimodal.MediaMeta(1L, "image/png", 10L, "x",
      500, 300, 1, Array.empty[Float])).toDS()
    val got = Multimodal.imageTiles(meta, tileW = 256, tileH = 256, overlap = 64)
      .orderBy("tile_row", "tile_col")
      .select("tile_row", "tile_col", "x0", "y0", "x1", "y1", "n_px")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 0L, 0L, 256L, 256L, 65536L),
      (0L, 1L, 192L, 0L, 448L, 256L, 65536L),
      (0L, 2L, 384L, 0L, 500L, 256L, 29696L),
      (1L, 0L, 0L, 192L, 256L, 300L, 27648L),
      (1L, 1L, 192L, 192L, 448L, 300L, 27648L),
      (1L, 2L, 384L, 192L, 500L, 300L, 12528L)),
      s"hand-computed tile grid mismatch: $got")
    // a tile fully inside the image keeps the full area; the corner
    // tile is clamped in BOTH dimensions
    intercept[IllegalArgumentException] {
      Multimodal.imageTiles(meta, tileW = 64, tileH = 64, overlap = 64)
    }
  }

  test("stream-maintained KMV sketch equals the direct cut after every batch count") {
    import graft.operators.Analytics
    import graft.streaming.StreamingIndex
    val all = (1L to 300L).map(i => (i, s"t$i", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def stageFile(dir: java.io.File, df: org.apache.spark.sql.DataFrame,
                  name: String, mtime: Long): Unit = {
      val stage = new java.io.File(dir, s"stage_$name")
      df.coalesce(1).write.parquet(stage.getPath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      stage.listFiles().foreach(_.delete()); stage.delete()
      dst.setLastModified(mtime)
    }
    val dir = java.nio.file.Files.createTempDirectory("kmv_stream_").toFile
    // three deterministic micro-batch files, mtime-ordered
    Seq(0L, 1L, 2L).foreach { m =>
      stageFile(dir, all.where(col("doc_id") % 3 === m),
        s"batch$m.parquet", 1000000L + m * 60000L)
    }
    val path = java.nio.file.Files.createTempDirectory("kmv_out_").toFile.getPath + "/sketch"
    StreamingIndex.kmvIngestToCompletion(spark, dir.getPath, path, k = 12)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("key", "h").as[(Long, Long)].collect().toSet
    assert(rows(spark.read.parquet(path)) ==
           rows(Analytics.bottomKOf(all, "doc_id", 12)),
      "three folded micro-batches must equal the single-pass cut")
    // n < k edge: a 5-key population keeps all 5 and reports it exactly
    val tinyDir = java.nio.file.Files.createTempDirectory("kmv_tiny_").toFile
    stageFile(tinyDir, all.where(col("doc_id") <= 5), "b0.parquet", 1000000L)
    val tinyPath = java.nio.file.Files.createTempDirectory("kmv_out2_").toFile.getPath + "/sketch"
    StreamingIndex.kmvIngestToCompletion(spark, tinyDir.getPath, tinyPath, k = 12)
    val est = Analytics.bottomKRollup(spark.read.parquet(tinyPath), k = 12)
      .select("est_distinct").as[Double].collect()
    assert(est.length == 5 && est.forall(_ == 5.0), est.toSeq.toString)
  }
}
