package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twins of graft.operators.Events: the SAME
  * aggregations run incrementally with watermark-bounded state. The
  * reference is a snapshot-refresh batch cron (SURVEY §1.1); this is
  * the scale path when the OData/event feed becomes continuous —
  * state is bounded by the watermark, so a 100 TB/day stream holds
  * only the open windows in state, never the history.
  */
/** Keyed state for [[StreamingEvents.funnelState]]: the user's current
  * step and its completion time in MICROSECONDS — the whole per-user
  * footprint. Micros, not millis: the batch funnel compares timestamps
  * at full precision, and a ms-truncated comparison would misorder
  * same-millisecond events.
  */
case class FunnelProgress(step: Int, lastTsUs: Long)

/** One emitted funnel advance: user reached `reached_step` at `ts`. */
case class FunnelHit(user_id: Long, reached_step: Long, ts: java.sql.Timestamp)

object StreamingEvents {

  /** Schema of the CANONICAL staged events stream: `ts` as long
    * epoch-micros. The stagers (SparkEntry.stagedEventsDir /
    * stagedLateEventsDir) write this format via Tables.events +
    * unix_micros, so the stream contract is independent of the
    * fixture's physical timestamp encoding (ns-long vs µs-NTZ).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of canonical staged events
    * parquet (long-µs `ts`, converted to TimestampType on ingest
    * exactly like the batch path). `maxFilesPerTrigger` sets the
    * micro-batch grain: gates proving per-batch watermark progression
    * (late-data, dedup-replay) need 1; gates that only need the
    * watermark to pass the data ONCE (the outer-join flush staging)
    * group the data file with the first flush file — every stateful
    * batch pays state-store setup per shuffle partition, so fewer
    * batches is directly less fixed overhead with identical output
    * (the second flush batch still arrives later and evicts).
    */
  def readEvents(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts)"))

  /** Tumbling-window count+sum with a watermark: append-mode capable,
    * state evicted `delay` past the window end.
    */
  def tumblingAgg(events: DataFrame, windowExpr: String = "1 hour",
                  delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowExpr).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Hopping (sliding) window count+sum — same Expand + incremental
    * aggregate as the batch Events.hoppingAgg; state holds
    * window÷slide open windows per key, still watermark-bounded.
    */
  def hoppingAgg(events: DataFrame, windowExpr: String = "1 hour",
                 slideExpr: String = "30 minutes",
                 delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowExpr, slideExpr).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Streaming dedup on event_id within the watermark horizon —
    * the streaming form of exact dedup (state = one key per id seen
    * inside the horizon, not the full history).
    */
  def dedupEvents(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicates("event_id", "ts")

  /** Streaming exact dedup with WATERMARK-BOUNDED state —
    * `dropDuplicatesWithinWatermark`: first arrival of each event_id
    * emits immediately (append mode), replays arriving within
    * `delay` of the original are swallowed, and the key's state is
    * EVICTED once the watermark passes it — so state size follows
    * the horizon, not the stream's full key history (the difference
    * between a dedup that survives a year of uptime at 100 TB/day
    * and one that OOMs). Unlike [[dedupEvents]] the event-time
    * column is NOT part of the key, which is what makes the state
    * evictable while still deduping same-id replays at differing
    * arrival times.
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user (gap-based), the streaming twin of
    * Events.sessionize.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("w.end").as("session_end"), col("n_events"))

  /** Per-user funnel progress as CUSTOM KEYED STATE — the streaming
    * twin of Events.funnel, and the flatMapGroupsWithState shape for
    * logic no built-in stateful operator expresses (ordered step
    * sequencing). State per user is one (step, ts) pair — bytes per
    * ACTIVE user, never per event — and expires via EventTimeTimeout
    * `stateHorizonMs` after the user's last advance, so state stays
    * bounded on an unbounded stream. Emits one row per step a user
    * completes (append mode).
    *
    * Within a micro-batch, events process in (ts, type) order, so the
    * strictly-after semantics match the batch operator; cross-batch
    * ordering is the file/source order, as with any streaming
    * aggregation over late data.
    */
  /** Timestamp → epoch microseconds (full fractional-second precision;
    * `getTime` alone truncates to ms and would misorder/mis-compare
    * same-millisecond events against the full-precision batch oracle).
    */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  def funnelState(events: DataFrame, steps: Seq[String],
                  delay: String = "2 hours",
                  stateHorizonMs: Long = 7L * 24 * 3600 * 1000): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stepsArr = steps.toArray
    events
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toIndexedSeq.sortBy(e => (tsMicros(e._3), e._2))
            var st = state.getOption.getOrElse(FunnelProgress(0, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
            for ((_, tpe, ts) <- sorted) {
              if (st.step < stepsArr.length && tpe == stepsArr(st.step) &&
                  tsMicros(ts) > st.lastTsUs) {
                st = FunnelProgress(st.step + 1, tsMicros(ts))
                out += FunnelHit(user, st.step.toLong, ts)
              }
            }
            state.update(st)
            // expire horizon after the newest event seen for this user;
            // clamp above the watermark (a timeout in the past throws)
            val maxTsMs = sorted.last._3.getTime
            state.setTimeoutTimestamp(
              math.max(maxTsMs + stateHorizonMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
      .toDF()
  }

  /** Run a streaming query over a bounded directory to completion and
    * return the materialized result (memory sink). Batch-equivalence
    * harness for tests: the streaming twin must agree with the batch
    * operator on the same bounded input.
    */
  /** Stream-STREAM interval join: each purchase matched to the same
    * user's clicks in the `windowExpr` before it — last-touch
    * attribution as a continuous query. Both sides carry a watermark
    * and the join condition bounds event time in BOTH directions, so
    * Spark's symmetric hash join evicts state once the watermark
    * passes `ts + windowExpr` — at 100 TB/day each executor holds only
    * the trailing window of its user_id hash range, never history.
    * On bounded replay-to-completion the inner join emits exactly the
    * batch join's matches (the watermark governs eviction, not
    * matching), so the result is oracle-checkable with plain SQL.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      windowExpr: String = "1 hour",
                      delay: String = "2 hours"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    c.join(p, expr(
        s"""user_id = p_user
           |AND click_ts >= purchase_ts - INTERVAL $windowExpr
           |AND click_ts <= purchase_ts""".stripMargin))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("gap_ms"))
  }

  /** LEFT-OUTER twin of [[attributionJoin]]: unmatched clicks emit
    * null-padded once the watermark passes their join-state expiry —
    * the semantic the inner join never exercises. The watermark is
    * applied to the source BEFORE the event-type split, so rows of
    * any type (including a staged far-future flush batch) advance
    * it; on a bounded stream that flush is what lets the final
    * unmatched state actually emit instead of sitting in the store
    * forever. Matched pairs are identical to the inner join.
    */
  def attributionJoinOuter(events: DataFrame, windowExpr: String = "1 hour",
                           delay: String = "2 hours"): DataFrame = {
    val wm = events.withWatermark("ts", delay)
    val c = wm.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
    val p = wm.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"))
    c.join(p, expr(
        s"""user_id = p_user
           |AND click_ts >= purchase_ts - INTERVAL $windowExpr
           |AND click_ts <= purchase_ts""".stripMargin), "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("gap_ms"))
  }

  /** FULL-outer watermarked stream-stream interval join: every click
    * AND every purchase appears — unmatched rows on EITHER side
    * null-pad and emit when the watermark expires their join state
    * (the [[attributionJoinOuter]] semantics, symmetric). The
    * user_id is coalesced across sides because an unmatched
    * purchase has no click-side key. The extra semantic over
    * left-outer is purchase-side timeout emission: "purchases with
    * no attributable click" is precisely the organic-conversion
    * stream a marketing pipeline splits off.
    */
  def attributionJoinFull(events: DataFrame, windowExpr: String = "1 hour",
                          delay: String = "2 hours"): DataFrame = {
    val wm = events.withWatermark("ts", delay)
    val c = wm.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
    val p = wm.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"))
    c.join(p, expr(
        s"""user_id = p_user
           |AND click_ts >= purchase_ts - INTERVAL $windowExpr
           |AND click_ts <= purchase_ts""".stripMargin), "full_outer")
      .select(coalesce(col("user_id"), col("p_user")).as("user_id"),
        col("click_id"), col("purchase_id"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("gap_ms"))
  }

  /** `noDataBatches = false` skips the trailing empty micro-batches
    * the engine otherwise runs to advance eviction after the data is
    * exhausted — each one pays full incremental-planning +
    * state-store-load cost. Safe ONLY for gates whose every output
    * row emits during a DATA batch: the stream-stream joins (matches
    * emit on arrival; outer null-pads emit during the later flush
    * batch, whose eviction watermark the PREVIOUS data batch already
    * set). Windowed-aggregate gates need the default: their final
    * windows only emit once a no-data batch advances the watermark
    * past the window end.
    */
  def runToCompletion(spark: SparkSession, df: DataFrame, name: String,
                      mode: String = "append",
                      noDataBatches: Boolean = true): DataFrame = {
    // stateful queries pay state-store setup PER shuffle partition per
    // micro-batch (a stream-stream join loads FOUR stores per
    // partition per batch); every op driven through here is
    // partition-count-independent by contract (hash-keyed state), so
    // the bounded gate runs use 2 partitions instead of the session's
    // 32 — on a real cluster the production query would size this to
    // its key space
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "2")
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ndPrev = spark.conf.get(ndKey)
    spark.conf.set(ndKey, noDataBatches.toString)
    // Checkpoint (offsets/commits + the HDFS-backed state-store delta
    // files) on tmpfs when the box has one — the bounded gate's
    // checkpoint is throwaway by construction (fresh dir per run,
    // memory sink), so durability of /dev/shm is irrelevant while its
    // write latency is what every micro-batch commit serializes on.
    // Production queries point this at durable storage instead.
    val ckRoot = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
                 else System.getProperty("java.io.tmpdir")
    val ck = s"$ckRoot/graft_ck_${name}_${System.nanoTime()}"
    try {
      val q = df.writeStream.outputMode(mode).format("memory")
        .option("checkpointLocation", ck).queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      spark.conf.set(key, prev)
      spark.conf.set(ndKey, ndPrev)
      // best-effort cleanup — tmpfs is RAM; leaking dirs there is a cost
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(ck))
    }
    spark.table(name)
  }
}
