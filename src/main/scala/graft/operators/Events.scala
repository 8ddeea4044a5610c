package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators, written so the SAME transformation runs in
  * batch (DuckDB-oracleable) and under Structured Streaming (see
  * graft.streaming.StreamingEvents for the readStream twins +
  * watermarking). `window(ts, …)` and `dropDuplicates` are both
  * streaming-compatible; the batch forms here are what the driver's
  * correctness gate checks.
  */
object Events {

  /** Tumbling-window aggregate: count + exact money sum per
    * (window, event_type). In streaming this runs with a watermark and
    * incremental state; in batch it's a plain hash aggregate on the
    * truncated timestamp.
    */
  def tumblingAgg(events: DataFrame, windowExpr: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowExpr).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Analytics.moneySum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Hopping (sliding) window aggregate: `windowExpr`-wide windows
    * every `slideExpr`. Spark's `window()` expands each event into
    * window÷slide rows (an Expand node, not a self-join), then one
    * hash aggregate — the same plan Structured Streaming runs
    * incrementally with a watermark.
    */
  def hoppingAgg(events: DataFrame, windowExpr: String = "1 hour",
                 slideExpr: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowExpr, slideExpr).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Analytics.moneySum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** First-occurrence dedup per (user, event_type): streaming
    * `dropDuplicates` semantics expressed as a batch window (the
    * oracle-checkable form). Keeps the earliest event by (ts,
    * event_id).
    */
  def firstOccurrence(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .orderBy("user_id", "event_type")
  }

  /** Sessionization: a new session starts after `gapMinutes` of
    * inactivity per user. Classic lag + cumulative-sum session ids —
    * per-user windows, no global sort; the streaming twin is
    * `session_window(ts, gap)`.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** JSON prop extraction: schema-on-read over the string `props`
    * column (get_json_object → codegen'd path extraction, no UDF).
    */
  def extractProps(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
      .orderBy("event_id")
}
