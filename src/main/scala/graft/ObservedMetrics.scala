package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces the `observe(...)` metrics the operators attach to their
  * plans — today the jaccard df-cut counters (`jaccard_df_cut_<n>`:
  * dropped_shingles / max_doc_freq_seen, see Dedup.jaccardPairs).
  *
  * The df-cut is deliberate scale-safety, but a caller whose corpus
  * suddenly trips it (dropped_shingles > 0) should hear about it
  * without wiring a listener by hand — register this once per session
  * and every affected query logs a warning with the counters.
  */
object ObservedMetrics {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Register a listener that invokes `onDrop(metricName,
    * droppedShingles, maxDocFreqSeen)` after every successful query
    * whose plan carried a df-cut metric with dropped_shingles > 0.
    * Default action: a WARN log line. Returns the listener so callers
    * (and tests) can unregister it.
    */
  def registerDfCutWarnings(
      spark: SparkSession,
      onDrop: (String, Long, Long) => Unit = defaultWarn): QueryExecutionListener = {
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        // qe.observedMetrics doesn't see through AdaptiveSparkPlanExec
        // (AQE re-plans under it), so ALSO walk the executed plan for
        // CollectMetricsExec nodes — union of both views
        val metrics = qe.observedMetrics ++
          collectMetricsNodes(qe.executedPlan).map(c => c.name -> c.collectedMetrics)
        metrics.foreach { case (name, row) =>
          if (name.startsWith("jaccard_df_cut")) {
            // sum(long) is LongType but max(size(...)) is IntegerType —
            // read both through Number; either can be null on empty input
            def num(field: String): Long = row.getAs[Any](field) match {
              case n: Number => n.longValue()
              case _ => 0L
            }
            val dropped = num("dropped_shingles")
            if (dropped > 0) onDrop(name, dropped, num("max_doc_freq_seen"))
          }
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    listener
  }

  private def collectMetricsNodes(
      plan: org.apache.spark.sql.execution.SparkPlan
  ): Seq[org.apache.spark.sql.execution.CollectMetricsExec] = {
    import org.apache.spark.sql.execution.CollectMetricsExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val self = plan match { case c: CollectMetricsExec => Seq(c); case _ => Nil }
    val children = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ children.flatMap(collectMetricsNodes)
  }

  private def defaultWarn(name: String, dropped: Long, maxDf: Long): Unit =
    log.warn(s"jaccard df-cut dropped $dropped hot shingle(s) (max doc-freq seen: " +
      s"$maxDf) in metric '$name' — pairs riding only on dropped shingles are absent; " +
      s"raise maxDocFreq if that similarity signal matters for this corpus")
}
