package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Guards the scale-critical plan shapes: these assertions fail if a
  * future change silently degrades a plan (lost pushdown, lost
  * broadcast, an inequality join sneaking in). Complements dev-time
  * PlanAudit (human inspection) with CI-time checks.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution
      .explainString(FormattedMode)

  test("parquet scans push filters and prune columns (agg_pricing)") {
    val p = plan("agg_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate filter must reach the parquet scan")
    assert(!p.contains("l_comment"), "unused wide columns must be pruned")
  }

  test("dimension joins broadcast (join_revenue)") {
    val p = plan("join_revenue")
    assert(p.contains("BroadcastHashJoin"), "customer/orders dims must broadcast")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "segment filter must reach the customer scan")
  }

  test("as-of join is one window pass, not an inequality join (join_asof)") {
    val p = plan("join_asof")
    assert(p.contains("Window"), "as-of must run as a window")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of must never plan a nested-loop/cartesian join")
  }

  test("range join is an equi-join on (keys, bin) (join_range)") {
    val p = plan("join_range")
    assert(p.contains("HashJoin"), "range join must be hash-joinable (equi keys)")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join must never plan a nested-loop/cartesian join")
  }

  test("brute-force ANN broadcasts the query side (sim_topk)") {
    val p = plan("sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side must broadcast — the corpus must not shuffle")
  }

  test("partitioned-scan restriction is a broadcast semi join (etl_partitioned_scan)") {
    val p = plan("etl_partitioned_scan")
    assert(p.contains("LeftSemi"), "key restriction must be a semi join")
    assert(p.contains("Broadcast"), "the distinct-key side must broadcast")
  }

  test("pair scoring uses the native kernels, not interpreted HOFs (dedup_embedding)") {
    val p = plan("dedup_embedding")
    assert(p.contains("dotproduct(") && p.contains("l2norm("),
      "dot/norm must be the codegen kernels")
    assert(!p.contains("aggregate(") && !p.contains("zip_with("),
      "no interpreted higher-order functions in the pair path")
  }
}
