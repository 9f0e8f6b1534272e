package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression pins: these queries were tuned to specific
  * plan shapes (pushdown reaching the scan, broadcast for small dims,
  * rank-limit pushdown, bloom prefilter before the join) — a Spark
  * upgrade or query edit that silently loses one of these properties
  * is a performance regression even while results stay correct.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // FormattedMode: plain toString elides long scan metadata (the
  // PushedFilters list) behind "..."
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q_filter_pred pushes predicates into the parquet scan") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: ["), p.take(500))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
      p.contains("GreaterThan(l_shipdate"), "shipdate range must reach the scan")
  }

  test("q_scan_project prunes the read schema to selected columns") {
    val df = SparkEntry.queries("q_scan_project")(spark, sf)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val read = scans.find(_.contains("ReadSchema")).getOrElse(fail("no scan"))
    assert(!read.contains("l_comment"),
      "projection must prune unreferenced lineitem columns from the scan")
  }

  test("q_join_broadcast broadcasts the dim side") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_topk_per_group pushes the rank limit below the shuffle") {
    assert(plan("q_topk_per_group").contains("WindowGroupLimit"))
  }

  test("q_join_bloom probes the bloom before the semi join") {
    val p = plan("q_join_bloom")
    val probeAt = p.indexOf("might_contain")
    val joinAt = p.indexOf("BroadcastHashJoin")
    assert(probeAt >= 0, "bloom probe present")
    assert(joinAt >= 0, "semi join present")
    assert(probeAt > joinAt,
      "probe must sit below the join in the plan tree (printed after)")
  }

  test("q_pricing_summary partially aggregates before the exchange") {
    val p = plan("q_pricing_summary")
    val partial = p.indexOf("HashAggregate(keys=[l_returnflag")
    assert(partial >= 0 && p.indexOf("partial_", partial) > 0 ||
      p.contains("partial_sum"), "map-side combine expected")
  }
}
