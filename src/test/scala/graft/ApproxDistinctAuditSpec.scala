package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Grouping

/** `q_agg_approx_distinct` is the one declared key with no DuckDB oracle
  * (HLL estimates are engine-specific), so the query self-audits against
  * the exact countDistinct computed in the same aggregation. This spec
  * pins BOTH directions: the audit passes on the real fixture, and it
  * actually fires on a drifted estimate — removing the require() in
  * `auditApproxDistinct` fails the second test.
  */
class ApproxDistinctAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("the key runs green and the estimate stays within bounds") {
    val out = Grouping.queries("q_agg_approx_distinct")(spark, dir)
    assert(out.columns.toSeq == Seq("event_type", "approx_users"))
    assert(out.count() > 0)
  }

  test("a drifted estimate fails loudly, a within-bounds one passes") {
    import spark.implicits._
    val rsd = 0.05
    // 100 vs exact 50 is 100% off — far outside 4×rsd = 20%
    val drifted = Seq(("click", 100L, 50L))
      .toDF("event_type", "approx_users", "exact_users")
    val e = intercept[IllegalArgumentException] {
      Grouping.auditApproxDistinct(drifted, rsd)
    }
    assert(e.getMessage.contains("HLL estimate outside"))
    // 54 vs 50 is 8% off — inside the 20% bound
    val ok = Seq(("click", 54L, 50L))
      .toDF("event_type", "approx_users", "exact_users")
    Grouping.auditApproxDistinct(ok, rsd)
  }
}
