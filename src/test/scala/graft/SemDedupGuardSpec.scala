package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Pipeline

/** `q_dedup_semantic`'s quadratic-budget guard: the algorithm's scale
  * contract is "k grows with the corpus so cluster sizes stay fixed",
  * and a degenerate coarse quantizer (everything in one cell) must be
  * REFUSED loudly instead of silently running an O(n²) within-cluster
  * join. Dropping the hot cluster (the LSH cap's move) is not sound
  * here — SemDeDup's output is oracle-pinned per cluster.
  */
class SemDedupGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("a planted mega-cluster trips the named refusal") {
    import spark.implicits._
    // one cluster of 1000 vectors = 499500 pairs; budget 100k
    val v = (0 until 1000).map(i => (i.toLong, 7)).toDF("vec_id", "label")
    val e = intercept[IllegalStateException] {
      Pipeline.requireBoundedClusters(v, "label", maxPairs = 100000L)
    }
    assert(e.getMessage.contains("degenerate coarse quantizer"))
    assert(e.getMessage.contains("499500"))
  }

  test("bounded clusters pass untouched") {
    import spark.implicits._
    val v = (0 until 1000).map(i => (i.toLong, i % 50)).toDF("vec_id", "label")
    Pipeline.requireBoundedClusters(v, "label", maxPairs = 100000L)
  }

  test("the production budget admits the sf0.1 fixture's clusters") {
    import spark.implicits._
    // worst fixture cluster is ~218 vectors (≈23.7k pairs) at sf0.1 —
    // two orders of magnitude inside the budget, so fixture growth
    // has headroom before the guard would need retuning
    val v = (0 until 300).map(i => (i.toLong, 0)).toDF("vec_id", "label")
    Pipeline.requireBoundedClusters(v, "label")
  }
}
