package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Pipeline

/** `q_dedup_spans` (cross-doc repeated-span removal): exact values are
  * pinned by the DuckDB oracle; this spec pins the structural
  * invariants of the span algebra so a broken merge shows up with a
  * named reason rather than a hash diff.
  */
class DedupSpansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val K = 8

  test("span invariants hold on the sf0.001 fixture") {
    val rows = Pipeline.queries("q_dedup_spans")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    var docsWithSpans = 0
    rows.foreach { r =>
      val (nTokens, dupTokens, nSpans) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      // a maximal span is at least one K-window wide, and spans are
      // disjoint, so coverage is bounded below and above
      assert((nSpans == 0) == (dupTokens == 0), s"row $r")
      assert(dupTokens >= nSpans * K, s"row $r")
      assert(dupTokens <= nTokens, s"row $r")
      if (nSpans > 0) docsWithSpans += 1
    }
    // the fixture generator plants cross-doc near-dups; the first
    // occurrence keeps its footage, so fewer docs carry spans than
    // docs total but more than zero
    assert(docsWithSpans > 0 && docsWithSpans < 500)
  }
}
