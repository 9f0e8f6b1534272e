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

  // FormattedMode numbers operators leaf-first ("Scan parquet (1)" at
  // the bottom), so a child's id is strictly SMALLER than its
  // ancestors'. Find the id of the detail block for operator `op`
  // ("(N) Op" + block text) containing every `details` substring.
  private def nodeId(p: String, op: String, details: String*): Int = {
    val blocks = p.split("\\n\\(").toSeq // each detail block starts "(N) Op"
    blocks.collectFirst {
      case b if b.startsWith(op, b.indexOf(") ") + 2) &&
          details.forall(b.contains) =>
        b.takeWhile(_.isDigit).toInt
    }.getOrElse(fail(s"no $op block containing ${details.mkString(", ")} in:\n$p"))
  }

  test("q_join_bloom probes the bloom below the semi join") {
    val p = plan("q_join_bloom")
    // "l_suppkey" pins the FACT-side probe: Spark's own runtime filter
    // injection can add a might_contain on the dim side too
    val probeId = nodeId(p, "Filter", "might_contain", "l_suppkey")
    val joinId = nodeId(p, "BroadcastHashJoin")
    assert(probeId < joinId,
      s"bloom Filter (id $probeId) must sit below the join (id $joinId): " +
        "formatted ids grow from the leaves up")
  }

  test("q_star_join: every dim broadcasts, runtime pruning reaches the " +
      "fact scan, zero cartesians / sort-merge") {
    val p = plan("q_star_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "a star join must never degenerate to all-pairs")
    assert(!p.contains("SortMergeJoin"),
      "dims must broadcast off the connector's size stats — an SMJ " +
        "shuffles the 100-TB fact side")
    // all four joins broadcast (orders/customer/nation/region builds)
    assert(p.sliding("BroadcastHashJoin".length).count(
      _ == "BroadcastHashJoin") >= 8, // 4 in the tree + 4 detail blocks
      "all four dimension joins must be broadcast hash joins")
    // Spark's runtime filter (DPP-style, via SupportsRuntimeFiltering)
    // must hit the FACT scan: at 100 TB this is what turns the date
    // window on orders into fact-side file pruning
    assert(p.contains("dynamicpruning"),
      "runtime pruning must engage through the DSv2 connector")
    assert(p.linesIterator.exists(l => l.contains("dynamicpruning") &&
      l.contains("l_orderkey")),
      "the pruning subquery must filter the lineitem (fact) scan")
  }

  test("q_pricing_summary partially aggregates below the exchange") {
    val p = plan("q_pricing_summary")
    val partialId = nodeId(p, "HashAggregate", "partial_sum")
    val exchangeId = nodeId(p, "Exchange")
    assert(partialId < exchangeId,
      s"partial HashAggregate (id $partialId) must sit below the " +
        s"Exchange (id $exchangeId)")
  }

  test("q_tfidf computes document frequency with partial agg + broadcast, not a term window") {
    val p = plan("q_tfidf")
    // a Window partitioned by term ships every (doc,term) row of a hot
    // term to one reducer with no map-side combine — the df branch must
    // be a groupBy(term) (partial HashAggregate) broadcast back instead
    val windows = p.linesIterator.filter(_.contains("Arguments: [")).toSeq
    assert(!windows.exists(l => l.contains("windowspecdefinition(term")),
      s"df must not come from a term-partitioned window:\n${windows.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"), "vocab-sized df table must broadcast")
    val partialId = nodeId(p, "HashAggregate", "partial_count")
    val exchangeId = nodeId(p, "Exchange")
    assert(partialId < exchangeId,
      "df branch must partially aggregate below its exchange")
  }

  test("q_dedup_spans: one gram shuffle + per-doc window, no cartesian") {
    val p = plan("q_dedup_spans")
    // the anchor stage is a plain aggregate keyed by the gram — any
    // nested-loop / cartesian node means the anchor join degenerated
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "span dedup must never go all-pairs")
    // partial aggregation below the exchange for the min_doc anchor
    assert(p.contains("partial_min") || p.contains("min("),
      "anchor min(doc_id) must partial-aggregate")
    // local extension runs as a window, not a self-join
    assert(p.contains("Window"), "span merge must be a per-doc window")
  }

  test("q_quality_repetition computes per-row signals with zero shuffle") {
    val p = plan("q_quality_repetition")
    // every signal is a higher-order array function inside the row;
    // the only exchange allowed is the final ORDER BY's range
    // partitioning — a hash Exchange would mean an explode+groupBy
    // crept back in
    assert(!p.contains("hashpartitioning"),
      s"no hash exchange expected:\n${p.linesIterator
        .filter(_.contains("Exchange")).mkString("\n")}")
  }

  test("q_decontaminate broadcasts the benchmark gram set") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "benchmark grams must build a broadcast semi join")
  }

  test("q_sample_mixture broadcasts the rates relation") {
    assert(plan("q_sample_mixture").contains("BroadcastHashJoin"))
  }

  test("q_text_rarity: vocabulary-sized shuffles with partial aggregation") {
    val p = plan("q_text_rarity")
    // corpus frequency and the per-doc rollup both partial-aggregate
    // below their exchanges; nothing may go all-pairs
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "frequency count must partial-aggregate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_dedup_incremental joins on digests, never document bodies") {
    val p = plan("q_dedup_incremental")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the index probe keys on the 32-byte sha2 digest: every exchange
    // partitions on the hash column, not on text
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning"))
      .mkString("\n")
    assert(!exchanges.contains("text"),
      s"shuffle must carry digests, not bodies:\n$exchanges")
  }
}
