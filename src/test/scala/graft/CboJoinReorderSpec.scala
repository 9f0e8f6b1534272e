package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** CBO evidence THROUGH the DSv2 connector (r16, verdict ask: "no pin
  * shows a JOIN ORDER actually changing because of [the connector's
  * stats]"). Two mechanical pins:
  *
  *  1. JOIN ORDER: with `spark.sql.cbo.joinReorder`, the written
  *     left-deep (fact ⋈ bigdim) ⋈ tinydim rewrites to
  *     (fact ⋈ tinydim) ⋈ bigdim — the selective join first. The
  *     inputs that make `CostBasedJoinReorder` eligible at all are the
  *     connector's `estimateStatistics` row counts/sizes (every join
  *     item needs a defined rowCount); with CBO off the written order
  *     survives, so the differential isolates the stats-driven rule.
  *     Notably 4.1's reorder already fires on row counts + sizes —
  *     ndv refines the cardinality model but is not the eligibility
  *     gate, which is why the pin differentials on the CBO flag, not
  *     on ANALYZE presence.
  *
  *  2. NDV: after `CALL system.analyze`, the committed per-column ndv
  *     reaches the LOGICAL plan's `attributeStats` (distinctCount) on
  *     the scan relation — the number `JoinEstimation` costs
  *     intermediate joins with. Without ANALYZE the map is empty.
  */
class CboJoinReorderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** fact(40k) with two fk columns; bigdim(8k) joins unselectively,
    * tinydim(40) shrinks the fact 200x. The written join order puts
    * bigdim FIRST — the wrong order a cost model must fix.
    */
  private def mk(tag: String, analyze: Boolean): String = {
    val wh = Files.createTempDirectory(s"graft-cbo-$tag").toString
    def defJson(t: String, cols: String) =
      s"""{"database_name":"d","table_name":"$t","columns":[$cols],
         |"partitions":[]}""".stripMargin
    Engine.processTableDefJson(wh, defJson("fact",
      """{"column_name":"f_k","data_type":"long"},
        |{"column_name":"f_b","data_type":"long"},
        |{"column_name":"f_c","data_type":"long"}""".stripMargin))
    Engine.processTableDefJson(wh, defJson("bigdim",
      """{"column_name":"b_k","data_type":"long"},
        |{"column_name":"b_pad","data_type":"string"}""".stripMargin))
    Engine.processTableDefJson(wh, defJson("tinydim",
      """{"column_name":"c_k","data_type":"long"},
        |{"column_name":"c_pad","data_type":"string"}""".stripMargin))
    val s = spark
    LakeTable.load(wh, "d", "fact").append(s.range(40000).selectExpr(
      "id AS f_k", "id % 8000 AS f_b", "id % 8000 AS f_c"))
    LakeTable.load(wh, "d", "bigdim").append(s.range(8000).selectExpr(
      "id AS b_k", "repeat('b', 20) AS b_pad"))
    LakeTable.load(wh, "d", "tinydim").append(s.range(40).selectExpr(
      "id AS c_k", "repeat('c', 20) AS c_pad"))
    if (analyze)
      Seq("fact", "bigdim", "tinydim").foreach(t =>
        LakeTable.load(wh, "d", t).analyze(s, exact = true))
    val cat = s"gcbo$tag"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  /** Table names (by column prefix) in the DEEPEST join of the
    * optimized plan — the pair the optimizer chose to join first.
    */
  private def deepestJoinTables(plan: LogicalPlan): Set[String] = {
    val joins = plan.collect { case j: Join => j }
    assert(joins.size == 2, s"expected 2 joins, got:\n$plan")
    val deepest = joins.find(j =>
      j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
      .getOrElse(fail(s"no leaf-level join in:\n$plan"))
    deepest.output.map(_.name.head match {
      case 'f' => "fact"
      case 'b' => "bigdim"
      case 'c' => "tinydim"
    }).toSet
  }

  private def withCbo[T](on: Boolean)(body: => T): T = {
    val prev = (spark.conf.get("spark.sql.cbo.enabled"),
      spark.conf.get("spark.sql.cbo.joinReorder.enabled"))
    spark.conf.set("spark.sql.cbo.enabled", on.toString)
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
    try body finally {
      spark.conf.set("spark.sql.cbo.enabled", prev._1)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prev._2)
    }
  }

  private def query(cat: String) =
    s"""SELECT count(*) AS n
       |FROM $cat.d.fact f
       |JOIN $cat.d.bigdim b ON f.f_b = b.b_k
       |JOIN $cat.d.tinydim c ON f.f_c = c.c_k""".stripMargin

  test("connector statistics drive CostBasedJoinReorder: the " +
      "selective tiny join moves first; CBO off keeps written order") {
    val cat = mk("ord", analyze = true)
    val off = withCbo(on = false)(deepestJoinTables(
      spark.sql(query(cat)).queryExecution.optimizedPlan))
    val on = withCbo(on = true)(deepestJoinTables(
      spark.sql(query(cat)).queryExecution.optimizedPlan))
    assert(off == Set("fact", "bigdim"),
      s"control broke: written order should survive CBO-off, got $off")
    assert(on == Set("fact", "tinydim"),
      s"CBO did not reorder on connector stats: $on")
    // the reordered plan stays CORRECT: every fact row matches bigdim,
    // and f_c % 8000 < 40 keeps 40000/8000*40 = 200 survivors
    val n = withCbo(on = true)(
      spark.sql(query(cat)).collect()(0).getLong(0))
    assert(n == 200)
  }

  test("ANALYZE ndv reaches the logical plan's attributeStats (the " +
      "cardinality input JoinEstimation costs joins with)") {
    val withCat = mk("ndv", analyze = true)
    val without = mk("nondv", analyze = false)
    withCbo(on = true) {
      def factNdv(cat: String): Map[String, Option[BigInt]] = {
        val plan = spark.sql(s"SELECT f_b, f_c FROM $cat.d.fact")
          .queryExecution.optimizedPlan
        val leaf = plan.collectLeaves().head
        leaf.output.map(a => a.name ->
          leaf.stats.attributeStats.get(a)
            .flatMap(_.distinctCount)).toMap
      }
      val ndv = factNdv(withCat)
      assert(ndv("f_b").contains(BigInt(8000)) &&
        ndv("f_c").contains(BigInt(8000)),
        s"exact ANALYZE ndv must reach attributeStats: $ndv")
      val bare = factNdv(without)
      assert(bare.values.forall(_.isEmpty),
        s"un-analyzed table must serve NO ndv: $bare")
    }
  }
}
