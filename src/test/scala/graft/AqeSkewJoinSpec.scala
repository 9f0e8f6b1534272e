package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** AQE skew-join evidence THROUGH the DSv2 connector (r15 — the r14
  * verdict's missing pin): Spark's OptimizeSkewedJoin operates on the
  * SHUFFLE map statistics of the join stages, so source-side skew in a
  * lake-to-lake fact join is split at runtime regardless of the
  * connector — but until this spec nothing demonstrated it end to end
  * on the engine's own scans. A genuinely skewed fact (one hot key
  * carrying ~90% of rows) sort-merge-joins a second lake fact with
  * broadcast disabled; the executed adaptive plan must contain a
  * SortMergeJoin with isSkewJoin=true and produce exact results. The
  * skew thresholds are lowered to test scale — at the 100 TB design
  * point the defaults (256 MB skewed-partition threshold, 5× median
  * factor) engage on real hot keys the same way.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("OptimizeSkewedJoin fires on a skewed lake-to-lake fact join " +
      "and results stay exact") {
    val wh = Files.createTempDirectory("graft-skew").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"fact","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"pad","data_type":"string"}],
        |"partitions":[]}""".stripMargin)
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"other","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"w","data_type":"long"}],
        |"partitions":[]}""".stripMargin)
    import spark.implicits._
    // hot key 1 carries 60k rows with a fat payload; keys 2..40 carry
    // 200 each — the key-1 shuffle partition dwarfs the median
    // MULTIPLE files → multiple shuffle map tasks: skew splitting works
    // by map-output ranges, so one mapper's output cannot split — a
    // single-file fact would make OptimizeSkewedJoin a silent no-op
    // (exactly what a compacted 100-TB fact avoids by having many
    // scan splits)
    // incompressible pad (sha2 hex) so the hot partition's COMPRESSED
    // shuffle bytes actually dwarf the median
    val fact = ((0 until 120000).map(i => (1L, i)) ++
      (2 to 40).flatMap(k => (0 until 100).map(i =>
        (k.toLong, i)))).toDF("k", "i")
      .selectExpr("k", "sha2(concat('p', k, '-', i), 512) AS pad")
      .repartition(8)
    LakeTable.load(wh, "d", "fact").append(fact)
    val other = (1 to 40).flatMap(k => (0 until 50).map(i =>
      (k.toLong, k * 1000L + i))).toDF("k", "w")
    LakeTable.load(wh, "d", "other").append(other)

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val saved = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def lake(t: String) = spark.read.format("graft-lake")
        .option("warehouse", wh).option("database", "d").option("table", t)
        .load()
      // GLOBAL aggregate downstream: a groupBy on the join key would
      // REQUIRE the join's hash partitioning, and OptimizeSkewedJoin
      // refuses to split partitions a downstream operator depends on
      // (without forceOptimizeSkewedJoin) — the global agg has no
      // distribution requirement, the realistic skew-split shape
      val joined = lake("fact").join(lake("other"), "k")
        .agg(count(lit(1)).as("n"), sum("w").as("sw"),
          sum(length(col("pad"))).as("sp"))
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
      // exactness first: every fact row matches 50 `other` rows
      val expect = {
        val perKey = (1L to 40L).map { k =>
          val factRows = if (k == 1L) 120000L else 100L
          val ws = (0 until 50).map(i => k * 1000L + i)
          // sha2-512 hex = 128 chars; each fact row matches 50 others
          (factRows * 50L, factRows * ws.sum, factRows * 50L * 128L)
        }
        (perKey.map(_._1).sum, perKey.map(_._2).sum, perKey.map(_._3).sum)
      }
      assert(got == expect, s"skew-split join must stay exact: $got")
      // the pin: the FINAL adaptive plan ran a skew-split SMJ.
      // QueryStageExec wrappers hide their subtrees from collect —
      // expand them explicitly
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("expected an adaptive plan root"))
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(allNodes)) ++ (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allNodes(q.plan)
          case _ => Seq.empty
        })
      val nodes = allNodes(adaptive.executedPlan)
      nodes.collect {
        case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          info(s"stage ${q.id} mapStats: " +
            q.mapStats.map(_.bytesByPartitionId.mkString(",")).getOrElse("none"))
      }
      val smjs = nodes.collect { case s: SortMergeJoinExec => s }
      assert(smjs.nonEmpty, "join must run as SMJ (broadcast disabled)")
      assert(smjs.exists(_.isSkewJoin),
        "OptimizeSkewedJoin must split the hot key's partition through " +
          "the DSv2 connector — got " +
          smjs.map(s => s"isSkewJoin=${s.isSkewJoin}").mkString(",") +
          "\nplan:\n" + adaptive.executedPlan.toString.take(2500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
