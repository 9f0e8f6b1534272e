package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Host-invariant regression pins for the r12 publication-path
  * overhaul: wall-clock on this box swings ±15-20% run-to-run, so the
  * lifecycle-overhead wins are pinned as SPARK JOB COUNTS instead —
  * a deterministic property of the plans. Budgets carry slack of 1-2
  * jobs over the measured counts; a regression that re-introduces a
  * per-statement scan, checkpoint, or read-back blows well past them.
  */
class JobBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def countJobs[A](body: => A): (A, Int) = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      var prev = -1
      var cur = jobs.get
      while (prev != cur) { Thread.sleep(100); prev = cur; cur = jobs.get }
      (r, cur)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def vsql(q: String) =
    org.apache.spark.sql.GraftViewSubstitution.sql(spark, q)

  test("a bounded keyed MoR delete is metadata-only: ZERO Spark jobs") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-jobs-del").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}"""
        .stripMargin)
    LakeTable.load(wh, "d", "t")
      .append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val t = LakeTable.load(wh, "d", "t")
    val (_, jobs) = countJobs {
      t.deleteByKeysMoR(spark, Seq(2L).toDF("k"))
    }
    assert(jobs == 0,
      s"a tiny keyed delete must publish without Spark jobs, got $jobs")
    assert(LakeTable.load(wh, "d", "t").read(spark).count() == 2L)
  }

  test("a bounded local upsertWithDeletesMoR publishes in ZERO jobs " +
      "and ONE snapshot") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-jobs-ups").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}"""
        .stripMargin)
    LakeTable.load(wh, "d", "t")
      .append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val t = LakeTable.load(wh, "d", "t")
    val before = t.metadata.snapshots.size
    val (_, jobs) = countJobs {
      // markers strike keys 1,2,3; rows re-add only 1 and 2 → 3 dies
      t.upsertWithDeletesMoR(spark,
        Seq((1L, "A"), (2L, "B")).toDF("k", "v"),
        Seq(1L, 2L, 3L).toDF("k"))
    }
    assert(jobs == 0,
      s"a bounded local publication must not launch jobs, got $jobs")
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.metadata.snapshots.size == before + 1, "ONE snapshot")
    assert(t2.read(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "A"), (2L, "B")))
  }

  test("a bounded incremental MV refresh (touched-group recompute) " +
      "stays inside a tight job budget") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-jobs-mv").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"g","data_type":"long"},
        |{"column_name":"x","data_type":"long"}],"partitions":[]}"""
        .stripMargin)
    LakeTable.load(wh, "d", "src").append(
      (1L to 200L).map(i => (i % 10, i)).toDF("g", "x"))
    spark.conf.set("spark.sql.catalog.gjb", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gjb.warehouse", wh)
    // MIN routes every non-append range to the touched-group recompute
    vsql("CREATE MATERIALIZED VIEW gjb.d.roll AS " +
      "SELECT g, count(*) AS n, min(x) AS mn FROM gjb.d.src GROUP BY g")
      .collect()
    LakeTable.load(wh, "d", "src").append(
      Seq((1L, 1000L), (2L, 2000L)).toDF("g", "x"))
    LakeTable.load(wh, "d", "src").deleteMoR(spark, col("x") === 5L)
    val (_, jobs) = countJobs {
      vsql("REFRESH MATERIALIZED VIEW gjb.d.roll INCREMENTAL").collect()
    }
    // measured 2026-08: 6 jobs (changelog+touched collect, recompute
    // agg collect, MoR-delete read legs, marker probes); budget 10.
    // The r11 path ran 18 — a re-introduced dead-set anti-join,
    // existence count, per-statement checkpoint, or bloom read-back
    // lands well past the budget.
    assert(jobs <= 10,
      s"bounded incremental refresh must stay <= 10 jobs, got $jobs")
    val got = vsql("SELECT g, n, mn FROM gjb.d.roll ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = vsql("SELECT g, count(*) AS n, min(x) AS mn " +
      "FROM gjb.d.src GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq, "refresh must stay exact")
  }
}
