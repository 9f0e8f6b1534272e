package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}
import graft.sources.MatViewRewrite

/** Materialized-view query rewriting ([[graft.sources.MatViewRewrite]]):
  * an aggregate over the SOURCE answers from a fresh exact-shape MV —
  * plan-audited (backing scan in, source scan out) — and falls back to
  * the source for stale views, shape mismatches, and when disabled.
  */
class MatViewRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vsql(q: String, rewrite: Boolean = true) =
    org.apache.spark.sql.GraftViewSubstitution.sql(spark, q, rewrite)

  /** The rewritten read is a plain parquet scan of the backing
    * table's files (its path carries `__mat_`); the source read is a
    * lake DataSourceV2Relation. Both signatures together audit which
    * side answered. */
  private def scans(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect { case r: DataSourceV2Relation => r.table.name() } ++
      (if (df.queryExecution.executedPlan.toString.contains("__mat_"))
        Seq("__mat_backing")
       else Nil)
  }

  private def setup(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft-mvrw-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"k","data_type":"string"},
        |{"column_name":"x","data_type":"long"}],"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "src").append(
      Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "x"))
    wh
  }

  test("a fresh exact-shape MV answers the source aggregate; plan " +
      "scans the backing table, not the source; aliases are free") {
    val wh = setup("hit")
    spark.conf.set("spark.sql.catalog.grw1", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.grw1.warehouse", wh)
    vsql("CREATE MATERIALIZED VIEW grw1.d.roll AS " +
      "SELECT k, count(*) AS n, sum(x) AS s FROM grw1.d.src GROUP BY k")
      .collect()
    val df = vsql("SELECT k, count(*) AS cnt, sum(x) AS total " +
      "FROM grw1.d.src GROUP BY k ORDER BY k")
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 2L, 3L), ("b", 1L, 10L)))
    assert(MatViewRewrite.lastRewrite.contains(("d", "roll")))
    val sc = scans(df)
    assert(sc.exists(_.contains("__mat_")), s"backing not in $sc")
    assert(!sc.exists(n => n.contains("src") && !n.contains("__mat_")),
      s"source still scanned: $sc")
    // the rewrite is cost-only: identical values with it disabled
    spark.conf.set("spark.graft.matview.rewrite", "false")
    try {
      val raw = vsql("SELECT k, count(*) AS cnt, sum(x) AS total " +
        "FROM grw1.d.src GROUP BY k ORDER BY k")
      assert(raw.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSeq == got)
      assert(MatViewRewrite.lastRewrite.isEmpty)
      assert(!scans(raw).exists(_.contains("__mat_")))
    } finally spark.conf.unset("spark.graft.matview.rewrite")
  }

  test("stale views, shape mismatches, and sub/superset aggregates " +
      "fall back to the source scan") {
    val wh = setup("miss")
    import SparkTestSession.spark.implicits._
    spark.conf.set("spark.sql.catalog.grw2", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.grw2.warehouse", wh)
    vsql("CREATE MATERIALIZED VIEW grw2.d.roll AS " +
      "SELECT k, sum(x) AS s FROM grw2.d.src GROUP BY k").collect()
    def agg() = vsql("SELECT k, sum(x) AS s FROM grw2.d.src " +
      "GROUP BY k ORDER BY k")
    assert(scans(agg()).exists(_.contains("__mat_")), "fresh → rewrite")
    // stale: a source commit after the last refresh
    LakeTable.load(wh, "d", "src").append(Seq(("c", 5L)).toDF("k", "x"))
    val stale = agg()
    assert(!scans(stale).exists(_.contains("__mat_")),
      "stale MV must not answer")
    assert(stale.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("a", 3L), ("b", 10L), ("c", 5L)),
      "fallback must serve the LIVE data")
    // refreshed → rewrites again
    vsql("REFRESH MATERIALIZED VIEW grw2.d.roll INCREMENTAL").collect()
    assert(scans(agg()).exists(_.contains("__mat_")))
    // different aggregate set (count not materialized) → source
    val other = vsql("SELECT k, count(*) AS n FROM grw2.d.src " +
      "GROUP BY k ORDER BY k")
    assert(!scans(other).exists(_.contains("__mat_")))
    // different WHERE → source
    val flt = vsql("SELECT k, sum(x) AS s FROM grw2.d.src " +
      "WHERE x > 1 GROUP BY k ORDER BY k")
    assert(!scans(flt).exists(_.contains("__mat_")))
    assert(flt.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("a", 2L), ("b", 10L), ("c", 5L)))
    // different grouping → source
    val g2 = vsql("SELECT x, count(*) AS n FROM grw2.d.src " +
      "GROUP BY x ORDER BY x")
    assert(!scans(g2).exists(_.contains("__mat_")))
  }

  test("a WHERE-shaped MV rewrites the matching filtered aggregate; " +
      "an extensions session rewrites plain spark.sql") {
    val wh = setup("where")
    spark.conf.set("spark.sql.catalog.grw3", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.grw3.warehouse", wh)
    vsql("CREATE MATERIALIZED VIEW grw3.d.big AS " +
      "SELECT k, sum(x) AS s FROM grw3.d.src WHERE x > 1 GROUP BY k")
      .collect()
    val hit = vsql("SELECT k, sum(x) AS total FROM grw3.d.src " +
      "WHERE x > 1 GROUP BY k ORDER BY k")
    assert(scans(hit).exists(_.contains("__mat_")), scans(hit).toString)
    assert(hit.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("a", 2L), ("b", 10L)))
    // the REAL user surface: an extensions session rewrites its own
    // spark.sql without any bridge (getOrCreate reuses the active
    // session, so clear it for the build and restore after)
    import org.apache.spark.sql.SparkSession
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("graft-mvrw-ext")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.grwx", "graft.sources.LakeCatalog")
      ext.conf.set("spark.sql.catalog.grwx.warehouse", wh)
      val edf = ext.sql("SELECT k, sum(x) AS total FROM grwx.d.src " +
        "WHERE x > 1 GROUP BY k ORDER BY k")
      assert(edf.queryExecution.executedPlan.toString
        .contains("__mat_big"),
        "extensions session must rewrite plain spark.sql")
      assert(edf.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq == Seq(("a", 2L), ("b", 10L)))
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
