package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Materialized views (`CALL system.create_mat_view / refresh_mat_view`):
  * the defining query materializes into a hidden backing lake table
  * that a registered view fronts — reads are table-fast and STALE
  * until refreshed (that staleness is the defining semantic, asserted
  * here), refresh is a full recompute into one replace snapshot (the
  * any-SQL fallback; the CDC-delta incremental path is
  * lake_incr_rollup's machinery).
  */
class MatViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vsql(q: String) =
    org.apache.spark.sql.GraftViewSubstitution.sql(spark, q)

  test("create materializes, reads stay stale until refresh recomputes") {
    val wh = Files.createTempDirectory("graft-matview").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"k","data_type":"string"},
        |{"column_name":"x","data_type":"long"}],"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "src").append(
      Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "x"))
    spark.conf.set("spark.sql.catalog.gmv", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmv.warehouse", wh)
    val created = spark.sql(
      "CALL gmv.system.create_mat_view('d', 'agg', " +
        "'SELECT k, sum(x) AS sx FROM gmv.d.src GROUP BY k')").collect()
    assert(created.head.getString(0) == "__mat_agg")
    def readMv(): Map[String, Long] =
      vsql("SELECT k, sx FROM gmv.d.agg").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(readMv() == Map("a" -> 3L, "b" -> 10L))
    // the MV read plans against the BACKING TABLE, not the source: a
    // source append must NOT show up until refresh (staleness is the
    // semantic that distinguishes an MV from a plain view)
    LakeTable.load(wh, "d", "src").append(Seq(("b", 5L)).toDF("k", "x"))
    assert(readMv() == Map("a" -> 3L, "b" -> 10L),
      "an unrefreshed MV must serve the materialized state")
    val refreshed = spark.sql(
      "CALL gmv.system.refresh_mat_view('d', 'agg')").collect()
    assert(refreshed.head.getLong(1) == 2L, "2 groups after refresh")
    assert(readMv() == Map("a" -> 3L, "b" -> 15L))
    // bookkeeping: the view doc marks the MV and its backing table
    val doc = graft.sources.LakeViews.read(
      graft.sources.LakeViews.path(wh, "d", "agg")).get
    assert(doc.properties.get("graft.mat-view").contains("true"))
    assert(doc.properties("graft.mat-view.table") == "__mat_agg")
    // refresh on a PLAIN view refuses by name
    vsql("CREATE VIEW gmv.d.plain AS SELECT k FROM gmv.d.src").collect()
    val e = intercept[Exception] {
      spark.sql("CALL gmv.system.refresh_mat_view('d', 'plain')").collect()
    }
    assert(e.getMessage.contains("not a materialized view"))
  }

  test("dropping an MV removes its backing table; the name is reusable") {
    val wh = Files.createTempDirectory("graft-matview3").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"k","data_type":"string"},
        |{"column_name":"x","data_type":"long"}],"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "src").append(Seq(("a", 1L)).toDF("k", "x"))
    spark.conf.set("spark.sql.catalog.gmv3", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmv3.warehouse", wh)
    spark.sql("CALL gmv3.system.create_mat_view('d', 'm', " +
      "'SELECT k, sum(x) AS s FROM gmv3.d.src GROUP BY k')").collect()
    assert(LakeTable.exists(wh, "d", "__mat_m"))
    vsql("DROP VIEW gmv3.d.m").collect()
    assert(!LakeTable.exists(wh, "d", "__mat_m"),
      "dropping the MV must drop its backing table")
    // the name is immediately reusable
    spark.sql("CALL gmv3.system.create_mat_view('d', 'm', " +
      "'SELECT count(*) AS n FROM gmv3.d.src')").collect()
    assert(vsql("SELECT n FROM gmv3.d.m").collect().head.getLong(0) == 1L)
    // an MV named after an existing TABLE refuses (it would shadow it)
    val e = intercept[Exception] {
      spark.sql("CALL gmv3.system.create_mat_view('d', 'src', " +
        "'SELECT 1 AS one')").collect()
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }

  test("an MV can be defined over another view; duplicate name refuses") {
    val wh = Files.createTempDirectory("graft-matview2").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"k","data_type":"string"},
        |{"column_name":"x","data_type":"long"}],"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "src").append(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "x"))
    spark.conf.set("spark.sql.catalog.gmv2", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmv2.warehouse", wh)
    vsql("CREATE VIEW gmv2.d.doubled AS " +
      "SELECT k, x * 2 AS x2 FROM gmv2.d.src").collect()
    spark.sql("CALL gmv2.system.create_mat_view('d', 'magg', " +
      "'SELECT k, sum(x2) AS s FROM gmv2.d.doubled GROUP BY k')").collect()
    assert(vsql("SELECT k, s FROM gmv2.d.magg ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 4L)))
    val e = intercept[Exception] {
      spark.sql("CALL gmv2.system.create_mat_view('d', 'magg', " +
        "'SELECT 1 AS one')").collect()
    }
    assert(e.getMessage.contains("already exists"))
  }
}
