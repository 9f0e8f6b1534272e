package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Write-audit-publish: staged snapshots are invisible to every read
  * path until published, audit reads see base+staged, publish
  * cherry-picks onto the head, discard orphans the staged files
  * (engine extension mirroring Iceberg's wap.id + cherrypick_snapshot;
  * the reference has no snapshot model at all).
  */
class WapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-wap-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "t"))
  }

  test("staged snapshot is invisible until published, then visible") {
    import spark.implicits._
    val (wh, t) = mk("pub")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val staged = t.appendStaged(Seq((3L, "c")).toDF("id", "v"), "wap-1")
    assert(staged.operation == "staged-append")
    assert(staged.wapId.contains("wap-1"))
    // normal read: base only
    assert(t.read(spark).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // audit read: base + staged
    assert(t.readStaged(spark, "wap-1").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    // survives a metadata reload (staged list round-trips through JSON)
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.stagedSnapshot("wap-1").isDefined)
    val pub = t2.publishStaged("wap-1")
    assert(pub.operation == "append" && pub.wapId.contains("wap-1"))
    assert(pub.id > staged.id)
    assert(t2.read(spark).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    assert(t2.stagedSnapshot("wap-1").isEmpty)
    // CDC sees the rows at publish time
    val changes = t2.changesBetween(spark, staged.id, pub.id)
    assert(changes.collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("discard drops the staged rows; files age out as orphans") {
    import spark.implicits._
    val (wh, t) = mk("disc")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.appendStaged(Seq((9L, "z")).toDF("id", "v"), "wap-bad")
    // staged files are NOT orphans while staged
    assert(t.removeOrphanFiles(olderThanMillis = 0).isEmpty)
    val orphaned = t.discardStaged("wap-bad")
    assert(orphaned >= 1)
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.read(spark).collect().map(_.getLong(0)).toSet == Set(1L))
    // now the discarded files are orphans and get removed
    assert(t2.removeOrphanFiles(olderThanMillis = 0).nonEmpty)
    assert(t2.read(spark).collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("publish refuses a staged snapshot from an older schema version") {
    import spark.implicits._
    val (wh, t) = mk("evo")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.appendStaged(Seq((2L, "b")).toDF("id", "v"), "wap-old")
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"},
        |{"column_name":"extra","data_type":"int"}],"partitions":[]}""".stripMargin)
    val t2 = LakeTable.load(wh, "d", "t")
    val e = intercept[IllegalArgumentException](t2.publishStaged("wap-old"))
    assert(e.getMessage.contains("re-stage"))
    // still discardable
    assert(t2.discardStaged("wap-old") >= 1)
  }

  test("SQL CALL publish_wap / discard_wap round-trip") {
    import spark.implicits._
    val (wh, t) = mk("sql")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.appendStaged(Seq((2L, "b")).toDF("id", "v"), "good")
    t.appendStaged(Seq((3L, "c")).toDF("id", "v"), "bad")
    spark.conf.set("spark.sql.catalog.gwap", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gwap.warehouse", wh)
    val d = spark.sql("CALL gwap.system.discard_wap(db => 'd', " +
      "`table` => 't', wap_id => 'bad')").collect()(0)
    assert(d.getInt(0) >= 1)
    val p = spark.sql("CALL gwap.system.publish_wap(db => 'd', " +
      "`table` => 't', wap_id => 'good')").collect()(0)
    assert(p.getLong(1) == 1L) // rows published
    val ids = spark.sql("SELECT id FROM gwap.d.t")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("staged snapshots surface in the .snapshots metadata relation") {
    import spark.implicits._
    val (wh, t) = mk("meta")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.appendStaged(Seq((2L, "b")).toDF("id", "v"), "pending")
    spark.conf.set("spark.sql.catalog.gwapm", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gwapm.warehouse", wh)
    val ops = spark.sql(
      "SELECT operation FROM gwapm.d.t.snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("append", "staged-append"))
  }
}
