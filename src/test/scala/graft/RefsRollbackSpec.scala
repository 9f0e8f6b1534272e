package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Named refs (tags/branches) + snapshot rollback — the Iceberg
  * release-management surface (engine extension; the reference has no
  * snapshot model at all). Refs are metadata-only pointers; rollback
  * is an instant metadata truncation whose orphaned files age out via
  * remove_orphan_files.
  */
class RefsRollbackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-refs-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "t"))
  }

  test("tag pins a snapshot; VERSION AS OF resolves it by name") {
    import spark.implicits._
    val (wh, t) = mk("tag")
    val s1 = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")).id
    t.createRef("release-v1", s1)
    t.append(Seq((3L, "c")).toDF("id", "v"))
    spark.conf.set("spark.sql.catalog.grefs", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.grefs.warehouse", wh)
    val atTag = spark.sql(
      "SELECT id FROM grefs.d.t VERSION AS OF 'release-v1'")
      .collect().map(_.getLong(0)).toSet
    assert(atTag == Set(1L, 2L))
    val now = spark.sql("SELECT id FROM grefs.d.t")
      .collect().map(_.getLong(0)).toSet
    assert(now == Set(1L, 2L, 3L))
    // the refs metadata relation lists it
    val refs = spark.sql("SELECT name, kind, snapshot_id FROM grefs.d.t.refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.toSeq == Seq(("release-v1", "tag", s1)))
  }

  test("rollback_to_snapshot truncates history and drops dangling refs") {
    import spark.implicits._
    val (wh, t) = mk("rb")
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v")).id
    val s2 = t.append(Seq((2L, "b")).toDF("id", "v")).id
    t.createRef("good", s1)
    t.createRef("bad", s2)
    spark.conf.set("spark.sql.catalog.grb", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.grb.warehouse", wh)
    val res = spark.sql(
      s"CALL grb.system.rollback_to_snapshot(db => 'd', `table` => 't', " +
        s"snapshot_id => ${s1}L)").collect()(0)
    assert(res.getInt(0) == 1 && res.getLong(1) == s1)
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.read(spark).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(t2.metadata.refs.keySet == Set("good"),
      "ref past the rollback point must be dropped")
    // rolled-back files are orphans: an aggressive orphan sweep removes
    // them and the surviving state still reads
    assert(t2.removeOrphanFiles(olderThanMillis = 0L).nonEmpty)
    assert(t2.read(spark).count() == 1)
  }

  test("create_tag / create_branch / drop_ref procedures round-trip") {
    import spark.implicits._
    val (wh, t) = mk("proc")
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v")).id
    spark.conf.set("spark.sql.catalog.gpr", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gpr.warehouse", wh)
    spark.sql(s"CALL gpr.system.create_tag(db => 'd', `table` => 't', " +
      s"name => 'rel', snapshot_id => ${s1}L)")
    spark.sql(s"CALL gpr.system.create_branch(db => 'd', `table` => 't', " +
      s"name => 'dev', snapshot_id => ${s1}L)")
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.metadata.refs("rel").kind == "tag")
    assert(t2.metadata.refs("dev").kind == "branch")
    spark.sql("CALL gpr.system.drop_ref(db => 'd', `table` => 't', " +
      "name => 'dev')")
    assert(LakeTable.load(wh, "d", "t").metadata.refs.keySet == Set("rel"))
  }

  test("expireSnapshots prunes refs into the squashed prefix") {
    import spark.implicits._
    val (_, t) = mk("exp")
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v")).id
    val s2 = t.append(Seq((2L, "b")).toDF("id", "v")).id
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.createRef("old", s1)
    t.createRef("mid", s2)
    t.expireSnapshots(keepAfter = s2)
    val md = t.metadata
    // squash keeps the newest expired id (s2): 'mid' survives, 'old' dangles
    assert(md.refs.keySet == Set("mid"))
    assert(t.read(spark).count() == 3)
  }

  test("ref validation: unknown snapshot, numeric name, duplicate semantics") {
    import spark.implicits._
    val (_, t) = mk("val")
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v")).id
    intercept[IllegalArgumentException](t.createRef("x", 999L))
    intercept[IllegalArgumentException](t.createRef("123", s1))
    intercept[IllegalArgumentException](t.createRef("x", s1, kind = "weird"))
    t.createRef("x", s1)
    val s2 = t.append(Seq((2L, "b")).toDF("id", "v")).id
    t.createRef("x", s2) // re-point is allowed (move the ref)
    assert(t.refSnapshot("x").contains(s2))
    intercept[IllegalArgumentException](t.dropRef("nope"))
  }

  test("rollback to the current snapshot is a no-op") {
    import spark.implicits._
    val (_, t) = mk("noop")
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v")).id
    assert(t.rollbackTo(s1) == 0)
    intercept[IllegalArgumentException](t.rollbackTo(999L))
  }
}
