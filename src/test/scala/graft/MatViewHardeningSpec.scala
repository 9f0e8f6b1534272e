package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Hardening regressions around the materialized-view lifecycle:
  * NULL-keyed eq-delete victims must reach the touched set (the
  * engine applies markers null-safely, so the recompute's victim
  * probe must too), backing tables can't be stranded by a cross-db
  * rename or destroyed by a prefix-squatting CREATE, and the refresh
  * history distinguishes a refusal (nothing happened) from a
  * post-commit error (the data DID merge).
  */
class MatViewHardeningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vsql(q: String) =
    org.apache.spark.sql.GraftViewSubstitution.sql(spark, q)

  private def messages(t: Throwable): String = {
    var m = Option(t.getMessage).getOrElse("")
    var c = t.getCause
    while (c != null) { m += " | " + Option(c.getMessage).getOrElse("")
      c = c.getCause }
    m
  }

  test("a NULL-keyed eq-delete marker's victim groups recompute " +
      "(null-safe probe mirrors the engine's marker application)") {
    val wh = Files.createTempDirectory("graft-mvh-nullkey").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"k","data_type":"string"},
        |{"column_name":"amt","data_type":"long"}],
        |"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    // group b holds one NULL-id row; id is the eq-delete key
    // no identifier-fields: declared identities must be non-nullable,
    // but EXPLICIT upsert/delete keys may be nullable columns — the
    // hole the null-safe probe covers
    LakeTable.load(wh, "d", "src").append(Seq(
      (Option(1L), "a", 5L), (Option.empty[Long], "b", 7L),
      (Option(2L), "b", 3L)).toDF("id", "k", "amt"))
    spark.conf.set("spark.sql.catalog.gmvh1", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmvh1.warehouse", wh)
    vsql("CREATE MATERIALIZED VIEW gmvh1.d.roll AS " +
      "SELECT k, count(*) AS n, sum(amt) AS s FROM gmvh1.d.src " +
      "GROUP BY k").collect()
    // a marker with a NULL key value: the engine strikes the NULL-id
    // row (null-safe application) — the incremental recompute must
    // therefore recompute group b, not skip it as "untouched"
    LakeTable.load(wh, "d", "src").deleteByKeysMoR(spark,
      Seq(Option.empty[Long]).toDF("id"))
    assert(LakeTable.load(wh, "d", "src").read(spark).count() == 2L,
      "the NULL-keyed marker must have struck the NULL-id row")
    vsql("REFRESH MATERIALIZED VIEW gmvh1.d.roll INCREMENTAL").collect()
    val got = vsql("SELECT k, n, s FROM gmvh1.d.roll ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(("a", 1L, 5L), ("b", 1L, 3L)), got.toString)
  }

  test("cross-database rename of a materialized view refuses by name " +
      "(backing table would be stranded); same-db rename still works") {
    val wh = Files.createTempDirectory("graft-mvh-rename").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"k","data_type":"string"},
        |{"column_name":"x","data_type":"long"}],"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "src").append(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "x"))
    spark.conf.set("spark.sql.catalog.gmvh2", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmvh2.warehouse", wh)
    vsql("CREATE MATERIALIZED VIEW gmvh2.d.m AS " +
      "SELECT k, sum(x) AS s FROM gmvh2.d.src GROUP BY k").collect()
    Files.createDirectories(java.nio.file.Paths.get(wh, "d2"))
    val e = intercept[Exception] {
      vsql("ALTER MATERIALIZED VIEW gmvh2.d.m RENAME TO gmvh2.d2.m")
        .collect()
    }
    assert(messages(e).contains("across databases"), messages(e))
    // the refused rename changed nothing: still readable + refreshable
    assert(vsql("SELECT sum(s) AS t FROM gmvh2.d.m").collect()
      .head.getLong(0) == 3L)
    vsql("REFRESH MATERIALIZED VIEW gmvh2.d.m").collect()
    // a PLAIN view still renames across dbs
    vsql("CREATE VIEW gmvh2.d.pv AS SELECT k FROM gmvh2.d.src").collect()
    vsql("ALTER VIEW gmvh2.d.pv RENAME TO gmvh2.d2.pv").collect()
    assert(vsql("SELECT count(*) AS c FROM gmvh2.d2.pv").collect()
      .head.getLong(0) == 2L)
  }

  test("the __mat_ prefix is reserved at CREATE TABLE; an unclaimed " +
      "non-MV table under it is never destroyed by CREATE MV") {
    val wh = Files.createTempDirectory("graft-mvh-prefix").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"k","data_type":"string"}],"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "src").append(Seq("a").toDF("k"))
    spark.conf.set("spark.sql.catalog.gmvh3", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmvh3.warehouse", wh)
    // the user-facing CREATE refuses the reserved prefix at the door
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gmvh3.d.__mat_v (x INT)").collect()
    }
    assert(messages(e1).contains("reserved"), messages(e1))
    // a table that still lands under the prefix via the direct engine
    // path (legacy data, external tooling) must fail the CREATE
    // loudly — not be silently deleted as a "crashed CREATE's orphan"
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"__mat_v","columns":[
        |{"column_name":"y","data_type":"long"}],"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "__mat_v").append(Seq(42L).toDF("y"))
    val e2 = intercept[Exception] {
      vsql("CREATE MATERIALIZED VIEW gmvh3.d.v AS " +
        "SELECT count(*) AS n FROM gmvh3.d.src").collect()
    }
    assert(messages(e2).contains("not a crashed CREATE's orphan"),
      messages(e2))
    assert(LakeTable.exists(wh, "d", "__mat_v") &&
      LakeTable.load(wh, "d", "__mat_v").read(spark).count() == 1L,
      "the squatting table must survive the refused CREATE")
    // a REAL orphan (MV-stamped backing with no fronting doc) is
    // still cleared and the CREATE retries clean
    graft.sources.MatViewDdl.create(spark, wh, "gmvh3", "d", "w",
      "SELECT count(*) AS n FROM gmvh3.d.src")
    Files.delete(graft.sources.LakeViews.path(wh, "d", "w"))
    graft.sources.MatViewDdl.create(spark, wh, "gmvh3", "d", "w",
      "SELECT count(*) AS n FROM gmvh3.d.src")
    assert(vsql("SELECT n FROM gmvh3.d.w").collect()
      .head.getLong(0) == 1L)
  }

  test("a post-commit failure logs outcome=error (the data merged), " +
      "never as a refusal") {
    val wh = Files.createTempDirectory("graft-mvh-outcome").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"k","data_type":"string"},
        |{"column_name":"x","data_type":"long"}],"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "src").append(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "x"))
    spark.conf.set("spark.sql.catalog.gmvh4", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmvh4.warehouse", wh)
    vsql("CREATE MATERIALIZED VIEW gmvh4.d.m AS " +
      "SELECT k, sum(x) AS s FROM gmvh4.d.src GROUP BY k").collect()
    LakeTable.load(wh, "d", "src").append(Seq(("a", 10L)).toDF("k", "x"))
    spark.conf.set("spark.graft.matview.post-commit-fault", "true")
    try {
      val e = intercept[Exception] {
        vsql("REFRESH MATERIALIZED VIEW gmvh4.d.m").collect()
      }
      assert(messages(e).contains("injected post-commit fault"),
        messages(e))
    } finally
      spark.conf.unset("spark.graft.matview.post-commit-fault")
    // the backing transaction committed before the fault: reads serve
    // the refreshed content even though the doc stamp was lost
    assert(vsql("SELECT s FROM gmvh4.d.m WHERE k = 'a'").collect()
      .head.getLong(0) == 11L, "the refresh DID merge")
    val last = vsql("SELECT strategy, outcome, reason FROM " +
      "gmvh4.d.m.refreshes ORDER BY ts_ms DESC, to_snapshot DESC LIMIT 1")
      .collect().head
    assert(last.getString(1) == "error",
      s"post-commit failure must log as error, got ${last.getString(1)}")
    assert(last.getString(0) == "recompute-all", last.toString)
    assert(last.getString(2).contains("injected post-commit fault"))
    // a true refusal still logs as refused
    LakeTable.load(wh, "d", "src").overwrite(Seq(("z", 9L)).toDF("k", "x"))
    intercept[Exception] {
      vsql("REFRESH MATERIALIZED VIEW gmvh4.d.m INCREMENTAL").collect()
    }
    val refused = vsql("SELECT outcome FROM gmvh4.d.m.refreshes " +
      "ORDER BY ts_ms DESC, to_snapshot DESC LIMIT 1").collect().head
    assert(refused.getString(0) == "refused", refused.toString)
  }
}
