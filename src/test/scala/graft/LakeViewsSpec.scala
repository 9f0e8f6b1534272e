package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Persistent catalog views (Iceberg's view spec over Spark's
  * ViewCatalog + the extensions parser/resolution rules):
  * CREATE/SELECT/REPLACE/SHOW/DROP/ALTER through SQL, with definition
  * VERSIONING — CREATE OR REPLACE appends a version rather than
  * overwriting, so a view's history stays auditable the way table
  * snapshots do. The shared test session is built without extensions,
  * so these tests drive the same parser + substitution rule the
  * extensions install (the last test proves the native
  * extensions-enabled path end-to-end).
  */
class LakeViewsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft-views-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "t")
      .append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    wh
  }

  /** spark.sql as an extensions-enabled session would run it. */
  private def vsql(s: org.apache.spark.sql.SparkSession, q: String) =
    org.apache.spark.sql.GraftViewSubstitution.sql(s, q)

  test("create, select, replace, show, drop — full SQL lifecycle") {
    val wh = mk("sql")
    spark.conf.set("spark.sql.catalog.gv", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gv.warehouse", wh)
    vsql(spark, "CREATE VIEW gv.d.big AS " +
      "SELECT id, upper(v) AS vu FROM gv.d.t WHERE id >= 2").collect()
    assert(vsql(spark, "SELECT * FROM gv.d.big ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "B"), (3L, "C")))
    // a second create of the same name refuses; IF NOT EXISTS no-ops
    intercept[Exception] {
      vsql(spark, "CREATE VIEW gv.d.big AS SELECT id FROM gv.d.t")
        .collect()
    }
    vsql(spark,
      "CREATE VIEW IF NOT EXISTS gv.d.big AS SELECT id FROM gv.d.t")
      .collect()
    // replace changes the definition; the version history grows
    vsql(spark, "CREATE OR REPLACE VIEW gv.d.big AS " +
      "SELECT id FROM gv.d.t WHERE id = 1").collect()
    assert(vsql(spark, "SELECT * FROM gv.d.big").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    val doc = graft.sources.LakeViews.read(
      graft.sources.LakeViews.path(wh, "d", "big")).get
    assert(doc.versions.map(_.id) == Seq(1, 2) &&
      doc.currentVersionId == 2,
      "CREATE OR REPLACE must append a version, not overwrite")
    assert(doc.versions(0).sql.contains("upper(v)"),
      "the replaced definition stays in history")
    // listing and drop
    val shown = vsql(spark, "SHOW VIEWS IN gv.d").collect()
      .map(_.getString(1)).toSeq
    assert(shown == Seq("big"), s"got $shown")
    vsql(spark, "DROP VIEW gv.d.big").collect()
    intercept[Exception] {
      vsql(spark, "SELECT * FROM gv.d.big").count()
    }
    // IF EXISTS tolerates the absence; plain DROP refuses by name
    vsql(spark, "DROP VIEW IF EXISTS gv.d.big").collect()
    intercept[Exception] { vsql(spark, "DROP VIEW gv.d.big").collect() }
  }

  test("views re-resolve against live data; nested views; cycles refuse") {
    val wh = mk("fresh")
    spark.conf.set("spark.sql.catalog.gv2", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gv2.warehouse", wh)
    vsql(spark,
      "CREATE VIEW gv2.d.cnt AS SELECT count(*) AS n FROM gv2.d.t")
      .collect()
    assert(vsql(spark, "SELECT n FROM gv2.d.cnt").collect()
      .head.getLong(0) == 3L)
    // the view is a DEFINITION: new table data flows through
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "t").append(Seq((9L, "z")).toDF("id", "v"))
    assert(vsql(spark, "SELECT n FROM gv2.d.cnt").collect()
      .head.getLong(0) == 4L)
    // a view over a view expands transitively
    vsql(spark,
      "CREATE VIEW gv2.d.cnt2 AS SELECT n + 1 AS m FROM gv2.d.cnt")
      .collect()
    assert(vsql(spark, "SELECT m FROM gv2.d.cnt2").collect()
      .head.getLong(0) == 5L)
    // a definition cycle is refused with the named chain, not an
    // analyzer-iteration blowup (the doc is forged to be recursive)
    val self = graft.sources.LakeViews.ViewDoc("loop", 1, Seq(
      graft.sources.LakeViews.ViewVersion(1, 0L,
        "SELECT * FROM gv2.d.loop", "{\"type\":\"struct\",\"fields\":[]}",
        Seq.empty, Seq.empty, Seq.empty, "gv2", Seq("d"))), Map.empty)
    graft.sources.LakeViews.write(
      graft.sources.LakeViews.path(wh, "d", "loop"), self)
    val e = intercept[IllegalStateException] {
      vsql(spark, "SELECT * FROM gv2.d.loop").collect()
    }
    assert(e.getMessage.contains("recursive view"), e.getMessage)
  }

  test("rename and property changes round-trip") {
    val wh = mk("alter")
    spark.conf.set("spark.sql.catalog.gv4", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gv4.warehouse", wh)
    vsql(spark, "CREATE VIEW gv4.d.v1 AS SELECT id FROM gv4.d.t")
      .collect()
    vsql(spark,
      "ALTER VIEW gv4.d.v1 SET TBLPROPERTIES ('team'='curation')")
      .collect()
    assert(graft.sources.LakeViews.read(
      graft.sources.LakeViews.path(wh, "d", "v1")).get
      .properties.get("team").contains("curation"))
    vsql(spark, "ALTER VIEW gv4.d.v1 UNSET TBLPROPERTIES ('team')")
      .collect()
    assert(!graft.sources.LakeViews.read(
      graft.sources.LakeViews.path(wh, "d", "v1")).get
      .properties.contains("team"))
    vsql(spark, "ALTER VIEW gv4.d.v1 RENAME TO gv4.d.v2").collect()
    assert(vsql(spark, "SELECT id FROM gv4.d.v2 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    intercept[Exception] {
      vsql(spark, "SELECT * FROM gv4.d.v1").count()
    }
  }

  test("the capture context qualifies bare names; CTE names stay local") {
    val wh = mk("ctx")
    spark.conf.set("spark.sql.catalog.gv5", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gv5.warehouse", wh)
    // a doc whose SQL uses a BARE table name plus a CTE: the stored
    // capture context (catalog gv5, namespace d) must complete `t`,
    // while the CTE name `c` must NOT be qualified into a table ref
    val doc = graft.sources.LakeViews.ViewDoc("ctxv", 1, Seq(
      graft.sources.LakeViews.ViewVersion(1, 0L,
        "WITH c AS (SELECT id FROM t WHERE id > 1) " +
          "SELECT id FROM c", "{\"type\":\"struct\",\"fields\":[]}",
        Seq.empty, Seq.empty, Seq.empty, "gv5", Seq("d"))), Map.empty)
    graft.sources.LakeViews.write(
      graft.sources.LakeViews.path(wh, "d", "ctxv"), doc)
    assert(vsql(spark, "SELECT id FROM gv5.d.ctxv ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("views and tables cannot shadow each other") {
    val wh = mk("shadow")
    spark.conf.set("spark.sql.catalog.gv6", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gv6.warehouse", wh)
    // a view named after the existing table refuses
    val e1 = intercept[Exception] {
      vsql(spark, "CREATE VIEW gv6.d.t AS SELECT 1 AS one").collect()
    }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    // a table named after an existing view refuses
    vsql(spark, "CREATE VIEW gv6.d.v AS SELECT id FROM gv6.d.t").collect()
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gv6.d.v (x BIGINT)")
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
  }

  test("qualified column refs resolve; rename honors the target db") {
    val wh = mk("qual")
    spark.conf.set("spark.sql.catalog.gv7", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gv7.warehouse", wh)
    vsql(spark, "CREATE VIEW gv7.d.qv AS SELECT id, v FROM gv7.d.t")
      .collect()
    // multi-part alias: `d.qv.id` disambiguates like a table's would
    assert(vsql(spark,
      "SELECT d.qv.id FROM gv7.d.qv WHERE d.qv.id = 2").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // cross-db rename really moves the view
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(wh, "d2"))
    vsql(spark, "ALTER VIEW gv7.d.qv RENAME TO gv7.d2.qv2").collect()
    assert(vsql(spark, "SELECT id FROM gv7.d2.qv2").collect().length == 3)
    intercept[Exception] {
      vsql(spark, "SELECT * FROM gv7.d.qv").count()
    }
    // a cross-CATALOG rename refuses by name
    vsql(spark, "CREATE VIEW gv7.d.r AS SELECT id FROM gv7.d.t").collect()
    val e = intercept[Exception] {
      vsql(spark, "ALTER VIEW gv7.d.r RENAME TO other.d.r").collect()
    }
    assert(e.getMessage.contains("across catalogs"), e.getMessage)
  }

  test("property values may contain commas and escaped quotes") {
    val wh = mk("props")
    spark.conf.set("spark.sql.catalog.gv8", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gv8.warehouse", wh)
    vsql(spark, "CREATE VIEW gv8.d.p AS SELECT id FROM gv8.d.t").collect()
    vsql(spark, "ALTER VIEW gv8.d.p SET TBLPROPERTIES " +
      "('comment'='a, b', 'who'='it''s me')").collect()
    val props = graft.sources.LakeViews.read(
      graft.sources.LakeViews.path(wh, "d", "p")).get.properties
    assert(props.get("comment").contains("a, b"), props)
    assert(props.get("who").contains("it's me"), props)
  }

  test("3-part statements on non-view catalogs fall back to stock Spark") {
    // spark_catalog persistent views via the intercepted statements:
    // the fallback plan must execute the stock path, not throw
    // "does not support views"
    vsql(spark,
      "CREATE VIEW spark_catalog.default.stockv AS SELECT 7 AS x")
      .collect()
    try {
      assert(spark.sql("SELECT x FROM default.stockv").collect()
        .head.getInt(0) == 7)
    } finally {
      vsql(spark, "DROP VIEW IF EXISTS spark_catalog.default.stockv")
        .collect()
    }
  }

  test("column aliases + comments + properties round-trip through " +
      "SHOW CREATE VIEW; DESCRIBE serves views and falls back for " +
      "tables") {
    val wh = mk("showcreate")
    spark.conf.set("spark.sql.catalog.gvs", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gvs.warehouse", wh)
    vsql(spark, "CREATE VIEW gvs.d.named " +
      "(ident COMMENT 'the row''s key', val) " +
      "TBLPROPERTIES ('owner' = 'graft') AS " +
      "SELECT id, upper(v) FROM gvs.d.t WHERE id >= 2").collect()
    // the alias list renames the output positionally
    val rows = vsql(spark,
      "SELECT ident, val FROM gvs.d.named ORDER BY ident").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((2L, "B"), (3L, "C")))
    // DESCRIBE: aliased names, types, the stored comment
    val desc = vsql(spark, "DESCRIBE gvs.d.named").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(desc == Seq(("ident", "bigint", "the row's key"),
      ("val", "string", null)), desc.toString)
    val ext = vsql(spark, "DESC EXTENDED gvs.d.named").collect()
      .map(_.getString(0))
    assert(ext.contains("View Text") && ext.contains("# View Information"))
    // DESCRIBE on a lake TABLE still executes the stock plan
    val tdesc = vsql(spark, "DESCRIBE gvs.d.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(tdesc.contains(("id", "bigint")) &&
      tdesc.contains(("v", "string")), tdesc.toString)
    // SHOW CREATE VIEW emits a statement this parser re-executes
    val stmt = vsql(spark, "SHOW CREATE VIEW gvs.d.named").collect()
      .head.getString(0)
    assert(stmt.contains("COMMENT 'the row''s key'") &&
      stmt.contains("'owner' = 'graft'"), stmt)
    vsql(spark, "DROP VIEW gvs.d.named").collect()
    vsql(spark, stmt).collect()
    assert(vsql(spark,
      "SELECT ident, val FROM gvs.d.named ORDER BY ident").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == rows,
      "the recreated view must serve identical rows")
    val desc2 = vsql(spark, "DESCRIBE gvs.d.named").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(desc2 == Seq(("ident", "the row's key"), ("val", null)),
      "comments must survive the round-trip")
    // a mis-sized column list refuses by name
    val e = intercept[Exception] {
      vsql(spark, "CREATE VIEW gvs.d.bad (one) AS " +
        "SELECT id, v FROM gvs.d.t").collect()
    }
    assert(e.getMessage.contains("column list"), e.getMessage)
  }

  test("an extensions-enabled session serves views through plain spark.sql") {
    val wh = mk("native")
    // getOrCreate() would hand back the SHARED session (extensions
    // ignored) — clear the active/default handles so a genuinely
    // extended session builds, restore after
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      s2.conf.set("spark.sql.catalog.gvn", "graft.sources.LakeCatalog")
      s2.conf.set("spark.sql.catalog.gvn.warehouse", wh)
      s2.sql("CREATE VIEW gvn.d.nat AS " +
        "SELECT id FROM gvn.d.t WHERE id > 1")
      assert(s2.sql("SELECT * FROM gvn.d.nat ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(2L, 3L))
      assert(s2.sql("SHOW VIEWS IN gvn.d").collect()
        .map(_.getString(1)).toSeq == Seq("nat"))
      s2.sql("DROP VIEW gvn.d.nat")
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
