package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}
import graft.schema.TableDef

/** Table-level identifier fields (Iceberg v2 `identifier-field-ids`):
  * declared once via the `identifier-fields` table property, stored as
  * field IDS in metadata (rename-proof), defaulted into every keyed
  * MoR verb, and guarded through schema evolution — so two CDC writers
  * can never silently upsert with diverging key sets.
  */
class IdentifierFieldsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String, props: String = ""): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-ident-$tag").toString
    // both columns are declared required: identifier fields must be
    // non-nullable (Iceberg v2), and these tests move the identity
    // between `id` and `v`
    Engine.processTableDefJson(wh,
      s"""{"database_name":"d","table_name":"t","columns":[
         |{"column_name":"id","data_type":"long","required":true},
         |{"column_name":"v","data_type":"string","required":true}],"partitions":[]
         |$props}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "t"))
  }

  private val identProps =
    ""","properties":{"identifier-fields":"id"}"""

  private def df(rows: (Long, String)*) = {
    import SparkTestSession.spark.implicits._
    rows.toDF("id", "v")
  }

  private def content(t: LakeTable): Map[Long, String] =
    t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("declared identity persists as field ids and defaults the keys") {
    val (wh, t) = mk("basic", identProps)
    assert(t.identifierFieldNames == Seq("id"))
    t.append(df(1L -> "a", 2L -> "b"))
    // key-less upsert and delete inherit the declared identity
    t.upsertMoR(spark, df(2L -> "b2", 3L -> "c"))
    import spark.implicits._
    t.deleteByKeysMoR(spark, Seq(1L).toDF("id"))
    assert(content(t) == Map(2L -> "b2", 3L -> "c"))
    // a fresh handle reads the same identity from the metadata JSON
    assert(LakeTable.load(wh, "d", "t").identifierFieldNames == Seq("id"))
  }

  test("explicit keys that drift from the identity are refused") {
    val (_, t) = mk("drift", identProps)
    t.append(df(1L -> "a"))
    val e = intercept[IllegalArgumentException] {
      t.upsertMoR(spark, df(1L -> "a2"), keys = Seq("v"))
    }
    assert(e.getMessage.contains("identifier fields"))
    // matching explicit keys are fine (same set)
    t.upsertMoR(spark, df(1L -> "a2"), keys = Seq("id"))
    assert(content(t) == Map(1L -> "a2"))
    // delete-by-keys drift: the frame's columns ARE the key set
    import spark.implicits._
    intercept[IllegalArgumentException] {
      t.deleteByKeysMoR(spark, Seq("a2").toDF("v"))
    }
  }

  test("key-less upsert without a declared identity fails loudly") {
    val (_, t) = mk("none")
    t.append(df(1L -> "a"))
    val e = intercept[IllegalArgumentException] {
      t.upsertMoR(spark, df(1L -> "a2"))
    }
    assert(e.getMessage.contains("identifier-fields"))
  }

  test("identity follows a rename (ids, not names)") {
    val (wh, t) = mk("rename", identProps)
    t.append(df(1L -> "a"))
    t.renameColumn("id", "entity_id")
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.identifierFieldNames == Seq("entity_id"))
    import spark.implicits._
    t2.upsertMoR(spark, Seq((1L, "a2")).toDF("entity_id", "v"))
    assert(t2.read(spark).collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap == Map(1L -> "a2"))
  }

  test("evolution cannot drop an identifier field without redeclaring") {
    val (wh, t) = mk("drop", identProps)
    t.append(df(1L -> "a"))
    def defJson(cols: String, props: String) =
      s"""{"database_name":"d","table_name":"t","columns":[$cols],
         |"partitions":[]$props}""".stripMargin
    // dropping `id` (the identity) with no redeclaration → refused
    val bad = TableDef.parse(defJson(
      """{"column_name":"v","data_type":"string","required":true}""",
      "")).toOption.get
    val e = intercept[IllegalArgumentException] { t.evolve(bad) }
    assert(e.getMessage.contains("identifier fields"))
    // same drop WITH a redeclaration onto a surviving column → allowed
    val moved = TableDef.parse(defJson(
      """{"column_name":"v","data_type":"string","required":true}""",
      ""","properties":{"identifier-fields":"v"}""")).toOption.get
    val (_, errored) = t.evolve(moved)
    assert(!errored)
    assert(LakeTable.load(wh, "d", "t").identifierFieldNames == Seq("v"))
  }

  test("changing identity with live equality batches is refused") {
    val (_, t) = mk("eqlive", identProps)
    t.append(df(1L -> "a"))
    t.upsertMoR(spark, df(1L -> "a2"))  // live eq batch keyed on id
    val redecl = TableDef.parse(
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long","required":true},
        |{"column_name":"v","data_type":"string","required":true}],"partitions":[],
        |"properties":{"identifier-fields":"v"}}""".stripMargin).toOption.get
    val e = intercept[IllegalArgumentException] { t.evolve(redecl) }
    assert(e.getMessage.contains("equality-delete"))
    // after compaction the batches are materialized and the move works
    t.compact(spark)
    val (_, errored) = t.evolve(redecl)
    assert(!errored)
    assert(t.identifierFieldNames == Seq("v"))
  }

  test("SQL TBLPROPERTIES keeps the resolved identity in sync") {
    val (wh, t) = mk("tblprops")
    t.append(df(1L -> "a"))
    spark.conf.set("spark.sql.catalog.gidp", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gidp.warehouse", wh)
    // declare identity through SQL — key-less upsert works right after
    spark.sql(
      "ALTER TABLE gidp.d.t SET TBLPROPERTIES('identifier-fields'='id')")
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.identifierFieldNames == Seq("id"))
    t2.upsertMoR(spark, df(1L -> "a2"))
    assert(content(t2) == Map(1L -> "a2"))
    // changing identity with live batches refuses through SQL too
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE gidp.d.t SET TBLPROPERTIES('identifier-fields'='v')")
    }
    def chain(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y =>
        Option(y.getMessage).toSeq ++ chain(y.getCause))
    assert(chain(e).exists(_.contains("equality-delete")))
    // after compaction the move works, and UNSET clears the identity
    LakeTable.load(wh, "d", "t").compact(spark)
    spark.sql(
      "ALTER TABLE gidp.d.t SET TBLPROPERTIES('identifier-fields'='v')")
    assert(LakeTable.load(wh, "d", "t").identifierFieldNames == Seq("v"))
    spark.sql(
      "ALTER TABLE gidp.d.t UNSET TBLPROPERTIES('identifier-fields')")
    assert(LakeTable.load(wh, "d", "t").identifierFieldNames.isEmpty)
  }

  test("nullable identifier column at create fails loudly") {
    val wh = Files.createTempDirectory("graft-ident-null").toString
    // `id` is NOT declared required → nullable → refused at resolve time
    // (a nullable identifier would let null key tuples match each other)
    val resp = Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[],
        |"properties":{"identifier-fields":"id"}}""".stripMargin)
    assert(resp.hasError)
    assert(resp.messageList.exists(_.contains("non-nullable")))
    assert(!LakeTable.exists(wh, "d", "t"))
  }

  test("non-scalar identifier column at create fails loudly") {
    val wh = Files.createTempDirectory("graft-ident-struct").toString
    val resp = Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"meta","data_type":"struct","required":true,
        |"struct_def":[{"column_name":"k","data_type":"long","required":true}]},
        |{"column_name":"v","data_type":"string"}],"partitions":[],
        |"properties":{"identifier-fields":"meta"}}""".stripMargin)
    assert(resp.hasError)
    assert(resp.messageList.exists(_.contains("scalar")))
    assert(!LakeTable.exists(wh, "d", "t"))
  }

  test("unknown identifier column at create fails loudly") {
    val wh = Files.createTempDirectory("graft-ident-bad").toString
    // the engine's handler contract reports failures, never throws
    val resp = Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"}],"partitions":[],
        |"properties":{"identifier-fields":"nope"}}""".stripMargin)
    assert(resp.hasError)
    assert(resp.messageList.exists(_.contains("nope")))
    assert(!LakeTable.exists(wh, "d", "t"))
  }
}
