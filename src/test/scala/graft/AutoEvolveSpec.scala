package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** `write.merge-schema=true` ingestion auto-evolution (Delta's
  * mergeSchema): appends carrying new top-level columns add them as
  * optional; columns arriving legally wider evolve up; everything
  * goes through the same validated evolution ALTER TABLE uses, in one
  * transaction flip with the data.
  */
class AutoEvolveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def setup(tag: String, merge: Boolean): String = {
    val wh = Files.createTempDirectory(s"graft-autoev-$tag").toString
    val props =
      if (merge) """"properties":{"write.merge-schema":"true"},"""
      else ""
    Engine.processTableDefJson(wh,
      s"""{"database_name":"d","table_name":"t",$props"columns":[
         |{"column_name":"k","data_type":"int"},
         |{"column_name":"v","data_type":"long"}],
         |"partitions":[]}""".stripMargin)
    wh
  }

  test("new columns auto-add as optional; pre-evolution rows read " +
      "NULL; data and schema land in one flip") {
    val wh = setup("add", merge = true)
    import SparkTestSession.spark.implicits._
    val t = LakeTable.load(wh, "d", "t")
    t.append(Seq((1, 10L)).toDF("k", "v"))
    val v0 = LakeTable.load(wh, "d", "t")
    val before = v0.metadata.currentSchemaId
    LakeTable.load(wh, "d", "t").append(
      Seq((2, 20L, "x")).toDF("k", "v", "note"))
    val after = LakeTable.load(wh, "d", "t")
    assert(after.metadata.currentSchemaId != before,
      "the append must evolve the schema")
    assert(after.currentSchema.fieldNames.toSeq == Seq("k", "v", "note"))
    val rows = after.read(spark).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.toString).orNull)).toSeq
    assert(rows == Seq((1, 10L, null), (2, 20L, "x")),
      "old rows read NULL for the auto-added column")
  }

  test("legally wider columns evolve up (int→long); illegal changes " +
      "are not applied and the frame aligns by cast as before") {
    val wh = setup("widen", merge = true)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "t").append(Seq((1, 10L)).toDF("k", "v"))
    // k arrives as LONG → int→long is a legal promotion → widen
    LakeTable.load(wh, "d", "t").append(
      Seq((3000000000L, 30L)).toDF("k", "v"))
    val t2 = LakeTable.load(wh, "d", "t")
    assert(graft.lake.Reconcile.clean(t2.currentSchema)
      .asInstanceOf[org.apache.spark.sql.types.StructType]("k").dataType
      == org.apache.spark.sql.types.LongType,
      "int column must widen to long")
    assert(t2.read(spark).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3000000000L))
    // v arrives as STRING — long→string is NOT a promotion: the
    // schema stays long and the value casts like any aligned write
    LakeTable.load(wh, "d", "t").append(
      Seq((5L, "50")).toDF("k", "v"))
    val t3 = LakeTable.load(wh, "d", "t")
    assert(graft.lake.Reconcile.clean(t3.currentSchema)
      .asInstanceOf[org.apache.spark.sql.types.StructType]("v").dataType
      == org.apache.spark.sql.types.LongType,
      "an illegal promotion must not evolve the column")
    assert(t3.read(spark).filter(col("k") === 5L).head().getLong(1)
      == 50L)
  }

  test("nested additions evolve too: new struct fields (top and " +
      "array-of-struct element) join as optional; old rows read NULL") {
    val wh = Files.createTempDirectory("graft-autoev-nest").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t",
        |"properties":{"write.merge-schema":"true"},"columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"meta","data_type":"struct","struct_def":[
        |  {"column_name":"src","data_type":"string"}]},
        |{"column_name":"tags","data_type":"array","array_def":
        |  {"column_name":"element","data_type":"struct","struct_def":[
        |  {"column_name":"name","data_type":"string"}]}}],
        |"partitions":[]}""".stripMargin)
    val v1 = spark.sql(
      """SELECT 1L AS k, named_struct('src', 'a') AS meta,
        |  array(named_struct('name', 'n1')) AS tags""".stripMargin)
    LakeTable.load(wh, "d", "t").append(v1)
    // writer v2: a new field inside `meta` AND inside the array
    // element struct
    val v2 = spark.sql(
      """SELECT 2L AS k,
        |  named_struct('src', 'b', 'lang', 'en') AS meta,
        |  array(named_struct('name', 'n2', 'weight', 0.5D)) AS tags
        |""".stripMargin)
    LakeTable.load(wh, "d", "t").append(v2)
    val t = LakeTable.load(wh, "d", "t")
    val clean = graft.lake.Reconcile.clean(t.currentSchema)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(clean("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("src", "lang"), clean("meta").toString)
    val elem = clean("tags").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elem.fieldNames.toSeq == Seq("name", "weight"),
      elem.toString)
    val rows = t.read(spark).orderBy("k")
      .selectExpr("k", "meta.src", "meta.lang",
        "tags[0].name", "tags[0].weight")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull, r.getString(3),
        Option(r.get(4)).map(_.toString).orNull)).toSeq
    assert(rows == Seq((1L, "a", null, "n1", null),
      (2L, "b", "en", "n2", "0.5")),
      s"old rows read NULL for the nested additions: $rows")
  }

  test("auto-evolution composes with SQL transactions: schema and " +
      "data stage together, invisible until COMMIT") {
    val wh = setup("txn", merge = true)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "t").append(Seq((1, 10L)).toDF("k", "v"))
    def observed[A](body: => A): A = {
      @volatile var out: A = null.asInstanceOf[A]
      val t = new Thread(() => out = body)
      t.start(); t.join(); out
    }
    graft.lake.SqlTxn.begin()
    try {
      // the routed (buffered) handle auto-evolves IN the transaction
      LakeTable.load(wh, "d", "t").append(
        Seq((2, 20L, "x")).toDF("k", "v", "note"))
      // inside: read-your-writes sees the evolved shape + row
      assert(LakeTable.load(wh, "d", "t").read(spark).columns.toSeq ==
        Seq("k", "v", "note"))
      // outside: neither the schema nor the row leaked
      val out = observed {
        val t = LakeTable.load(wh, "d", "t")
        (t.currentSchema.fieldNames.toSeq, t.read(spark).count())
      }
      assert(out == ((Seq("k", "v"), 1L)),
        s"staged evolution leaked before COMMIT: $out")
      graft.lake.SqlTxn.commit()
    } finally if (graft.lake.SqlTxn.active.nonEmpty)
      graft.lake.SqlTxn.rollback()
    val after = observed {
      val t = LakeTable.load(wh, "d", "t")
      (t.currentSchema.fieldNames.toSeq, t.read(spark).count())
    }
    assert(after == ((Seq("k", "v", "note"), 2L)),
      s"COMMIT must publish schema and data together: $after")
  }

  test("case-insensitive resolution: a frame column differing only " +
      "in case maps onto the existing column — never a case-duplicate " +
      "add (Delta's mergeSchema contract)") {
    val wh = setup("case", merge = true)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "t").append(Seq((1, 10L)).toDF("k", "v"))
    // "V" is "v" under the default case-insensitive resolution: no new
    // column; the frame aligns onto the existing one
    LakeTable.load(wh, "d", "t").append(Seq((2, 20L)).toDF("k", "V"))
    val after = LakeTable.load(wh, "d", "t")
    assert(after.currentSchema.fieldNames.toSeq == Seq("k", "v"),
      s"case-variant arrival must not add a duplicate: " +
        s"${after.currentSchema.fieldNames.toSeq}")
    assert(after.read(spark).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 10L), (2, 20L)))
    // a case-variant column arriving legally WIDER still promotes the
    // existing column (int k → long), keeping the table's spelling
    LakeTable.load(wh, "d", "t").append(
      Seq((3L, 30L)).toDF("K", "v"))
    val after2 = LakeTable.load(wh, "d", "t")
    assert(after2.currentSchema.fieldNames.toSeq == Seq("k", "v"))
    assert(after2.currentSchema("k").dataType ==
      org.apache.spark.sql.types.LongType,
      "the case-variant wider arrival must promote the EXISTING column")
    assert(after2.read(spark).count() == 3L)
  }

  test("without the property, extra columns drop at alignment " +
      "exactly as before") {
    val wh = setup("off", merge = false)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "t").append(
      Seq((1, 10L, "x")).toDF("k", "v", "note"))
    val t = LakeTable.load(wh, "d", "t")
    assert(t.currentSchema.fieldNames.toSeq == Seq("k", "v"))
    assert(t.read(spark).columns.toSeq == Seq("k", "v"))
  }
}
