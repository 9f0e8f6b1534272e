package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Semi-structured VARIANT columns through the whole engine path (r15
  * — the r14 verdict's feasibility ask): TableDef `"variant"` maps to
  * Spark 4's VariantType, the parquet writer SHREDS it (VARIANT(1)
  * annotated group with metadata/value/typed_value — checked by spike
  * before this landed; contrast TIME, which the writer refuses), the
  * DSv2 vectorized readers decode it (ColumnVector.getVariant reads
  * the value/metadata children through the selection wrapper), and
  * `variant_get` extracts typed fields on the far side. Merge-on-read
  * deletes over variant-bearing files exercise the columnar selection
  * map across the variant children.
  */
class LakeVariantSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft-variant-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"payload","data_type":"variant"}],
        |"partitions":[]}""".stripMargin)
    wh
  }

  test("create + append + connector read round-trips variant; " +
      "variant_get extracts typed fields") {
    val wh = mk("basic")
    val t = LakeTable.load(wh, "d", "t")
    assert(t.currentSchema.fields(1).dataType ==
      org.apache.spark.sql.types.VariantType)
    import spark.implicits._
    val src = (0 until 200).map(i =>
      (i.toLong, s"""{"a":$i,"s":"v$i","nested":{"b":${i * 2}}}"""))
      .toDF("k", "js")
      .selectExpr("k", "parse_json(js) AS payload")
    LakeTable.load(wh, "d", "t").append(src)
    val back = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
      .selectExpr("k",
        "variant_get(payload, '$.a', 'long') AS a",
        "variant_get(payload, '$.s', 'string') AS s",
        "variant_get(payload, '$.nested.b', 'long') AS b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    assert(back.length == 200)
    assert(back.forall { case (k, a, s, b) =>
      a == k && s == s"v$k" && b == 2 * k
    })
  }

  test("evolution: a variant column ADDS to an existing table and " +
      "pre-variant files read null") {
    val wh = Files.createTempDirectory("graft-variant-evolve").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"}],"partitions":[]}""".stripMargin)
    import spark.implicits._
    LakeTable.load(wh, "d", "t").append(Seq(1L, 2L).toDF("k"))
    // evolve: add the variant column
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"payload","data_type":"variant"}],
        |"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "t").append(
      Seq((3L, """{"x":30}""")).toDF("k", "js")
        .selectExpr("k", "parse_json(js) AS payload"))
    val got = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
      .selectExpr("k", "variant_get(payload, '$.x', 'long') AS x")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, -1L), (2L, -1L), (3L, 30L)),
      s"pre-variant files must read null payloads: $got")
  }

  test("MoR deletes over a variant-bearing file stay columnar and " +
      "exact (selection map across the variant children)") {
    val wh = mk("mor")
    import spark.implicits._
    val src = (0 until 500).map(i =>
      (i.toLong, s"""{"a":$i}""")).toDF("k", "js")
      .selectExpr("k", "parse_json(js) AS payload")
      .repartition(1).sortWithinPartitions("k")
    LakeTable.load(wh, "d", "t").append(src)
    LakeTable.load(wh, "d", "t").deleteMoR(spark, col("k") % 50L === 7L)
    val df = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
      .selectExpr("k", "variant_get(payload, '$.a', 'long') AS a")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val expect = (0L until 500L).filter(_ % 50L != 7L).map(k => (k, k))
    assert(got == expect)
    // and with a pushed predicate over the sorted key
    val sel = df.filter(col("k") >= 100L && col("k") < 160L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(sel == (100L until 160L).filter(_ % 50L != 7L))
  }

  test("SQL DDL surface round-trips the variant type name") {
    val cd = graft.schema.TypeMapper.toColumnDef("p",
      org.apache.spark.sql.types.VariantType, nullable = true)
    assert(cd.dataType == "variant")
    assert(graft.schema.TypeMapper.knownType("variant"))
  }
}
