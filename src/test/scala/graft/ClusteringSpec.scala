package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable, RangeFilter}

/** Write clustering via the "write.sort-order" table property:
  * range-partition + sort on write gives each file a narrow value
  * range, so min/max stats pruning drops most files for a point/range
  * predicate. Also pins property persistence through create/evolve.
  */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("sort-order clustering: disjoint file ranges, stats pruning bites") {
    val wh = Files.createTempDirectory("graft-cluster").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],
        |"partitions":[],
        |"properties":{"write.sort-order":"id","write.sort-buckets":"4"}}""".stripMargin)
    val t = LakeTable.load(wh, "d", "t")
    assert(t.metadata.properties("write.sort-order") == "id")

    import SparkTestSession.spark.implicits._
    // shuffled ids; without clustering every file would span ~the full
    // [0, 4000) range and nothing could be pruned
    val df = spark.range(4000)
      .selectExpr("CAST(hash(id) AS LONG) % 100000 AS shuffle_key",
        "id", "CAST(id AS STRING) AS v")
      .orderBy("shuffle_key").select("id", "v").repartition(4)
    t.append(df)

    val files = t.plannedFiles()
    assert(files.size > 1, "clustering should produce multiple files")
    // each file's id-range must be narrow: sum of spans ≈ total span
    // (disjoint), not files×total (overlapping)
    val idFieldId = graft.schema.FieldIds.idOf(
      t.currentSchema.fields.find(_.name == "id").get)
    val spans = files.map { f =>
      val cs = f.stats(idFieldId)
      BigDecimal(cs.max) - BigDecimal(cs.min)
    }
    assert(spans.sum < 4000 * 1.5, s"file ranges overlap too much: $spans")

    // point-range predicate opens a strict subset of files
    val pruned = t.plannedFiles(statsFilters = Seq(RangeFilter("id",
      loNum = Some(BigDecimal(100)), hiNum = Some(BigDecimal(150)))))
    assert(pruned.size < files.size)
    assert(pruned.nonEmpty)
    // and the pruned read still returns exactly the right rows
    val got = t.read(spark, statsFilters = Seq(RangeFilter("id",
        loNum = Some(BigDecimal(100)), hiNum = Some(BigDecimal(150)))))
      .filter("id BETWEEN 100 AND 150").count()
    assert(got == 51)
  }

  test("properties persist and evolve merges them") {
    val wh = Files.createTempDirectory("graft-props").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"p","columns":[
        |{"column_name":"a","data_type":"int"}],
        |"partitions":[],"properties":{"write.sort-order":"a","k1":"v1"}}""".stripMargin)
    val r = Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"p","columns":[
        |{"column_name":"a","data_type":"int"}],
        |"partitions":[],"properties":{"k1":"v2","k2":"x"}}""".stripMargin)
    assert(r.messageList.contains("Updated table properties"))
    val t = LakeTable.load(wh, "d", "p")
    assert(t.metadata.properties ==
      Map("write.sort-order" -> "a", "k1" -> "v2", "k2" -> "x"))
  }
}
