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

  test("zorder clustering prunes on every listed dimension") {
    val wh = Files.createTempDirectory("graft-zorder").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"z","columns":[
        |{"column_name":"x","data_type":"long"},
        |{"column_name":"y","data_type":"long"},
        |{"column_name":"v","data_type":"double"}],
        |"partitions":[],
        |"properties":{"write.sort-order":"zorder(x,y)","write.sort-buckets":"16"}}""".stripMargin)
    val t = LakeTable.load(wh, "d", "z")
    // 64x64 grid, shuffled
    t.append(spark.range(4096).selectExpr(
      "CAST(id % 64 AS LONG) AS x", "CAST(id DIV 64 AS LONG) AS y",
      "CAST(id AS DOUBLE) AS v"))

    val files = t.plannedFiles()
    assert(files.size > 4)
    def prunedCount(colName: String): Int =
      t.plannedFiles(statsFilters = Seq(graft.lake.RangeFilter(colName,
        loNum = Some(BigDecimal(0)), hiNum = Some(BigDecimal(7))))).size
    // a narrow slice on EITHER dimension must drop files — the point
    // of z-order vs single-column sort (which only prunes its own col)
    assert(prunedCount("x") < files.size, s"x slice kept all ${files.size}")
    assert(prunedCount("y") < files.size, s"y slice kept all ${files.size}")
    // correctness: box query returns exactly the box
    val n = t.read(spark, statsFilters = Seq(
        graft.lake.RangeFilter("x", loNum = Some(BigDecimal(0)), hiNum = Some(BigDecimal(7))),
        graft.lake.RangeFilter("y", loNum = Some(BigDecimal(0)), hiNum = Some(BigDecimal(7)))))
      .filter("x < 8 AND y < 8").count()
    assert(n == 64)
  }

  test("single-column zorder degenerates to a plain sort (no overflow)") {
    val wh = Files.createTempDirectory("graft-zorder1").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"z1","columns":[
        |{"column_name":"id","data_type":"long"}],
        |"partitions":[],
        |"properties":{"write.sort-order":"zorder(id)","write.sort-buckets":"4"}}""".stripMargin)
    val t = LakeTable.load(wh, "d", "z1")
    import SparkTestSession.spark.implicits._
    t.append(spark.range(1000).selectExpr("id"))
    val files = t.plannedFiles()
    assert(files.size > 1, "must not collapse to one partition")
    val pruned = t.plannedFiles(statsFilters = Seq(graft.lake.RangeFilter("id",
      loNum = Some(BigDecimal(0)), hiNum = Some(BigDecimal(10)))))
    assert(pruned.size < files.size)
  }

  test("zorder interleave: monotone per dimension, locality-preserving") {
    import graft.functions.ZOrderUtil.interleave
    val bits = 31
    // fixing y, z is monotone in x — and vice versa
    val zx = (0L until 100L).map(x => interleave(Array(x, 5L), bits))
    assert(zx == zx.sorted && zx.distinct.size == zx.size)
    val zy = (0L until 100L).map(y => interleave(Array(5L, y), bits))
    assert(zy == zy.sorted && zy.distinct.size == zy.size)
    // locality: neighbors in (x,y) are close in z (within 2 bits' reach)
    assert(math.abs(interleave(Array(3L, 3L), bits) -
      interleave(Array(3L, 4L), bits)) <= 16)
  }

  test("write.option.* properties reach the parquet writer (bloom filter)") {
    val wh = Files.createTempDirectory("graft-bloom").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"b","columns":[
        |{"column_name":"id","data_type":"long"}],
        |"partitions":[],
        |"properties":{"write.option.parquet.bloom.filter.enabled#id":"true"}}""".stripMargin)
    val t = LakeTable.load(wh, "d", "b")
    import SparkTestSession.spark.implicits._
    t.append(spark.range(1000).selectExpr("id"))
    val path = t.plannedFiles().head.path
    val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        new org.apache.hadoop.conf.Configuration()))
    try {
      val block = fr.getFooter.getBlocks.get(0)
      val chunk = block.getColumns.get(0)
      assert(fr.getBloomFilterDataReader(block).readBloomFilter(chunk) != null,
        "bloom filter missing from footer")
    } finally fr.close()
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
