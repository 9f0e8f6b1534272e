package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** DSv2 streaming SINK: writeStream.format("graft-lake") commits one
  * snapshot per non-empty micro-batch through executor-side parquet
  * writers; epochs are tagged for replay idempotence; partitioned
  * tables are refused with a pointer to the foreachBatch path.
  */
class LakeStreamingSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("writeStream into a lake table: snapshots per batch, restart-safe") {
    implicit val sqlCtx = spark.sqlContext
    val wh = Files.createTempDirectory("graft-v2sink").toString
    val ckpt = Files.createTempDirectory("graft-v2sink-ckpt").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"s","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)

    val mem = MemoryStream[(Long, String)]
    def pass(): Unit = {
      val q = mem.toDF().toDF("id", "v")
        .writeStream.format("graft-lake")
        .option("warehouse", wh).option("database", "d").option("table", "s")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    mem.addData((1L, "a"), (2L, "b"))
    pass()
    val t1 = LakeTable.load(wh, "d", "s")
    assert(t1.read(spark).count() == 2)
    assert(t1.metadata.snapshots.last.streamBatchId.isDefined)

    // second batch through a fresh query run against the same checkpoint
    mem.addData((3L, "c"))
    pass()
    val t2 = LakeTable.load(wh, "d", "s")
    assert(t2.read(spark).select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    assert(t2.metadata.snapshots.count(_.operation == "append") == 2)
    // stats were extracted from the executor-written footers
    val idField = graft.schema.FieldIds.idOf(
      t2.currentSchema.fields.find(_.name == "id").get)
    assert(t2.metadata.snapshots.last.files.forall(_.stats.contains(idField)))
    // round-trip through the DSv2 reader too
    assert(spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "s")
      .load().count() == 3)
  }

  test("partitioned tables: per-row transform fan-out, metadata pruning") {
    implicit val sqlCtx = spark.sqlContext
    val wh = Files.createTempDirectory("graft-v2sink-p").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"p","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"g","data_type":"string"},
        |{"column_name":"at","data_type":"timestamp"}],
        |"partitions":[{"column":"g"},
        |              {"column":"at","transform":"month"}]}""".stripMargin)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (1L, "a", ts("2024-01-05 10:00:00")),
      (2L, "b", ts("2024-01-20 11:00:00")),
      (3L, "a", ts("2024-02-01 12:00:00")))
    val q = mem.toDF().toDF("id", "g", "at")
      .withColumn("at", org.apache.spark.sql.functions.col("at")
        .cast(org.apache.spark.sql.types.TimestampNTZType))
      .writeStream.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "p")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val t = LakeTable.load(wh, "d", "p")
    assert(t.read(spark).count() == 3)
    // partition values derived per row, same rendering as batch writes
    val parts = LakeTable.liveFiles(t.metadata.snapshots)
      .map(_.partitionValues).toSet
    assert(parts == Set(
      Map("g_identity" -> "a", "at_month" -> "2024-01"),
      Map("g_identity" -> "b", "at_month" -> "2024-01"),
      Map("g_identity" -> "a", "at_month" -> "2024-02")))
    // metadata pruning over the streamed files
    assert(t.read(spark, prune = Map("g_identity" -> Set("a")))
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(t.read(spark, prune = Map("at_month" -> Set("2024-02")))
      .select("id").collect().map(_.getLong(0)).toSet == Set(3L))
    // batch append alongside streamed files stays consistent
    import spark.implicits._
    t.append(Seq((9L, "c", ts("2024-03-01 00:00:00")))
      .toDF("id", "g", "at"))
    assert(t.read(spark, prune = Map("g_identity" -> Set("c"))).count() == 1)
  }
}
