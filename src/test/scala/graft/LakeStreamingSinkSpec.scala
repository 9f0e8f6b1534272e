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

  test("Complete output mode is refused loudly (append-only sink)") {
    implicit val sqlCtx = spark.sqlContext
    val wh = Files.createTempDirectory("graft-v2sink-cm").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"cm","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"n","data_type":"long"}],"partitions":[]}""".stripMargin)
    val mem = MemoryStream[Long]
    mem.addData(1L, 1L, 2L)
    val e = intercept[Exception] {
      val q = mem.toDF().toDF("id").groupBy("id")
        .count().toDF("id", "n")
        .writeStream.format("graft-lake")
        .option("warehouse", wh).option("database", "d").option("table", "cm")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cm-ckpt").toString)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("Complete output mode")),
      s"must refuse Complete mode, got: ${msgs(e).mkString(" | ")}")
  }

  test("writeStream onto a BRANCH: epochs stage invisibly, " +
      "fast-forward publishes the audited run") {
    implicit val sqlCtx = spark.sqlContext
    val wh = Files.createTempDirectory("graft-v2sink-br").toString
    val ckpt = Files.createTempDirectory("graft-v2sink-br-ckpt").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"sb","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "sb")
    t.append(Seq((1L, "base")).toDF("id", "v"))
    t.createBranch("audit")

    val mem = MemoryStream[(Long, String)]
    def pass(): Unit = {
      val q = mem.toDF().toDF("id", "v")
        .writeStream.format("graft-lake")
        .option("warehouse", wh).option("database", "d").option("table", "sb")
        .option("branch", "audit")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData((2L, "b"), (3L, "c"))
    pass()
    // main untouched; branch view carries the epoch; replay of the
    // same epoch (fresh query, same checkpoint) stays idempotent
    val t2 = LakeTable.load(wh, "d", "sb")
    assert(t2.read(spark).count() == 1, "main must not see staged epochs")
    assert(t2.readBranch(spark, "audit").count() == 3)
    pass() // no new data: AvailableNow drains nothing, nothing doubles
    mem.addData((4L, "d"))
    pass()
    val t3 = LakeTable.load(wh, "d", "sb")
    assert(t3.read(spark).count() == 1)
    assert(t3.readBranch(spark, "audit").count() == 4)
    // audit passed: publish; stream bookkeeping survives the publish
    t3.fastForward("audit")
    val t4 = LakeTable.load(wh, "d", "sb")
    assert(t4.read(spark).select("id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L, 4L))
    assert(t4.metadata.staged.isEmpty)
    assert(t4.lastStreamBatchId(
      t4.metadata.snapshots.flatMap(_.streamId).last).isDefined,
      "published epochs keep their replay bookkeeping")
  }

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
