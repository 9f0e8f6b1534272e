package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}
import graft.streaming.StreamIngest

class StreamIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming ingest commits snapshots; schema evolution applies mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val wh = Files.createTempDirectory("graft-ingest").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"ev","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)

    val mem = MemoryStream[(Long, String)]
    def pass(): Unit = {
      val q = StreamIngest.intoLake(mem.toDF().toDF("k", "v"), wh, "d", "ev", ckpt)
      q.awaitTermination()
    }
    mem.addData((1L, "a"), (2L, "b"))
    pass()
    val t1 = LakeTable.load(wh, "d", "ev")
    assert(t1.read(spark).count() == 2)
    assert(t1.metadata.snapshots.size == 1)

    // evolve while the "stream" is between micro-batches: add a column
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"ev","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"v","data_type":"string"},
        |{"column_name":"extra","data_type":"int"}],"partitions":[]}""".stripMargin)
    mem.addData((3L, "c"))
    pass()

    val t2 = LakeTable.load(wh, "d", "ev")
    val out = t2.read(spark)
    assert(out.columns.toSeq == Seq("k", "v", "extra"))
    assert(out.count() == 3)
    // all rows (old and new) surface NULL extra — the batch written
    // after evolution was aligned to the new schema (null-filled)
    assert(out.filter(col("extra").isNotNull).count() == 0)
    assert(t2.metadata.snapshots.size == 2)
  }

  test("replayed micro-batch is not appended twice; fresh checkpoint is") {
    implicit val sqlCtx = spark.sqlContext
    val wh = Files.createTempDirectory("graft-replay").toString
    val ckpt = Files.createTempDirectory("graft-replay-ckpt").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"rp","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)

    val mem = MemoryStream[(Long, String)]
    def pass(c: String): Unit = {
      val q = StreamIngest.intoLake(mem.toDF().toDF("k", "v"), wh, "d", "rp", c)
      q.awaitTermination()
    }
    mem.addData((1L, "a"), (2L, "b"))
    pass(ckpt)
    assert(LakeTable.load(wh, "d", "rp").read(spark).count() == 2)

    // foreachBatch is at-least-once: simulate a crash after the snapshot
    // commit but before the checkpoint commit by deleting the batch's
    // commit marker — the restart replays micro-batch 0
    val commit0 = java.nio.file.Paths.get(ckpt, "commits", "0")
    assert(Files.exists(commit0), "expected commit marker for batch 0")
    Files.delete(commit0)
    // also drop Hadoop's checksum sibling or the replay's re-commit
    // trips ChecksumFileSystem's rename onto the stale .0.crc
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    pass(ckpt)
    val t = LakeTable.load(wh, "d", "rp")
    assert(t.read(spark).count() == 2, "replayed batch must be skipped")
    assert(t.metadata.snapshots.size == 1)
    assert(t.lastStreamBatchId(ckpt).contains(0L))

    // a different stream (fresh checkpoint) restarts at batch 0 and must
    // NOT be deduped against the old stream's ids
    val ckpt2 = Files.createTempDirectory("graft-replay-ckpt2").toString
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((3L, "c"))
    val q2 = StreamIngest.intoLake(mem2.toDF().toDF("k", "v"), wh, "d", "rp", ckpt2)
    q2.awaitTermination()
    assert(LakeTable.load(wh, "d", "rp").read(spark).count() == 3)
  }

  test("upsert sink: newest-per-key per batch, cross-batch supersede, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val wh = Files.createTempDirectory("graft-upsink").toString
    val ckpt = Files.createTempDirectory("graft-upsink-ckpt").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"up","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"v","data_type":"string"},
        |{"column_name":"seq","data_type":"long"}],"partitions":[]}""".stripMargin)

    val mem = MemoryStream[(Long, String, Long)]
    def pass(): Unit =
      StreamIngest.upsertIntoLake(mem.toDF().toDF("k", "v", "seq"),
        wh, "d", "up", keys = Seq("k"), orderBy = Seq("seq"), ckpt)
        .awaitTermination()
    def state(): Map[Long, String] =
      LakeTable.load(wh, "d", "up").read(spark).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    // within one batch, the highest-seq version of a key wins
    mem.addData((1L, "a1", 1L), (1L, "a2", 2L), (2L, "b1", 1L))
    pass()
    assert(state() == Map(1L -> "a2", 2L -> "b1"))

    // a later batch supersedes per key, leaves other keys alone
    mem.addData((2L, "b2", 9L), (3L, "c1", 1L))
    pass()
    assert(state() == Map(1L -> "a2", 2L -> "b2", 3L -> "c1"))

    // at-least-once replay of the last batch must not double-commit
    val commit1 = java.nio.file.Paths.get(ckpt, "commits", "1")
    assert(Files.exists(commit1))
    Files.delete(commit1)
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    pass()
    val t = LakeTable.load(wh, "d", "up")
    assert(state() == Map(1L -> "a2", 2L -> "b2", 3L -> "c1"))
    assert(t.metadata.snapshots.size == 2, "replay must be skipped")
  }
}
