package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Stateful
import graft.streaming.Stateful.{ClosedSession, Doc, Event}

/** flatMapGroupsWithState pins. Each feed runs a Trigger.AvailableNow
  * pass against a shared checkpoint: state carries across restarts and
  * every pass terminates deterministically (a continuously-triggered
  * stateful query never quiesces for processAllAvailable because
  * timeout processing keeps scheduling no-data batches).
  */
class StatefulSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  /** Run one AvailableNow pass of `out`, returning the rows this pass
    * emitted (foreachBatch — the memory sink can't recover from a
    * checkpoint).
    */
  private def runPass[T](out: Dataset[T], ckpt: String, name: String): Seq[Row] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[T], _: Long) =>
        buf.synchronized { buf ++= batch.toDF().collect() }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    buf.toSeq
  }

  test("flatMapGroupsWithState sessionize: gap closes sessions, timeout flushes") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("sess-ckpt").toString
    val mem = MemoryStream[Event]
    val sessions = Stateful.sessionize(
      mem.toDS().withWatermark("ts", "10 minutes").as[Event],
      gapMs = 30 * 60 * 1000L)
    val acc = Seq.newBuilder[Row]
    // user 1: events at :00, :10 (one session), then :60 (new session)
    mem.addData(Event(1L, ts(0)), Event(1L, ts(10)), Event(1L, ts(60)))
    acc ++= runPass(sessions, ckpt, "sessions_p1")
    // later events advance the watermark far enough to time out user 1
    mem.addData(Event(2L, ts(300)))
    acc ++= runPass(sessions, ckpt, "sessions_p2")
    mem.addData(Event(2L, ts(600)))
    acc ++= runPass(sessions, ckpt, "sessions_p3")
    val out = acc.result()
      .map(r => ClosedSession(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .filter(_.userId == 1L).sortBy(_.start.getTime)
    assert(out.length == 2, s"got $out")
    assert(out(0).start == ts(0) && out(0).end == ts(10) && out(0).nEvents == 2)
    assert(out(1).start == ts(60) && out(1).end == ts(60) && out(1).nEvents == 1)
  }

  test("flatMapGroupsWithState dedup: only first occurrence survives across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-ckpt").toString
    val mem = MemoryStream[Doc]
    val out = Stateful.dedupFirstSeen(
      mem.toDS().withWatermark("ts", "10 minutes").as[Doc],
      ttlMs = 60 * 60 * 1000L)
    val acc = Seq.newBuilder[Row]
    mem.addData(Doc("h1", 10L, ts(0)), Doc("h1", 11L, ts(1)), Doc("h2", 20L, ts(2)))
    acc ++= runPass(out, ckpt, "dedup_p1")
    mem.addData(Doc("h1", 12L, ts(10)), Doc("h3", 30L, ts(11))) // h1 = cross-batch dup
    acc ++= runPass(out, ckpt, "dedup_p2")
    val seen = acc.result().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seen == Map("h1" -> 10L, "h2" -> 20L, "h3" -> 30L))
  }

  test("all-late batch is a safe no-op for sessionize/dedup") {
    // Spark 4.1's flatMapGroupsWithState filters rows older than the
    // watermark before the state function runs, so an all-late batch
    // must neither crash the query (a naive setTimeoutTimestamp at/
    // below the watermark is rejected by Spark — the operators clamp to
    // watermark + 1 as defense-in-depth) nor create state/output.
    implicit val sqlCtx = spark.sqlContext

    val ckptS = java.nio.file.Files.createTempDirectory("late-sess-ckpt").toString
    val memS = MemoryStream[Event]
    val sessions = Stateful.sessionize(
      memS.toDS().withWatermark("ts", "10 minutes").as[Event],
      gapMs = 30 * 60 * 1000L)
    memS.addData(Event(1L, ts(1000)))             // watermark -> ts(990)
    runPass(sessions, ckptS, "late_sess_p1")
    memS.addData(Event(2L, ts(0)))                 // all-late batch
    runPass(sessions, ckptS, "late_sess_p2")       // must not throw
    // advance the watermark far enough to flush every live session:
    // only user 1's session exists — user 2's late row was dropped
    memS.addData(Event(3L, ts(3000)))
    runPass(sessions, ckptS, "late_sess_p3")
    val flushed = runPass(sessions, ckptS, "late_sess_p4")
      .map(r => ClosedSession(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(!flushed.exists(_.userId == 2L), s"late row must be dropped, got $flushed")

    val ckptD = java.nio.file.Files.createTempDirectory("late-dedup-ckpt").toString
    val memD = MemoryStream[Doc]
    val deduped = Stateful.dedupFirstSeen(
      memD.toDS().withWatermark("ts", "10 minutes").as[Doc],
      ttlMs = 30 * 60 * 1000L)
    memD.addData(Doc("hA", 1L, ts(1000)))
    runPass(deduped, ckptD, "late_dedup_p1")
    memD.addData(Doc("hLate", 2L, ts(0)))          // all-late batch
    val late = runPass(deduped, ckptD, "late_dedup_p2") // must not throw
    assert(late.isEmpty, s"late row must be dropped, got $late")
  }
}
