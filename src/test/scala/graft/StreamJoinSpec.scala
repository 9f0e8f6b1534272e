package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin
import graft.streaming.StreamJoin.{Click, Impression}

/** Stream-stream interval join: in-window clicks match, out-of-window
  * clicks don't, and the left-outer variant emits unmatched impressions
  * only after the watermark passes the attribution window.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private def runPass(out: org.apache.spark.sql.DataFrame,
      ckpt: String): Seq[Row] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        buf.synchronized { buf ++= batch.collect() }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    buf.toSeq
  }

  test("inner interval join matches only in-window clicks") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ssj-ckpt").toString
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoin.attribute(imps.toDS(), clicks.toDS(),
      windowMinutes = 30, delayThreshold = "10 minutes")

    imps.addData(Impression(1L, ts(0)), Impression(2L, ts(5)))
    clicks.addData(
      Click(100L, 1L, ts(10)),  // in window for imp 1
      Click(101L, 2L, ts(50)),  // outside 30-min window of imp 2
      Click(102L, 9L, ts(12)))  // no such impression
    val out1 = runPass(joined, ckpt)
    assert(out1.map(r => (r.getLong(0), r.getLong(2))).toSet == Set((1L, 100L)))

    // a late-but-in-window click still joins while state is retained
    clicks.addData(Click(103L, 2L, ts(20)))
    val out2 = runPass(joined, ckpt)
    assert(out2.map(r => (r.getLong(0), r.getLong(2))).toSet == Set((2L, 103L)))
  }

  test("left-outer emits unmatched impressions after watermark closes window") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ssj-lo-ckpt").toString
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoin.attribute(imps.toDS(), clicks.toDS(),
      windowMinutes = 30, delayThreshold = "10 minutes",
      joinType = "left_outer")

    imps.addData(Impression(1L, ts(0)), Impression(2L, ts(5)))
    clicks.addData(Click(100L, 1L, ts(10)))
    val out1 = runPass(joined, ckpt)
    assert(out1.map(r => (r.getLong(0), r.getLong(2))).toSet == Set((1L, 100L)))

    // advance both watermarks far past imp 2's window: the unmatched
    // impression must surface with a null click
    imps.addData(Impression(99L, ts(500)))
    clicks.addData(Click(999L, 99L, ts(501)))
    val out2 = runPass(joined, ckpt) ++ runPass(joined, ckpt)
    val unmatched = out2.filter(r => r.getLong(0) == 2L)
    assert(unmatched.nonEmpty && unmatched.forall(_.isNullAt(2)))
  }
}
