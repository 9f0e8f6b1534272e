package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming behavior pins (SURVEY.md §5.2.5): the declared
  * window queries produce the same results under readStream as their
  * batch equivalents, and watermarking drops late rows in append mode.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")

  private val rows = Seq(
    (1L, ts(0), "click", 1.0), (1L, ts(10), "click", 2.0),
    (1L, ts(65), "view", 3.0), (2L, ts(5), "click", 4.0),
    (2L, ts(130), "view", 5.0), (2L, ts(135), "click", 6.0))

  test("tumbling window: streaming result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("user_id", "ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val q = streamDf.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling_out")
      .select($"window.start", $"event_type", $"n", $"v")
      .collect().map(_.toSeq).toSet
    val batch = rows.toDF("user_id", "ts", "event_type", "value")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"window.start", $"event_type", $"n", $"v")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("session window: streaming (complete mode) equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val agg = mem.toDF().toDF("user_id", "ts", "event_type", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("session_out").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("session_out")
      .select($"user_id", $"session_window.start", $"n")
      .collect().map(_.toSeq).toSet
    val batch = rows.toDF("user_id", "ts", "event_type", "value")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session_window.start", $"n")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // gap semantics: user 1 events at :00/:10 coalesce, :65 opens a new
    // session; user 2 gets :05 alone and :130/:135 together => 4 sessions
    assert(streamed.size == 4)
  }

  test("watermark drops late rows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val agg = mem.toDF().toDF("user_id", "ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    // batch 1: events up to min 120 -> watermark advances to 110
    mem.addData((1L, ts(0), "click", 1.0), (1L, ts(20), "click", 1.0),
      (1L, ts(120), "click", 1.0))
    q.processAllAvailable()
    // batch 2: a late row at min 5 — behind the watermark, must be dropped
    mem.addData((1L, ts(5), "late", 9.0))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to close every window
    mem.addData((1L, ts(300), "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("late_out")
      .select($"window.start", $"n").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // window [00:00,00:30) must count 2 (not 3): the late row was dropped
    assert(out(ts(0)) == 2L, s"late row leaked into $out")
  }
}
