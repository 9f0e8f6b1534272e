package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = Multimodal.asMediaTable(
    Seq((1L, "hello world"), (2L, "abc"), (3L, "a longer payload body right here"))
      .toDF("id", "txt"), "id", "txt")

  test("media table carries payload bytes + typed metadata") {
    val r = media.select($"media_id", length($"payload").as("n"),
      $"meta.n_bytes", $"meta.format", $"meta.width").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) == 11 && r(1L).getLong(2) == 11L)
    assert(r(2L).getString(3) == "fake/rgb8")
    assert(r.values.forall(x => x.getInt(4) >= 32))
  }

  test("decodeFeatures: deterministic fixed-width features per payload") {
    val f1 = Multimodal.decodeFeatures(media, dim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.decodeFeatures(media, dim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.size == 4))
    // "hello world": bytes are known; feature 0 buckets bytes 0,4,8
    val expected0 = (("h".codePointAt(0) & 0xFF) + ("o".codePointAt(0) & 0xFF) +
      ("r".codePointAt(0) & 0xFF)) / 255.0f
    assert(math.abs(f1(1L).head - expected0) < 1e-5)
  }

  test("resizeStub rewrites metadata, preserves payload") {
    val r = Multimodal.resizeStub(media, 224, 224)
      .select($"media_id", $"meta.width", $"meta.height", length($"payload"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) == 224 && r(1L).getInt(2) == 224)
    assert(r(1L).getInt(3) == 11)
  }

  test("frameSample slices payload into frames") {
    val frames = Multimodal.frameSample(media, frameBytes = 4, everyK = 1)
      .filter($"media_id" === 3L).orderBy($"frame_no").collect()
    assert(frames.nonEmpty)
    val first = frames.head.getAs[Array[Byte]]("frame")
    assert(new String(first, "UTF-8") == "a lo")
  }
}
