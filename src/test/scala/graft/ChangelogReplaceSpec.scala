package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Changelog over full-content replace snapshots
  * (`includeReplaceDiffs`): the row delta is COMPUTED as the multiset
  * except of the whole before state (every live delete applied)
  * against the replace's own content — kept rows cancel exactly, the
  * default stays a loud refusal, and map columns round-trip through
  * the sorted-entries normalization like the CoW diff.
  */
class ChangelogReplaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String, cols: String =
      """{"column_name":"id","data_type":"long","required":true},
        |{"column_name":"v","data_type":"string"}""".stripMargin)
      : (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-chlogrep-$tag").toString
    Engine.processTableDefJson(wh,
      s"""{"database_name":"d","table_name":"t","columns":[$cols],
         |"partitions":[]}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "t"))
  }

  test("kept rows cancel; only replaced-away/new rows surface; the " +
      "before image applies MoR deletes; default refuses by name") {
    import spark.implicits._
    val (wh, t) = mk("basic")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v"))
    // a MoR delete BEFORE the replace: row 4 must NOT appear as a
    // replace-deleted row (it was already gone)
    LakeTable.load(wh, "d", "t").deleteMoR(spark, col("id") === 4L)
    // replace: keep 1 verbatim, change 2, drop 3, add 9
    val t2 = LakeTable.load(wh, "d", "t")
    t2.overwrite(Seq((1L, "a"), (2L, "B"), (9L, "new")).toDF("id", "v"))
    val maxId = t2.metadata.snapshots.map(_.id).max
    val e = intercept[IllegalArgumentException] {
      t2.changelogBetween(spark, 0L, maxId, includeCowDiffs = true)
    }
    assert(e.getMessage.contains("includeReplaceDiffs"), e.getMessage)
    val log = t2.changelogBetween(spark, 0L, maxId,
        includeReplaceDiffs = true)
      .select("id", "v", "_change_type", "_change_ordinal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3))).toSet
    assert(log == Set(
      (1L, "a", "insert", 0), (2L, "b", "insert", 0),
      (3L, "c", "insert", 0), (4L, "d", "insert", 0),
      (4L, "d", "delete", 1),
      // the replace's computed diff: kept row 1 cancels; 4 is NOT
      // re-deleted (already gone from the before image)
      (2L, "b", "delete", 2), (3L, "c", "delete", 2),
      (2L, "B", "insert", 2), (9L, "new", "insert", 2)), s"got $log")
  }

  test("a replace as the FIRST snapshot diffs against an empty " +
      "before image — pure inserts") {
    import spark.implicits._
    val (_, t) = mk("first")
    t.overwrite(Seq((1L, "x")).toDF("id", "v"))
    val log = t.changelogBetween(spark, 0L,
        t.metadata.snapshots.map(_.id).max, includeReplaceDiffs = true)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(log == Set((1L, "x", "insert")), s"got $log")
  }

  test("map columns diff through the sorted-entries normalization") {
    import spark.implicits._
    val (wh, tm) = mk("maps",
      """{"column_name":"id","data_type":"long","required":true},
        |{"column_name":"m","data_type":"map","map_def":{
        |  "key":{"column_name":"k","data_type":"string","required":true},
        |  "value":{"column_name":"val","data_type":"string"}}},
        |{"column_name":"v","data_type":"string"}""".stripMargin)
    tm.append(Seq(
      (1L, Map("a" -> "1", "b" -> "2"), "keep"),
      (2L, Map("x" -> "y", "z" -> "w"), "gone")).toDF("id", "m", "v"))
    val t2 = LakeTable.load(wh, "d", "t")
    t2.overwrite(Seq(
      (1L, Map("b" -> "2", "a" -> "1"), "keep"), // entry order differs
      (3L, Map("q" -> "r"), "new")).toDF("id", "m", "v"))
    val log = t2.changelogBetween(spark, 0L,
        t2.metadata.snapshots.map(_.id).max, includeReplaceDiffs = true)
      .filter(col("_change_ordinal") === 1)
      .select("id", "m", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getMap[String, String](1).toString,
        r.getString(2), r.getString(3))).toSet
    // row 1 must CANCEL despite the physical entry-order difference
    assert(log == Set(
      (2L, "Map(x -> y, z -> w)", "gone", "delete"),
      (3L, "Map(q -> r)", "new", "insert")), s"got $log")
  }
}
