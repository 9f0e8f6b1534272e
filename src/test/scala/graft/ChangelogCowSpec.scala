package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Changelog over copy-on-write commits (`includeCowDiffs`): the row
  * delta is COMPUTED from the files the overwrite replaced vs what it
  * wrote — kept rows must cancel exactly, only genuinely
  * deleted/updated rows may surface, and the default stays a loud
  * refusal.
  */
class ChangelogCowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String, cols: String =
      """{"column_name":"id","data_type":"long","required":true},
        |{"column_name":"v","data_type":"string"}""".stripMargin)
      : (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-chlogcow-$tag").toString
    Engine.processTableDefJson(wh,
      s"""{"database_name":"d","table_name":"t","columns":[$cols],
         |"partitions":[]}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "t"))
  }

  test("kept rows cancel; only CoW-changed rows surface, correctly typed") {
    import spark.implicits._
    val (_, t) = mk("diff")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    // CoW update touches ONE row of the rewritten file
    t.update(spark, Map("v" -> lit("b2")), col("id") === 2L)
    // CoW delete removes another
    t.delete(spark, col("id") === 3L)
    val maxId = t.metadata.snapshots.map(_.id).max
    val log = t.changelogBetween(spark, 0L, maxId, includeCowDiffs = true)
      .select("id", "v", "_change_type", "_change_ordinal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
    // ordinal 0: the append's 3 inserts. ordinal 1: the update's
    // delete(2,b)+insert(2,b2) ONLY — rows 1 and 3 were rewritten
    // byte-identical and must cancel. ordinal 2: the delete's (3,c).
    assert(log == Set(
      (1L, "a", "insert", 0), (2L, "b", "insert", 0), (3L, "c", "insert", 0),
      (2L, "b", "delete", 1), (2L, "b2", "insert", 1),
      (3L, "c", "delete", 2)), s"got $log")
    // the updates view pairs ordinal 1's delete+insert by identity
    val ups = t.changelogWithUpdates(
      t.changelogBetween(spark, 0L, maxId, includeCowDiffs = true),
      Seq("id"))
      .filter(col("_change_ordinal") === 1)
      .select("id", "_change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(ups == Set(2L -> "update_before", 2L -> "update_after"))
  }

  test("defaults refuse CoW by name") {
    import spark.implicits._
    val (_, t) = mk("refuse")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.delete(spark, col("id") === 1L)
    val e = intercept[IllegalArgumentException] {
      t.changelogBetween(spark, 0L, t.metadata.snapshots.map(_.id).max)
    }
    assert(e.getMessage.contains("includeCowDiffs"))
  }

  test("map columns diff through the sorted-entries normalization") {
    import spark.implicits._
    val (_, tm) = mk("maps",
      """{"column_name":"id","data_type":"long","required":true},
        |{"column_name":"m","data_type":"map","map_def":{
        |  "key":{"column_name":"k","data_type":"string","required":true},
        |  "value":{"column_name":"val","data_type":"string"}}},
        |{"column_name":"v","data_type":"string"}""".stripMargin)
    // two entries so physical entry order can differ between the
    // before and after files — equality must be order-insensitive
    tm.append(Seq(
      (1L, Map("a" -> "1", "b" -> "2"), "keep"),
      (2L, Map("x" -> "y", "z" -> "w"), "touch"),
      (3L, Map.empty[String, String], "gone")).toDF("id", "m", "v"))
    tm.update(spark, Map("v" -> lit("touched")), col("id") === 2L)
    var t2 = LakeTable.load(tm.location.getParent.getParent.toString,
      "d", "t")
    t2.delete(spark, col("id") === 3L)
    t2 = LakeTable.load(tm.location.getParent.getParent.toString, "d", "t")
    val maxId = t2.metadata.snapshots.map(_.id).max
    val log = t2.changelogBetween(spark, 0L, maxId, includeCowDiffs = true)
      .select("id", "m", "v", "_change_type", "_change_ordinal").collect()
      .map(r => (r.getLong(0), r.getMap[String, String](1).toString,
        r.getString(2), r.getString(3), r.getInt(4))).toSet
    // row 1 rewrote byte-identical and must cancel; rows 2 and 3
    // surface with their MAP VALUES intact (round-tripped through the
    // normalization)
    assert(log == Set(
      (1L, "Map(a -> 1, b -> 2)", "keep", "insert", 0),
      (2L, "Map(x -> y, z -> w)", "touch", "insert", 0),
      (3L, "Map()", "gone", "insert", 0),
      (2L, "Map(x -> y, z -> w)", "touch", "delete", 1),
      (2L, "Map(x -> y, z -> w)", "touched", "insert", 1),
      (3L, "Map()", "gone", "delete", 2)), s"got $log")
  }

  test("a CoW diff after a positional MoR delete sees the pre-overwrite " +
      "visible rows, not the raw file") {
    import spark.implicits._
    val (_, t) = mk("posthenrow")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    // positional delete first (MoR), THEN a CoW update rewrites the file
    t.deleteMoR(spark, col("id") === 1L)
    t.update(spark, Map("v" -> lit("b2")), col("id") === 2L)
    val maxId = t.metadata.snapshots.map(_.id).max
    val cowOrd = t.changelogBetween(spark, 0L, maxId,
        includeCowDiffs = true)
      .filter(col("_change_ordinal") === 2)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // row 1 was ALREADY dead before the overwrite — it must not appear
    // as a delete of the CoW ordinal (its retraction was ordinal 1)
    assert(cowOrd == Set((2L, "b", "delete"), (2L, "b2", "insert")),
      s"got $cowOrd")
  }

  test("random histories mixing MoR and CoW ops replay to the model") {
    import spark.implicits._
    for (seed <- Seq(7L, 9001L)) {
      val rnd = new scala.util.Random(seed)
      val (_, t) = mk(s"rnd$seed")
      val model = scala.collection.mutable.Map.empty[Long, String]
      var nextFresh = 0L
      def existing(): Option[Long] =
        if (model.isEmpty) None
        else Some(model.keySet.toSeq(rnd.nextInt(model.size)))
      // copy-on-write verbs refuse while equality-delete batches are
      // live (the documented UX: compact first) — model that exactly
      def settleForCoW(): Unit =
        if (LakeTable.liveEqDeletes(t.metadata.snapshots).nonEmpty)
          t.compact(spark)
      (1 to 24).foreach { i =>
        rnd.nextInt(9) match {
          case 0 | 1 =>
            val rows = (0 to rnd.nextInt(2)).map { _ =>
              nextFresh += 1; (nextFresh, s"a$i-$nextFresh")
            }
            t.append(rows.toDF("id", "v"))
            rows.foreach { case (k, v) => model(k) = v }
          case 2 | 3 =>
            val keys = existing().toSeq ++
              { nextFresh += 1; Seq(nextFresh) }
            val rows = keys.distinct.map(k => (k, s"u$i-$k"))
            t.upsertMoR(spark, rows.toDF("id", "v"), Seq("id"))
            rows.foreach { case (k, v) => model(k) = v }
          case 4 if model.nonEmpty =>
            val k = existing().get
            t.deleteByKeysMoR(spark, Seq(k).toDF("id"))
            model.remove(k)
          case 5 | 6 if model.nonEmpty =>
            val k = existing().get
            settleForCoW()
            t.delete(spark, col("id") === k)
            model.remove(k)
          case 7 if model.nonEmpty =>
            val k = existing().get
            settleForCoW()
            t.update(spark,
              Map("v" -> concat(col("v"), lit("*"))), col("id") === k)
            model(k) = model(k) + "*"
          case _ =>
            t.compactScoped(spark)
        }
      }
      val maxId = t.metadata.snapshots.map(_.id).max
      // anti-vacuity: the random walk must actually have produced CoW
      // overwrites AND equality-delete commits, or the replay checks
      // prove nothing about their interaction
      val ops = t.metadata.snapshots.map(_.operation)
      assert(ops.contains("overwrite"), s"no CoW commit in seed $seed walk")
      assert(t.metadata.snapshots.exists(_.eqDeletes.nonEmpty),
        s"no equality-delete commit in seed $seed walk")
      val log = t.changelogBetween(spark, 0L, maxId, includeCowDiffs = true)
        .localCheckpoint()
      // raw replay: per ordinal, deletes (full-row CoW markers AND
      // key-only eq markers alike — both carry id) before inserts
      val raw = log
        .select("_change_ordinal", "_change_type", "id", "v").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
          Option(r.getString(3)).orNull))
      val replay = scala.collection.mutable.Map.empty[Long, String]
      raw.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
        rows.filter(_._2 == "delete").foreach(r => replay.remove(r._3))
        rows.filter(_._2 == "insert").foreach(r => replay(r._3) = r._4)
      }
      assert(replay == model, s"raw CoW changelog replay diverged (seed $seed)")
      // net mode composes over the same precomputed log
      val net = t.changelogNet(log, Seq("id"))
        .select("_change_type", "id", "v").collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.getString(2)).orNull))
      val netReplay = scala.collection.mutable.Map.empty[Long, String]
      net.filter(r => r._1 == "delete" || r._1 == "update_before")
        .foreach(r => netReplay.remove(r._2))
      net.filter(r => r._1 == "insert" || r._1 == "update_after")
        .foreach(r => netReplay(r._2) = r._3)
      assert(netReplay == model, s"net CoW changelog replay diverged (seed $seed)")
    }
  }
}
