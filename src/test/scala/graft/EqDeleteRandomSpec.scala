package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Randomized model check for equality-delete semantics: a seeded
  * random interleaving of fresh-key appends, blind upserts, key
  * deletes, and compactions must always read back exactly the
  * in-memory Map the same ops produce (last write wins per key).
  * Compaction at a random point pins that materialization preserves
  * state; a final catalog SQL read pins the DSv2 reader path against
  * the same model.
  */
class EqDeleteRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def runScenario(seed: Long, ops: Int,
      allowCompact: Boolean = true): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val wh = Files.createTempDirectory(s"graft-eqrnd-$seed").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    var t = LakeTable.load(wh, "d", "t")
    val model = scala.collection.mutable.Map.empty[Long, String]
    var nextFresh = 1000L
    // (snapshotId, model state then) pairs for time-travel replay —
    // only before the first compaction (a rewrite squashes history)
    val pins = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, String])]
    var compacted = false

    def randomKeys(n: Int): Seq[Long] =
      if (model.isEmpty) Seq.empty
      else Seq.fill(n)(model.keySet.toSeq(rnd.nextInt(model.size))).distinct

    (1 to ops).foreach { i =>
      rnd.nextInt(10) match {
        case 0 | 1 => // append fresh keys (no duplicates vs model)
          val rows = (1 to 1 + rnd.nextInt(3)).map { _ =>
            nextFresh += 1
            (nextFresh, s"a$i-$nextFresh")
          }
          t.append(rows.toDF("id", "v"))
          rows.foreach { case (k, v) => model(k) = v }
        case 2 | 3 | 4 | 5 => // blind upsert: mix of existing + fresh
          val existing = randomKeys(1 + rnd.nextInt(2))
          val fresh = (1 to rnd.nextInt(2)).map { _ =>
            nextFresh += 1; nextFresh
          }
          val keys = (existing ++ fresh).distinct
          if (keys.nonEmpty) {
            val rows = keys.map(k => (k, s"u$i-$k"))
            t.upsertMoR(spark, rows.toDF("id", "v"), Seq("id"))
            rows.foreach { case (k, v) => model(k) = v }
          }
        case 6 | 7 => // eq-delete some existing keys (+ a miss is fine)
          val keys = randomKeys(1 + rnd.nextInt(3)) :+ (999999L + i)
          t.deleteByKeysMoR(spark, keys.toDF("id"))
          keys.foreach(model.remove)
        case 8 if allowCompact && rnd.nextBoolean() =>
          // full materialize: state identical after; squashes history
          t.compact(spark)
          t = LakeTable.load(wh, "d", "t")
          compacted = true
        case 8 if allowCompact =>
          // SCOPED compaction (rewrite-data): materializes live deletes
          // without resetting the replay — state identical after, and
          // unlike full compact the pre-compaction pins stay
          // time-travelable (old files remain listed by history)
          t.compactScoped(spark)
          t = LakeTable.load(wh, "d", "t")
        case 8 => () // compaction disabled: keep history for time travel
        case 9 if allowCompact && rnd.nextBoolean() =>
          // full-content replace (INSERT OVERWRITE): resets the
          // replay, retires every live batch, clears the model —
          // history pins before it stay time-travelable
          val rows = (1 to 2).map { _ =>
            nextFresh += 1; (nextFresh, s"o$i-$nextFresh")
          }
          t.overwrite(rows.toDF("id", "v"))
          model.clear()
          rows.foreach { case (k, v) => model(k) = v }
        case 9 => // reload (metadata JSON round-trip under load)
          t = LakeTable.load(wh, "d", "t")
      }
      if (!compacted && rnd.nextInt(4) == 0 &&
          t.metadata.snapshots.nonEmpty)
        pins += ((t.metadata.snapshots.map(_.id).max, model.toMap))
      if (i % 7 == 0) {
        val got = t.read(spark).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == model.toMap, s"divergence at op $i (seed $seed)")
      }
    }
    val fin = t.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin == model.toMap, s"final divergence (seed $seed)")
    // time travel must reproduce each pinned historical state —
    // equality batches past the pin must NOT leak backwards (only pins
    // from before any compaction squashed the history)
    if (!compacted) pins.foreach { case (snapId, expect) =>
      val got = t.read(spark, asOfSnapshot = Some(snapId)).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expect, s"time-travel divergence at $snapId (seed $seed)")
    }
    // the DSv2 reader path must agree with the native read
    spark.conf.set(s"spark.sql.catalog.geqr$seed", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.geqr$seed.warehouse", wh)
    val sql = spark.sql(s"SELECT id, v FROM geqr$seed.d.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sql == model.toMap, s"DSv2 divergence (seed $seed)")
  }

  test("random append/upsert/delete/compact interleavings match the model") {
    runScenario(seed = 42L, ops = 30)
  }

  test("changelog replay of a random MoR history reconstructs the state, " +
      "through a scoped compaction") {
    import spark.implicits._
    val rnd = new scala.util.Random(2024L)
    val wh = Files.createTempDirectory("graft-chlogrnd").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "t")
    val model = scala.collection.mutable.Map.empty[Long, String]
    var nextFresh = 0L
    (1 to 25).foreach { i =>
      rnd.nextInt(8) match {
        case 0 | 1 =>
          nextFresh += 1
          t.append(Seq((nextFresh, s"a$i")).toDF("id", "v"))
          model(nextFresh) = s"a$i"
        case 2 | 3 | 4 =>
          val keys = (if (model.nonEmpty)
            Seq(model.keySet.toSeq(rnd.nextInt(model.size))) else Seq.empty) ++
            { nextFresh += 1; Seq(nextFresh) }
          val rows = keys.distinct.map(k => (k, s"u$i-$k"))
          t.upsertMoR(spark, rows.toDF("id", "v"), Seq("id"))
          rows.foreach { case (k, v) => model(k) = v }
        case 5 | 6 if model.nonEmpty =>
          val k = model.keySet.toSeq(rnd.nextInt(model.size))
          t.deleteByKeysMoR(spark, Seq(k).toDF("id"))
          model.remove(k)
        case _ =>
          // scoped compaction mid-history: a byte move the changelog
          // must SKIP without consuming an ordinal or losing changes
          t.compactScoped(spark)
      }
    }
    val maxId = t.metadata.snapshots.map(_.id).max
    // raw changelog replay: per ordinal, deletes before inserts
    val log = t.changelogBetween(spark, 0L, maxId)
      .select("_change_ordinal", "_change_type", "id", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)).orNull))
    val replay = scala.collection.mutable.Map.empty[Long, String]
    log.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      rows.filter(_._2 == "delete").foreach(r => replay.remove(r._3))
      rows.filter(_._2 == "insert").foreach(r => replay(r._3) = r._4)
    }
    assert(replay == model, "raw changelog replay diverged")
    // net-changes replay: per identity, before-images out, afters in
    val net = t.changelogNet(spark, 0L, maxId, Seq("id"))
      .select("_change_type", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)).orNull))
    val netReplay = scala.collection.mutable.Map.empty[Long, String]
    net.filter(r => r._1 == "delete" || r._1 == "update_before")
      .foreach(r => netReplay.remove(r._2))
    net.filter(r => r._1 == "insert" || r._1 == "update_after")
      .foreach(r => netReplay(r._2) = r._3)
    assert(netReplay == model, "net changelog replay diverged")
  }

  test("a second seed exercises a different interleaving") {
    runScenario(seed = 1337L, ops = 30)
  }

  test("compaction-free run pins time travel against historical states") {
    runScenario(seed = 7L, ops = 25, allowCompact = false)
  }
}
