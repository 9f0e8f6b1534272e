package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Randomized model check for row lineage: a seeded chain of append /
  * CoW update / CoW delete / merge / MoR delete / MoR update / MoR
  * merge / compaction ops runs
  * against a v3 table while an in-memory model tracks, per business
  * key, the row's expected identity behavior — an id is CAPTURED the
  * first time the row is observed and must never change for the rest
  * of its life, survivors keep theirs through every rewrite, and
  * re-inserts of a deleted key must come back with a FRESH id. Ids
  * must stay globally unique throughout.
  */
class LineageRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("row ids stay stable, unique, and fresh-on-rebirth over random op chains") {
    val rnd = new scala.util.Random(90210L)
    for (iter <- 1 to 3) {
      val wh = Files.createTempDirectory(s"graft-linrand-$iter").toString
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"t","columns":[
          |{"column_name":"id","data_type":"long"},
          |{"column_name":"v","data_type":"double"}],"partitions":[]}"""
          .stripMargin)
      var t = LakeTable.load(wh, "d", "t")
      t.updateProperties(Map("format-version" -> "3"))
      import SparkTestSession.spark.implicits._

      val n = 20 + rnd.nextInt(20)
      t = LakeTable.load(wh, "d", "t")
      t.append((0 until n).map(i =>
        (i.toLong, rnd.nextInt(100).toDouble)).toDF("id", "v"))

      // key -> captured row id; everSeen: ids ever used (uniqueness)
      var captured = Map.empty[Long, Long]
      val retired = scala.collection.mutable.Set.empty[Long]

      def sync(stage: String): Unit = {
        t = LakeTable.load(wh, "d", "t")
        val rows = t.readLineage(spark)
          .select(col("id"), col("_row_id")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        // global uniqueness: the read itself dedupes by key, but two
        // keys must never share an id either
        assert(rows.values.toSeq.distinct.size == rows.size,
          s"iter $iter $stage: duplicate row ids")
        rows.foreach { case (k, rid) =>
          captured.get(k) match {
            case Some(prev) => assert(prev == rid,
              s"iter $iter $stage: key $k changed id $prev -> $rid")
            case None =>
              assert(!retired.contains(rid),
                s"iter $iter $stage: key $k REUSED retired id $rid")
              captured += k -> rid
          }
        }
        // keys gone from the table retire their ids: a later re-insert
        // must not resurrect them
        captured.keys.filterNot(rows.contains).toSeq.foreach { k =>
          retired += captured(k)
          captured -= k
        }
      }
      sync("seed")

      for (step <- 1 to 5 + rnd.nextInt(3)) {
        rnd.nextInt(8) match {
          case 0 =>
            val base = 1000L * step
            t.append(Seq((base, -1.0), (base + 1, -2.0)).toDF("id", "v"))
            sync(s"step$step append")
          case 1 =>
            val cut = rnd.nextInt(100).toDouble
            t.update(spark, Map("v" -> (col("v") + 0.5)), col("v") < cut)
            sync(s"step$step updateCoW v<$cut")
          case 2 =>
            val cut = rnd.nextInt(100).toDouble
            t.delete(spark, col("v") > cut)
            sync(s"step$step deleteCoW v>$cut")
          case 3 =>
            val victim = rnd.nextInt(n).toLong
            // delete a key then merge it back: the intermediate sync
            // retires the dead id, so the rebirth must come back FRESH
            t.delete(spark, col("id") === victim)
            sync(s"step$step kill id=$victim")
            t.merge(spark, Seq((victim, 42.0)).toDF("id", "v"), Seq("id"))
            sync(s"step$step rebirth id=$victim")
          case 4 =>
            val cut = rnd.nextInt(50).toDouble
            t.deleteMoR(spark, col("v") < cut && col("v") >= 0.0)
            sync(s"step$step deleteMoR")
          case 5 =>
            if (rnd.nextBoolean()) t.compact(spark)
            else t.compactScoped(spark)
            sync(s"step$step compact")
          case 6 =>
            // MoR update: the delete+insert copy must carry the id
            val cut = rnd.nextInt(100).toDouble
            t.updateMoR(spark, Map("v" -> (col("v") + 0.25)), col("v") < cut)
            sync(s"step$step updateMoR v<$cut")
          case 7 =>
            // MoR merge: matched keys keep ids, the unmatched insert
            // is fresh
            val victim = rnd.nextInt(n).toLong
            t.mergeMoR(spark,
              Seq((victim, 7.0), (5000L + step, 8.0)).toDF("id", "v"),
              Seq("id"))
            sync(s"step$step mergeMoR id=$victim")
        }
      }
    }
  }
}
