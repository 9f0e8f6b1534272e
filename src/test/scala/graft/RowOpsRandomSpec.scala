package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Seeded randomized oracle for the copy-on-write ops: each iteration
  * builds a random table, then chains DELETE → UPDATE → MERGE with
  * random parameters, checking the lake state against an in-memory
  * model after every step (including a reload from disk at the end).
  */
class RowOpsRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private case class R(id: Long, grp: String, v: Double)

  test("delete/update/merge chain matches an in-memory model (seeded)") {
    val rnd = new scala.util.Random(424242L)
    for (iter <- 1 to 3) {
      val wh = Files.createTempDirectory(s"graft-rand-$iter").toString
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"t","columns":[
          |{"column_name":"id","data_type":"long"},
          |{"column_name":"grp","data_type":"string"},
          |{"column_name":"v","data_type":"double"}],
          |"partitions":[{"column":"grp","name":"g"}]}""".stripMargin)
      val t = LakeTable.load(wh, "d", "t")
      import SparkTestSession.spark.implicits._

      // random rows with unique ids across 3 groups, two appends
      val n = 30 + rnd.nextInt(40)
      var model = (0 until n).map(i =>
        R(i.toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(100).toDouble)).toVector
      val (batch1, batch2) = model.splitAt(model.size / 2)
      t.append(batch1.map(r => (r.id, r.grp, r.v)).toDF("id", "grp", "v"))
      t.append(batch2.map(r => (r.id, r.grp, r.v)).toDF("id", "grp", "v"))

      def check(stage: String): Unit = {
        val got = t.read(spark).collect()
          .map(r => R(r.getLong(0), r.getString(1), r.getDouble(2))).toSet
        assert(got == model.toSet, s"iter $iter after $stage")
      }

      // DELETE v > cut
      val cut = rnd.nextInt(100).toDouble
      t.delete(spark, col("v") > cut)
      model = model.filterNot(_.v > cut)
      check(s"delete v>$cut")

      // UPDATE grp==target SET v = v + 1000, grp = grp || "_u"
      val tg = s"g${rnd.nextInt(3)}"
      t.update(spark,
        Map("v" -> (col("v") + 1000.0),
          "grp" -> concat(col("grp"), lit("_u"))),
        col("grp") === tg)
      model = model.map(r =>
        if (r.grp == tg) r.copy(v = r.v + 1000.0, grp = r.grp + "_u") else r)
      check(s"update grp=$tg")

      // MERGE: update half the surviving ids, insert some new ones
      val updIds = model.map(_.id).filter(_ % 2 == 0).toSet
      val maxId = (model.map(_.id) :+ 0L).max
      val ins = (1 to 5).map(i => R(maxId + i, "new", i.toDouble))
      val src = (model.filter(r => updIds(r.id))
        .map(r => R(r.id, "merged", r.v + 1)) ++ ins)
      t.merge(spark, src.map(r => (r.id, r.grp, r.v)).toDF("id", "grp", "v"),
        Seq("id"))
      model = model.map(r =>
        if (updIds(r.id)) r.copy(grp = "merged", v = r.v + 1) else r) ++ ins
      check("merge")

      // reload from disk: the snapshot log replays to the same state
      val reloaded = LakeTable.load(wh, "d", "t")
      val got = reloaded.read(spark).collect()
        .map(r => R(r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == model.toSet, s"iter $iter after reload")
    }
  }
}
