package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Differential model check for deletion vectors: the SAME seeded
  * random chain of merge-on-read ops (delete / update / merge /
  * scoped compaction / a mid-chain delete-mode switch) drives one
  * table in v2 positional-parquet mode and a twin in v3 vector mode.
  * After every step both tables must read identically (Spark-native
  * AND through the DSv2 connector), report the same metadata-only
  * count, and at the end produce the same changelog multiset — the
  * two delete representations are interchangeable by construction or
  * this fails.
  */
class DvRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-dvrand-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"grp","data_type":"string"},
        |{"column_name":"v","data_type":"double"}],"partitions":[]}"""
        .stripMargin)
    (wh, LakeTable.load(wh, "d", "t"))
  }

  private def reader(wh: String) =
    spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    d.select("id", "grp", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("positional and vector modes stay read-identical over random op chains") {
    val rnd = new scala.util.Random(77007L)
    for (iter <- 1 to 3) {
      val (whP, tP0) = mk(s"pos-$iter")
      val (whV, tV0) = mk(s"vec-$iter")
      tV0.updateProperties(Map("format-version" -> "3"))
      var tP = LakeTable.load(whP, "d", "t")
      var tV = LakeTable.load(whV, "d", "t")
      import SparkTestSession.spark.implicits._

      val n = 40 + rnd.nextInt(40)
      val data = (0 until n).map(i =>
        (i.toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(100).toDouble))
      val (b1, b2) = data.splitAt(data.size / 2)
      for (t <- Seq(tP, tV); b <- Seq(b1, b2))
        t.append(b.toDF("id", "grp", "v"))

      def sync(stage: String): Unit = {
        tP = LakeTable.load(whP, "d", "t")
        tV = LakeTable.load(whV, "d", "t")
        val nat = (rows(tP.read(spark)), rows(tV.read(spark)))
        assert(nat._1 == nat._2, s"iter $iter $stage: native reads differ")
        val conn = (rows(reader(whP)), rows(reader(whV)))
        assert(conn._1 == conn._2, s"iter $iter $stage: connector reads differ")
        assert(conn._1 == nat._1, s"iter $iter $stage: connector != native")
        assert(reader(whP).count() == reader(whV).count(),
          s"iter $iter $stage: metadata counts differ")
        // vector table must hold no positional parquet for vectored
        // files, and at most ONE live delete structure per file
        val live = LakeTable.liveDeletes(tV.metadata.snapshots)
        assert(live.values.filter(_.dv.isDefined).forall(_.paths.isEmpty),
          s"iter $iter $stage: vectored file still lists parquet deletes")
      }

      val steps = 4 + rnd.nextInt(3)
      for (step <- 1 to steps) {
        rnd.nextInt(4) match {
          case 0 =>
            val cut = rnd.nextInt(100).toDouble
            tP.deleteMoR(spark, col("v") > cut)
            tV.deleteMoR(spark, col("v") > cut)
            sync(s"step$step deleteMoR v>$cut")
          case 1 =>
            val tg = s"g${rnd.nextInt(3)}"
            tP.updateMoR(spark, Map("v" -> (col("v") + 1000.0)),
              col("grp") === tg)
            tV.updateMoR(spark, Map("v" -> (col("v") + 1000.0)),
              col("grp") === tg)
            sync(s"step$step updateMoR grp=$tg")
          case 2 =>
            val lo = rnd.nextInt(n).toLong
            val src = Seq((lo, "merged", -1.0),
              (n + step * 100L, "ins", step.toDouble))
              .toDF("id", "grp", "v")
            tP.mergeMoR(spark, src, Seq("id"))
            tV.mergeMoR(spark, src, Seq("id"))
            sync(s"step$step mergeMoR id=$lo")
          case 3 =>
            tP.compactScoped(spark)
            tV.compactScoped(spark)
            sync(s"step$step compactScoped")
        }
      }

      // changelogs over the full history agree as multisets of
      // (change type, row) — ordinals may differ when a no-op landed
      // on one side only, so compare the net effect per snapshot kind
      def logRows(t: LakeTable): Map[(String, (Long, String, Double)), Int] = {
        val hi = t.metadata.snapshots.map(_.id).max
        t.changelogBetween(spark, 1L, hi)
          .select("_change_type", "id", "grp", "v").collect()
          .map(r => (r.getString(0),
            (r.getLong(1), r.getString(2), r.getDouble(3))))
          .groupBy(identity).view.mapValues(_.length).toMap
      }
      assert(logRows(tP) == logRows(tV), s"iter $iter: changelogs differ")
    }
  }
}
