package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Seeded differential for the r12 publication fast paths: the SAME
  * random op sequence runs into two tables — one with the driver-side
  * LocalRelation write + inline eq-keys enabled (default), one forced
  * onto the distributed job path (`graft.write.nolocal`) — and the
  * visible state, the changelog, and the applied-delete semantics must
  * be identical at every checkpoint. Catches any divergence between
  * the driver-written parquet/inline-key decode and what a Spark job
  * would have produced (value encoding, null handling, dedupe,
  * sequencing).
  */
class LocalWriteRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft-lwrand-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"f","data_type":"float"},
        |{"column_name":"dec","data_type":"decimal(10,2)"},
        |{"column_name":"s","data_type":"string"}],
        |"partitions":[]}""".stripMargin)
    wh
  }

  private def read(wh: String): Set[(Long, Option[Float],
      Option[String], Option[String])] =
    LakeTable.load(wh, "d", "t").read(spark).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getFloat(1)),
        Option(r.getDecimal(2)).map(_.toPlainString),
        Option(r.getString(3)))
    }.toSet

  test("random append/upsert/keyed-delete soups: local fast path == " +
      "forced distributed path, state and changelog alike") {
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    def randRows(n: Int): Seq[(Long, java.lang.Float, String, String)] =
      (0 until n).map { _ =>
        (rnd.nextInt(12).toLong,
          if (rnd.nextInt(4) == 0) null
          else java.lang.Float.valueOf(
            (rnd.nextInt(100) / 10.0 + 0.3).toFloat),
          if (rnd.nextInt(5) == 0) null else s"${rnd.nextInt(500)}.25",
          if (rnd.nextInt(6) == 0) null else s"s${rnd.nextInt(30)}")
      }
    def df(rows: Seq[(Long, java.lang.Float, String, String)]): DataFrame =
      rows.toDF("k", "f", "dec", "s")
        .select(col("k"), col("f"),
          col("dec").cast("decimal(10,2)").as("dec"), col("s"))

    val whA = mk("fast")
    val whB = mk("slow")
    def withNoLocal[T](body: => T): T = {
      sys.props("graft.write.nolocal") = "1"
      try body finally sys.props.remove("graft.write.nolocal")
    }
    def both(op: String => Unit): Unit = {
      op(whA)
      withNoLocal(op(whB))
    }
    for (step <- 0 until 18) {
      rnd.nextInt(3) match {
        case 0 =>
          val rows = randRows(1 + rnd.nextInt(8))
          both(wh => LakeTable.load(wh, "d", "t").append(df(rows)))
        case 1 =>
          val rows = randRows(1 + rnd.nextInt(6))
          // dedupe keys driver-side: upsert sources must carry one row
          // per key (both paths would diverge arbitrarily otherwise)
          val uniq = rows.groupBy(_._1).map(_._2.head).toSeq
          both(wh => LakeTable.load(wh, "d", "t")
            .upsertMoR(spark, df(uniq), keys = Seq("k")))
        case 2 =>
          val ks = (0 until 1 + rnd.nextInt(3))
            .map(_ => rnd.nextInt(12).toLong)
          both(wh => LakeTable.load(wh, "d", "t")
            .deleteByKeysMoR(spark, ks.toDF("k")))
      }
      assert(read(whA) == read(whB), s"state diverged at step $step")
    }
    // the fast-path table really used inline batches somewhere
    val inlined = LakeTable.load(whA, "d", "t").metadata.snapshots
      .flatMap(_.eqDeletes).count(_.inlineKeys.isDefined)
    val slowInlined = LakeTable.load(whB, "d", "t").metadata.snapshots
      .flatMap(_.eqDeletes).count(_.inlineKeys.isDefined)
    assert(inlined > 0, "the fast path must have inlined key batches")
    assert(slowInlined == 0, "the forced path must not inline")
    // changelogs agree row-for-row (same ordinals, types, values)
    def log(wh: String): Seq[(Long, String, Int)] = {
      val t = LakeTable.load(wh, "d", "t")
      t.changelogBetween(spark, 0L, t.metadata.snapshots.map(_.id).max)
        .select("k", "_change_type", "_change_ordinal").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
        .sorted
    }
    assert(log(whA) == log(whB), "changelogs diverged")
    // compaction materializes identically on both
    both(wh => { LakeTable.load(wh, "d", "t").compact(spark); () })
    assert(read(whA) == read(whB), "post-compaction state diverged")
  }
}
