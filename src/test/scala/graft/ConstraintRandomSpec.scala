package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Seeded differential for CHECK-constraint enforcement: random
  * batches against random comparison constraints, mirrored by a
  * driver-side predicate oracle — a batch must land iff NO row
  * violates (NULL passes), a refused batch must land nothing, and the
  * table must equal the accepted-row ledger at every step regardless
  * of which files the stats proof skipped.
  */
class ConstraintRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("op soup: accept/refuse always matches the predicate oracle; " +
      "refusals land nothing") {
    val wh = Files.createTempDirectory("graft-cons-rand").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"v","data_type":"long"},
        |{"column_name":"tag","data_type":"string"}],
        |"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    val rnd = new scala.util.Random(31L)
    // the live constraint set, mirrored driver-side as predicates
    // (NULL passes a CHECK — Option.forall encodes exactly that)
    var preds = Map.empty[String, (Option[Long], Option[Long],
      Option[String]) => Boolean]
    var consN = 0
    var ledger = Vector.empty[(Long, Option[Long], Option[String])]
    def addCons(): Unit = {
      consN += 1
      // bounds derive from the LEDGER so the ADD can attach (clean
      // history) while future poison rows still violate; the
      // tag-not-null case attaches only while no null tag landed —
      // both ADD outcomes are checked against the oracle either way
      val vFloor = math.min(0L,
        ledger.flatMap(_._2).minOption.getOrElse(0L))
      val kCeil = math.max(1000L,
        ledger.map(_._1).maxOption.getOrElse(0L) + 1L)
      val (name, sql, p) = rnd.nextInt(3) match {
        case 0 => (s"c$consN", s"v >= $vFloor",
          (k: Option[Long], v: Option[Long], t: Option[String]) =>
            v.forall(_ >= vFloor))
        case 1 => (s"c$consN", s"k < $kCeil",
          (k: Option[Long], v: Option[Long], t: Option[String]) =>
            k.forall(_ < kCeil))
        case 2 => (s"c$consN", "tag IS NOT NULL",
          (k: Option[Long], v: Option[Long], t: Option[String]) =>
            t.isDefined)
      }
      val live = LakeTable.load(wh, "d", "t")
      // ADD validates existing data: only add when the ledger passes
      if (ledger.forall { case (k, v, t) => p(Some(k), v, t) }) {
        live.addConstraint(spark, name, sql)
        preds += name -> p
      } else {
        val e = intercept[Exception] {
          live.addConstraint(spark, name, sql)
        }
        assert(e.getMessage.contains("existing rows violate"),
          e.getMessage)
      }
    }
    var nextK = 0L
    var accepted = 0; var refused = 0
    for (step <- 0 until 40) {
      if (step == 0 || (rnd.nextInt(5) == 0 && preds.size < 3)) addCons()
      if (rnd.nextInt(6) == 0 && preds.nonEmpty) {
        val name = preds.keys.toSeq(rnd.nextInt(preds.size))
        LakeTable.load(wh, "d", "t").dropConstraint(name)
        preds -= name
      }
      // a random batch, sometimes poisoned
      val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
        nextK += 1
        val k = if (rnd.nextInt(8) == 0) 1000000L + nextK else nextK
        val v = rnd.nextInt(8) match {
          case 0 => None                         // NULL passes a CHECK
          case 1 => Some(-50L - rnd.nextInt(50)) // poison
          case _ => Some(rnd.nextInt(200).toLong)
        }
        val t = if (rnd.nextInt(7) == 0) None else Some(s"t$nextK")
        (k, v, t)
      }
      val ok = rows.forall { case (k, v, t) =>
        preds.values.forall(p => p(Some(k), v, t)) }
      val df = rows.toDF("k", "v", "tag")
      if (ok) {
        LakeTable.load(wh, "d", "t").append(df)
        ledger ++= rows
        accepted += 1
      } else {
        intercept[Exception] { LakeTable.load(wh, "d", "t").append(df) }
        refused += 1
      }
      val got = LakeTable.load(wh, "d", "t").read(spark).collect()
        .map(r => (r.getLong(0),
          Option(r.get(1)).map(_ => r.getLong(1)),
          Option(r.get(2)).map(_.toString))).toSet
      assert(got == ledger.toSet,
        s"step $step: table diverged from the ledger " +
          s"(accepted=$accepted refused=$refused)")
    }
    assert(accepted >= 5 && refused >= 3,
      s"coverage: accepted=$accepted refused=$refused")
  }
}
