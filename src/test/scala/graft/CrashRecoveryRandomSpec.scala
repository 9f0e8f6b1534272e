package graft

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Randomized crash-recovery model check: random append / blind-upsert /
  * keyed-delete schedules with faults injected at BOTH commit crash
  * windows, against an exact in-memory model of what must be visible.
  *
  * Crash semantics modeled precisely:
  *   - "post-write-pre-commit" (data written, nothing claimed): the
  *     op's effect is LOST — readers never see it, period.
  *   - "post-claim-pre-flip" (v{N+1}.json claimed, pointer not
  *     flipped): the effect is PENDING — invisible to readers until
  *     the next commit attempt collides with the claim and
  *     `recoverTornClaim` rolls it forward, at which point it becomes
  *     visible BEFORE that next commit's own effect.
  *
  * The multi-JVM MaintenanceSpec kills real processes at these windows
  * once each; this spec exercises the same on-disk states over many
  * random schedules per run (in-process throw ≡ halt for on-disk
  * state: no cleanup path runs between the fault point and the op's
  * public exit).
  */
class CrashRecoveryRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private class TornCrash extends RuntimeException("injected crash")

  private def df(rows: Seq[(Long, String)]) = {
    import SparkTestSession.spark.implicits._
    rows.toDF("id", "v")
  }

  private def state(wh: String): Map[Long, String] =
    LakeTable.load(wh, "d", "t").read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("random op/crash schedules match the visibility model") {
    (1 to 4).foreach { seed =>
      val rnd = new Random(seed * 7919)
      val wh = Files.createTempDirectory(s"graft-crashrnd-$seed").toString
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"t","columns":[
          |{"column_name":"id","data_type":"long"},
          |{"column_name":"v","data_type":"string"}],"partitions":[],
          |"properties":{"commit.recovery.grace-ms":"0"}}""".stripMargin)

      var model = Map.empty[Long, String]
      // the effect of a claimed-but-unflipped commit, applied to the
      // model when the NEXT commit attempt triggers roll-forward
      var pending: Option[Map[Long, String] => Map[Long, String]] = None
      var freshId = 1000L

      def applyPending(): Unit = { pending.foreach(f => model = f(model)); pending = None }

      try {
        (1 to 10).foreach { step =>
          val opKind = rnd.nextInt(3)
          // append crashes at either window; the MoR verbs share only
          // the claim window (their data/batch writes happen inside
          // writeMoR, before commit)
          val fault = rnd.nextInt(4) match {
            case 0 if opKind == 0 => "post-write-pre-commit"
            case 1 => "post-claim-pre-flip"
            case _ => null
          }
          // one-shot arm: a retried claim after an absorbed recovery
          // still crashes exactly once
          var armed = fault
          LakeTable.faultHook = name =>
            if (armed != null && name == armed) { armed = null; throw new TornCrash }

          val t = LakeTable.load(wh, "d", "t")
          val (run, effect): (() => Unit, Map[Long, String] => Map[Long, String]) =
            opKind match {
              case 0 =>
                val rows = Seq((freshId, s"a$step"), (freshId + 1, s"b$step"))
                freshId += 10
                (() => { t.append(df(rows)) },
                  m => m ++ rows)
              case 1 =>
                val rows = (1 to 2).map(_ =>
                  (rnd.nextInt(10).toLong, s"u$step"))
                (() => { t.upsertMoR(spark, df(rows), keys = Seq("id")) },
                  m => m ++ rows)
              case 2 =>
                val ks = (1 to 2).map(_ => rnd.nextInt(10).toLong).distinct
                (() => {
                  import spark.implicits._
                  t.deleteByKeysMoR(spark, ks.toDF("id"))
                }, m => m -- ks)
            }
          val crashed =
            try { run(); false }
            catch { case _: TornCrash => true }
          LakeTable.faultHook = _ => ()

          if (!crashed) {
            // any collision with a prior pending claim rolled it
            // forward inside this op's (internally retried) commit
            applyPending()
            model = effect(model)
          } else fault match {
            case "post-write-pre-commit" =>
              // nothing claimed: effect lost; a prior pending stays
              // pending (no commit attempt happened)
              ()
            case "post-claim-pre-flip" =>
              // if a prior pending existed, this op's FIRST claim
              // collided and rolled it forward before the retried
              // claim crashed — visible despite this op's crash
              applyPending()
              pending = Some(effect)
            case other => fail(s"crashed with no fault armed: $other")
          }
          assert(state(wh) == model,
            s"seed=$seed step=$step fault=$fault crashed=$crashed")
        }
        // a clean trailing append rolls forward any final pending
        val t = LakeTable.load(wh, "d", "t")
        t.append(df(Seq((9999L, "final"))))
        applyPending()
        model += (9999L -> "final")
        assert(state(wh) == model, s"seed=$seed final")
        // version chain stays gap-free through every crash
        val metaDir = java.nio.file.Paths.get(wh, "d", "t", "metadata")
        val hint = Files.readString(metaDir.resolve("version-hint.text"))
          .trim.toInt
        (1 to hint).foreach(v => assert(
          Files.exists(metaDir.resolve(s"v$v.json")),
          s"seed=$seed: gap at v$v of $hint"))
      } finally LakeTable.faultHook = _ => ()
    }
  }
}
