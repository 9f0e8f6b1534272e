package graft.lake

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The self-review recovery fixes, pinned directly:
  * [[LakeTable.abandonClaim]]'s ownership check (a zombie coordinator
  * must never delete a version number a fresh writer re-claimed) and
  * [[LakeTxn.healForward]]'s regression repair (a heal-move that
  * dragged the pointer backwards over a newer flip walks forward
  * again in the same call).
  */
class RecoveryHardeningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mkTable(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-rechard-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"}],
        |"partitions":[]}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "t"))
  }

  test("abandonClaim deletes only a claim still carrying its own " +
      "transaction id — a re-claimed version number survives a zombie") {
    import SparkTestSession.spark.implicits._
    val (wh, t) = mkTable("abandon")
    t.append(Seq(1L).toDF("k"))
    // the zombie's claim for v3 under txnA
    val t1 = LakeTable.load(wh, "d", "t")
    val staged = {
      val base = t1.txnBegin()
      t1.append(Seq(2L).toDF("k"))
      t1.txnEnd(base).get
    }
    val claim = t1.writeClaim(staged, Some("txnA"))
    assert(Files.exists(claim.target))
    // recovery deletes the aborted claim, then a FRESH writer
    // re-claims the same version number (plain commit)
    Files.delete(claim.target)
    val t2 = LakeTable.load(wh, "d", "t")
    t2.append(Seq(99L).toDF("k")) // claims + flips the same v number
    assert(Files.exists(claim.target),
      "the fresh writer must own the version file again")
    // the zombie wakes and abandons: the re-claimed file MUST survive
    t1.abandonClaim(claim, "txnA")
    assert(Files.exists(claim.target),
      "abandonClaim deleted a version it no longer owns")
    assert(LakeTable.load(wh, "d", "t").read(spark)
      .collect().map(_.getLong(0)).toSet == Set(1L, 99L),
      "the fresh writer's commit must stay readable")
    // ...while a claim that IS still ours deletes normally
    val t3 = LakeTable.load(wh, "d", "t")
    val staged3 = {
      val base = t3.txnBegin()
      t3.append(Seq(3L).toDF("k"))
      t3.txnEnd(base).get
    }
    val claim3 = t3.writeClaim(staged3, Some("txnB"))
    t3.abandonClaim(claim3, "txnB")
    assert(!Files.exists(claim3.target),
      "an owned claim must still abandon cleanly")
  }

  test("healForward repairs a regressed pointer: plain claims roll " +
      "forward, a pending transaction claim stops the walk") {
    import SparkTestSession.spark.implicits._
    val (wh, t) = mkTable("healfwd")
    t.append(Seq(1L).toDF("k"))
    LakeTable.load(wh, "d", "t").append(Seq(2L).toDF("k"))
    LakeTable.load(wh, "d", "t").append(Seq(3L).toDF("k"))
    val loc = LakeTable.tableLocation(wh, "d", "t")
    val hint = loc.resolve("metadata").resolve("version-hint.text")
    val head = Files.readString(hint).trim.toInt
    assert(head >= 3)
    // simulate the check-then-move race: the pointer regressed by two
    Files.writeString(hint, (head - 2).toString)
    LakeTxn.healForward(loc, head - 2)
    assert(Files.readString(hint).trim.toInt == head,
      "healForward must walk the pointer back to the newest commit")
    assert(LakeTable.load(wh, "d", "t").read(spark).count() == 3L)
    // a PENDING cross-table claim above the head must stop the walk
    // (its fate belongs to its final record, not to a healer)
    val t4 = LakeTable.load(wh, "d", "t")
    val staged4 = {
      val base = t4.txnBegin()
      t4.append(Seq(4L).toDF("k"))
      t4.txnEnd(base).get
    }
    t4.writeClaim(staged4, Some("txn-undecided"))
    Files.writeString(hint, (head - 1).toString) // regress again
    LakeTxn.healForward(loc, head - 1)
    assert(Files.readString(hint).trim.toInt == head,
      "the walk must stop at the pending-transaction claim")
  }
}
