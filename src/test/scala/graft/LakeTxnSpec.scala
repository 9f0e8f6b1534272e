package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable, LakeTxn}

/** Cross-table atomic transactions ([[graft.lake.LakeTxn]]): N tables
  * flip together or not at all. Visibility is decided by ONE atomic
  * file create (the transaction's final record), so no reader — not
  * even one racing a crashed coordinator — ever observes one table's
  * half of a transaction. Crash windows are driven through the named
  * fault points; the separate-JVM torture lives in ConcurrencySpec.
  */
class LakeTxnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mkWh(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft-xtxn-$tag").toString
    Seq("t1", "t2", "t3").foreach { t =>
      Engine.processTableDefJson(wh,
        s"""{"database_name":"d","table_name":"$t","columns":[
           |{"column_name":"id","data_type":"long"},
           |{"column_name":"v","data_type":"string"}],
           |"partitions":[]}""".stripMargin)
    }
    wh
  }

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import SparkTestSession.spark.implicits._
    rows.toDF("id", "v")
  }

  private def state(wh: String, t: String): Map[Long, String] =
    LakeTable.load(wh, "d", t).read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("two tables publish atomically; mid-body invisible; " +
      "single-table and read-only bodies take the cheap paths") {
    val wh = mkWh("atomic")
    LakeTable.load(wh, "d", "t1").append(df(Seq((1L, "a"))))
    LakeTxn.transaction(wh) { ctx =>
      ctx.table("d", "t1").append(df(Seq((2L, "b"))))
      ctx.table("d", "t2").append(df(Seq((10L, "x"))))
      ctx.table("d", "t1").update(spark, Map("v" -> lit("A")),
        col("id") === 1L)
      // fresh loads mid-body see NOTHING of the transaction
      assert(state(wh, "t1") == Map(1L -> "a"), "t1 must be unstaged")
      assert(state(wh, "t2") == Map.empty, "t2 must be unstaged")
    }
    assert(state(wh, "t1") == Map(1L -> "A", 2L -> "b"))
    assert(state(wh, "t2") == Map(10L -> "x"))
    // the one-table body commits through the plain path: no txn files
    LakeTxn.transaction(wh) { ctx =>
      ctx.table("d", "t2").append(df(Seq((11L, "y"))))
    }
    assert(state(wh, "t2") == Map(10L -> "x", 11L -> "y"))
    // a read-only body stages nothing and writes nothing
    val n = LakeTxn.transaction(wh) { ctx =>
      ctx.table("d", "t1").read(spark).count()
    }
    assert(n == 2L)
    val txns = Paths.get(wh, "_txns")
    val finals = scala.util.Using.resource(Files.list(txns)) { st =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator)
        .asScala.map(_.getFileName.toString).toSeq
    }
    assert(finals.count(_.endsWith(".final")) == 1,
      s"exactly the two-table commit coordinates: $finals")
    assert(Files.readString(txns.resolve(
      finals.find(_.endsWith(".final")).get)).trim == "commit")
  }

  test("a concurrent commit on one participant aborts the WHOLE " +
      "transaction; withRetry replays the body to success") {
    val wh = mkWh("conflict")
    LakeTable.load(wh, "d", "t1").append(df(Seq((1L, "a"))))
    val e = intercept[java.util.ConcurrentModificationException] {
      LakeTxn.transaction(wh) { ctx =>
        ctx.table("d", "t1").append(df(Seq((2L, "b"))))
        ctx.table("d", "t2").append(df(Seq((10L, "x"))))
        // interleaved writer on t2 wins the claim race
        LakeTable.load(wh, "d", "t2").append(df(Seq((99L, "win"))))
      }
    }
    assert(e.getMessage.contains("concurrently"), e.getMessage)
    assert(state(wh, "t1") == Map(1L -> "a"),
      "the abort must retract BOTH tables' staged work")
    assert(state(wh, "t2") == Map(99L -> "win"))
    // whole-body retry lands the transaction on the fresh state
    var attempts = 0
    LakeTxn.withRetry(wh) { ctx =>
      attempts += 1
      ctx.table("d", "t1").append(df(Seq((2L, "b"))))
      ctx.table("d", "t2").append(df(Seq((10L, "x"))))
      if (attempts == 1) // provoke one conflict, then clean run
        LakeTable.load(wh, "d", "t1").append(df(Seq((3L, "c"))))
    }
    assert(attempts == 2)
    assert(state(wh, "t1") == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(state(wh, "t2") == Map(99L -> "win", 10L -> "x"))
  }

  test("crash after claims, before the final record: nothing visible, " +
      "recovery aborts the orphan claims, tables stay writable") {
    val wh = mkWh("preFinal")
    Seq("t1", "t2").foreach(t => LakeTable.load(wh, "d", t)
      .updateProperties(Map("commit.recovery.grace-ms" -> "0")))
    class Crash extends RuntimeException("die")
    LakeTable.faultHook = name =>
      if (name == "txn-post-claims-pre-final") throw new Crash
    try
      intercept[Crash] {
        LakeTxn.transaction(wh) { ctx =>
          ctx.table("d", "t1").append(df(Seq((1L, "a"))))
          ctx.table("d", "t2").append(df(Seq((10L, "x"))))
        }
      }
    finally LakeTable.faultHook = _ => ()
    // the fault fired OUTSIDE the coordinator's graceful-abort scope —
    // claims exist on disk, no final record: the closest in-JVM
    // equivalent of a coordinator death. Readers must see nothing.
    assert(state(wh, "t1") == Map.empty && state(wh, "t2") == Map.empty,
      "pending claims must be invisible")
    // a later writer collides with the orphan claim, recovery (grace
    // 0) declares the transaction aborted, and the retry lands
    LakeTable.transactionWithRetry(wh, "d", "t1")(
      _.append(df(Seq((5L, "later")))))
    assert(state(wh, "t1") == Map(5L -> "later"))
    val txns = Paths.get(wh, "_txns")
    val fin = scala.util.Using.resource(Files.list(txns)) { st =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator)
        .asScala.find(_.getFileName.toString.endsWith(".final")).get
    }
    assert(Files.readString(fin).trim == "abort")
    // t2's orphan claim is condemned: still invisible, cleaned when
    // its own next committer collides
    LakeTable.transactionWithRetry(wh, "d", "t2")(
      _.append(df(Seq((6L, "later2")))))
    assert(state(wh, "t2") == Map(6L -> "later2"))
  }

  test("crash after the final record: ALL participants are visible " +
      "immediately — flipped or not — and never a mixed state") {
    val wh = mkWh("postFinal")
    class Crash extends RuntimeException("die")
    // window A: no pointer flipped yet
    LakeTable.faultHook = name =>
      if (name == "txn-post-final-pre-flips") throw new Crash
    try
      intercept[Crash] {
        LakeTxn.transaction(wh) { ctx =>
          ctx.table("d", "t1").append(df(Seq((1L, "a"))))
          ctx.table("d", "t2").append(df(Seq((10L, "x"))))
        }
      }
    finally LakeTable.faultHook = _ => ()
    assert(state(wh, "t1") == Map(1L -> "a"),
      "committed-by-record claim must be readable before any flip")
    assert(state(wh, "t2") == Map(10L -> "x"))
    // window B: first pointer flipped, second not
    var armed = true
    LakeTable.faultHook = name =>
      if (name == "txn-mid-flips" && armed) { armed = false
        throw new Crash }
    try
      intercept[Crash] {
        LakeTxn.transaction(wh) { ctx =>
          ctx.table("d", "t1").append(df(Seq((2L, "b"))))
          ctx.table("d", "t2").append(df(Seq((11L, "y"))))
          ctx.table("d", "t3").append(df(Seq((20L, "z"))))
        }
      }
    finally LakeTable.faultHook = _ => ()
    assert(state(wh, "t1") == Map(1L -> "a", 2L -> "b"))
    assert(state(wh, "t2") == Map(10L -> "x", 11L -> "y"))
    assert(state(wh, "t3") == Map(20L -> "z"),
      "unflipped participants must serve the committed claim")
    // subsequent commits through colliding writers roll the stragglers
    // forward (recoverTornClaim's commit branch) and the version chain
    // stays gap-free
    LakeTable.transactionWithRetry(wh, "d", "t3")(
      _.append(df(Seq((21L, "w")))))
    assert(state(wh, "t3") == Map(20L -> "z", 21L -> "w"))
    Seq("t1", "t2", "t3").foreach { t =>
      val metaDir = Paths.get(wh, "d", t, "metadata")
      val hint = Files.readString(metaDir.resolve("version-hint.text"))
        .trim.toInt
      (1 to hint).foreach(v => assert(
        Files.exists(metaDir.resolve(s"v$v.json")), s"$t gap at v$v"))
    }
  }

  test("rollback on body failure retracts every staged table") {
    val wh = mkWh("bodyfail")
    LakeTable.load(wh, "d", "t1").append(df(Seq((1L, "a"))))
    intercept[IllegalStateException] {
      LakeTxn.transaction(wh) { ctx =>
        ctx.table("d", "t1").append(df(Seq((2L, "b"))))
        ctx.table("d", "t2").append(df(Seq((10L, "x"))))
        throw new IllegalStateException("business rule violated")
      }
    }
    assert(state(wh, "t1") == Map(1L -> "a"))
    assert(state(wh, "t2") == Map.empty)
    // the handles the context handed out are reusable after rollback
    LakeTxn.transaction(wh) { ctx =>
      ctx.table("d", "t1").append(df(Seq((2L, "b"))))
      ctx.table("d", "t2").append(df(Seq((10L, "x"))))
    }
    assert(state(wh, "t1") == Map(1L -> "a", 2L -> "b"))
    assert(state(wh, "t2") == Map(10L -> "x"))
  }
}
