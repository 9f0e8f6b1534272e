package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Single-table multi-operation transactions (Iceberg's
  * Table.newTransaction): N staged operations publish through ONE
  * pointer flip — all-or-nothing visibility, per-op snapshots kept
  * for time travel/changelog, conflicts abort the whole body, aborted
  * work degrades to sweepable orphans.
  */
class TransactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mkTable(tag: String, v3: Boolean = false)
      : (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-txn-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "t")
    if (v3) t.updateProperties(Map("format-version" -> "3"))
    (wh, LakeTable.load(wh, "d", "t"))
  }

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import SparkTestSession.spark.implicits._
    rows.toDF("id", "v")
  }

  private def state(wh: String): Map[Long, String] =
    LakeTable.load(wh, "d", "t").read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("N ops, one flip: invisible mid-body, atomic after, history kept") {
    val (wh, t) = mkTable("atomic")
    t.append(df(Seq((1L, "a"), (2L, "b"))))
    val versionsBefore = metadataVersions(wh)
    t.transaction { tx =>
      tx.append(df(Seq((3L, "c"))))
      tx.update(spark, Map("v" -> lit("B")), col("id") === 2L)
      tx.delete(spark, col("id") === 1L)
      // a FRESH load mid-body must see none of it
      assert(state(wh) == Map(1L -> "a", 2L -> "b"),
        "transactional ops leaked before the closing flip")
    }
    assert(state(wh) == Map(2L -> "B", 3L -> "c"))
    // exactly ONE new metadata version for the three ops
    assert(metadataVersions(wh) == versionsBefore + 1)
    // the per-op snapshots all exist: time travel between them works
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.metadata.snapshots.size == 4)
    val afterAppend = t2.metadata.snapshots(1).id
    assert(t2.read(spark, asOfSnapshot = Some(afterAppend)).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("an exception in the body rolls the handle back; nothing publishes") {
    val (wh, t) = mkTable("abort")
    t.append(df(Seq((1L, "a"))))
    val e = intercept[RuntimeException] {
      t.transaction { tx =>
        tx.append(df(Seq((9L, "x"))))
        throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage == "boom")
    assert(state(wh) == Map(1L -> "a"))
    // the handle itself rolled back — further ops work on the base
    t.append(df(Seq((2L, "b"))))
    assert(state(wh) == Map(1L -> "a", 2L -> "b"))
    // the aborted append's files are unreferenced orphans
    val swept = LakeTable.load(wh, "d", "t")
      .removeOrphanFiles(olderThanMillis = 0L)
    assert(swept.nonEmpty, "aborted op files must sweep as orphans")
    assert(state(wh) == Map(1L -> "a", 2L -> "b"))
  }

  test("a concurrent commit aborts the transaction at the final CAS") {
    val (wh, t) = mkTable("conflict")
    t.append(df(Seq((1L, "a"))))
    val t2 = LakeTable.load(wh, "d", "t")
    intercept[Exception] {
      t2.transaction { tx =>
        tx.append(df(Seq((2L, "b"))))
        // a racer lands between the body and the closing flip
        LakeTable.load(wh, "d", "t").append(df(Seq((7L, "r"))))
        tx.append(df(Seq((3L, "c"))))
      }
    }
    // only the racer's commit is visible
    assert(state(wh) == Map(1L -> "a", 7L -> "r"))
  }

  test("a mid-body conflict on a retriable append surfaces as CME") {
    // the retriable-append catch-up path calls reload() when it sees a
    // fresh hint; inside a transaction that must abort with the SAME
    // exception type as every other conflict (the documented
    // reload-and-retry contract catches ConcurrentModificationException
    // only — an IllegalStateException here crashed the retry loop)
    val (wh, t) = mkTable("midconflict")
    t.append(df(Seq((1L, "a"))))
    val t2 = LakeTable.load(wh, "d", "t")
    intercept[java.util.ConcurrentModificationException] {
      t2.transaction { tx =>
        // racer lands BEFORE the tx's first append, so the append's
        // own staleness check (not the closing CAS) sees it
        LakeTable.load(wh, "d", "t").append(df(Seq((7L, "r"))))
        tx.append(df(Seq((2L, "b"))))
      }
    }
    assert(state(wh) == Map(1L -> "a", 7L -> "r"))
    // the handle rolled back: a whole-body retry on a fresh handle works
    val t3 = LakeTable.load(wh, "d", "t")
    t3.transaction { tx => tx.append(df(Seq((2L, "b")))) }
    assert(state(wh) == Map(1L -> "a", 7L -> "r", 2L -> "b"))
  }

  test("transactionWithRetry re-runs the whole body on a fresh handle " +
      "and applies it exactly once") {
    val (wh, t) = mkTable("retry")
    t.append(df(Seq((1L, "a"))))
    var attempts = 0
    LakeTable.transactionWithRetry(wh, "d", "t") { tx =>
      attempts += 1
      tx.append(df(Seq((2L, "b"))))
      // defeat the FIRST attempt only: a racer lands before the
      // closing flip, so that attempt aborts at the CAS and the helper
      // must re-run the entire closure against the racer's state
      if (attempts == 1)
        LakeTable.load(wh, "d", "t").append(df(Seq((7L, "r"))))
      tx.update(SparkTestSession.spark,
        Map("v" -> org.apache.spark.sql.functions.lit("B")),
        org.apache.spark.sql.functions.col("id") === 2L)
    }
    assert(attempts == 2, s"expected one conflict + one success, got $attempts")
    // exactly-once: the aborted attempt's ops left nothing behind
    assert(state(wh) == Map(1L -> "a", 7L -> "r", 2L -> "B"))
  }

  test("transactionWithRetry rethrows once attempts are exhausted") {
    val (wh, t) = mkTable("retryout")
    t.append(df(Seq((1L, "a"))))
    var attempts = 0
    intercept[java.util.ConcurrentModificationException] {
      LakeTable.transactionWithRetry(wh, "d", "t", attempts = 2) { tx =>
        attempts += 1
        tx.append(df(Seq((100L + attempts, "x"))))
        // every attempt loses to a racer
        LakeTable.load(wh, "d", "t")
          .append(df(Seq((200L + attempts, "r"))))
      }
    }
    assert(attempts == 2, s"must stop at the attempt budget, got $attempts")
    // no transactional row ever published; both racer rows did
    assert(state(wh) ==
      Map(1L -> "a", 201L -> "r", 202L -> "r"))
  }

  test("branch staging and publish compose inside one transaction") {
    val (wh, t) = mkTable("branch")
    t.append(df(Seq((1L, "a"))))
    val versionsBefore = metadataVersions(wh)
    t.transaction { tx =>
      tx.createBranch("audit")
      tx.appendToBranch(df(Seq((2L, "b"))), "audit")
      tx.appendToBranch(df(Seq((3L, "c"))), "audit")
      tx.fastForward("audit")
      assert(state(wh) == Map(1L -> "a"),
        "the whole stage+publish flow must stay invisible mid-body")
    }
    assert(state(wh) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(metadataVersions(wh) == versionsBefore + 1,
      "create-branch + 2 stages + publish = ONE version flip")
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.metadata.staged.isEmpty, "published staging left behind")
  }

  test("v3 lineage: txn ops stamp disjoint id ranges like individual commits") {
    val (wh, t) = mkTable("lineage", v3 = true)
    t.transaction { tx =>
      tx.append(df(Seq((1L, "a"), (2L, "b"))))
      tx.append(df(Seq((3L, "c"))))
      tx.updateMoR(spark, Map("v" -> lit("A")), col("id") === 1L)
    }
    val t2 = LakeTable.load(wh, "d", "t")
    val rows = t2.readLineage(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows.values.toSeq.distinct.size == 3, s"ids must be unique: $rows")
    // the MoR-updated copy kept row 1's original id
    assert(rows(1L) == 0L)
  }

  private def metadataVersions(wh: String): Int = {
    val dir = java.nio.file.Paths.get(wh, "d", "t", "metadata")
    scala.util.Using.resource(java.nio.file.Files.list(dir)) { st =>
      st.iterator().asScala.count { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.endsWith(".json")
      }
    }
  }

  private implicit class IterHasAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters
      .IteratorHasAsScala(it).asScala
  }
}
