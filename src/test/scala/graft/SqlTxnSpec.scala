package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** SQL session transactions ([[graft.lake.SqlTxn]] +
  * `BEGIN TRANSACTION` / `COMMIT` / `ROLLBACK` in
  * [[org.apache.spark.sql.GraftSqlParser]]): statements between BEGIN
  * and COMMIT stage on buffered handles — read-your-writes inside,
  * invisible outside, one atomic cross-table publish at COMMIT.
  */
class SqlTxnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vsql(q: String) =
    org.apache.spark.sql.GraftViewSubstitution.sql(spark, q)

  /** Run `body` on a FRESH thread — outside the calling thread's open
    * transaction, i.e. what any other session/process observes. */
  private def observed[A](body: => A): A = {
    @volatile var out: Either[Throwable, A] = null
    val t = new Thread(() =>
      out = try Right(body) catch { case e: Throwable => Left(e) })
    t.start(); t.join()
    out.fold(throw _, identity)
  }

  private def setup(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft-sqltxn-$tag").toString
    for (t <- Seq("acct", "audit"))
      Engine.processTableDefJson(wh,
        s"""{"database_name":"d","table_name":"$t","columns":[
           |{"column_name":"k","data_type":"long"},
           |{"column_name":"v","data_type":"long"}],
           |"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    LakeTable.load(wh, "d", "acct").append(
      Seq((1L, 100L), (2L, 200L)).toDF("k", "v"))
    wh
  }

  test("BEGIN…COMMIT: multi-statement, multi-table — read-your-" +
      "writes inside, nothing visible outside, atomic publish") {
    val wh = setup("commit")
    spark.conf.set("spark.sql.catalog.gtx1", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtx1.warehouse", wh)
    def counts(): (Long, Long) = (
      spark.sql("SELECT count(*) FROM gtx1.d.acct").collect()
        .head.getLong(0),
      spark.sql("SELECT count(*) FROM gtx1.d.audit").collect()
        .head.getLong(0))
    assert(vsql("BEGIN TRANSACTION").collect()
      .map(_.getString(0)).toSeq == Seq("transaction started"))
    vsql("INSERT INTO gtx1.d.acct VALUES (3, 300)").collect()
    vsql("INSERT INTO gtx1.d.audit VALUES (3, 1)").collect()
    // read-your-writes: this session's scans see the staged rows,
    // and a second statement chains on the first's staged state
    assert(counts() == ((3L, 1L)), "txn session must see staged rows")
    vsql("INSERT INTO gtx1.d.audit " +
      "SELECT k, v + 1 FROM gtx1.d.audit").collect()
    assert(counts() == ((3L, 2L)))
    // …while the rest of the world sees NOTHING until COMMIT
    val outside = observed {
      (LakeTable.load(wh, "d", "acct").read(spark).count(),
        LakeTable.load(wh, "d", "audit").read(spark).count())
    }
    assert(outside == ((2L, 0L)),
      s"staged rows leaked before COMMIT: $outside")
    val c = vsql("COMMIT").collect().head
    assert(c.getString(0) == "committed" && c.getInt(1) == 2, c.toString)
    val after = observed {
      (LakeTable.load(wh, "d", "acct").read(spark).count(),
        LakeTable.load(wh, "d", "audit").read(spark).count())
    }
    assert(after == ((3L, 2L)), s"COMMIT must publish both: $after")
  }

  test("ROLLBACK discards every staged change; row-level DML stages " +
      "too; txn state errors refuse by name") {
    val wh = setup("rollback")
    spark.conf.set("spark.sql.catalog.gtx2", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtx2.warehouse", wh)
    vsql("BEGIN TRANSACTION").collect()
    // a second BEGIN refuses
    val dbl = intercept[Exception] { vsql("BEGIN TRANSACTION").collect() }
    assert(dbl.getMessage.contains("already open"), dbl.getMessage)
    vsql("INSERT INTO gtx2.d.acct VALUES (9, 900)").collect()
    // copy-on-write UPDATE and MoR-capable DELETE both stage
    vsql("UPDATE gtx2.d.acct SET v = v + 5 WHERE k = 1").collect()
    vsql("DELETE FROM gtx2.d.acct WHERE k = 2").collect()
    assert(spark.sql("SELECT k, v FROM gtx2.d.acct ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 105L), (9L, 900L)), "staged DML must be visible inside")
    val rb = vsql("ROLLBACK").collect().head
    assert(rb.getString(0) == "rolled back" && rb.getInt(1) == 1)
    assert(spark.sql("SELECT k, v FROM gtx2.d.acct ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 100L), (2L, 200L)), "ROLLBACK must discard everything")
    // COMMIT/ROLLBACK with no open transaction refuse
    val noc = intercept[Exception] { vsql("COMMIT").collect() }
    assert(noc.getMessage.contains("no open transaction"))
    val nor = intercept[Exception] { vsql("ROLLBACK").collect() }
    assert(nor.getMessage.contains("no open transaction"))
  }

  test("a concurrent commit to an enlisted table conflicts the " +
      "transaction; neither table publishes") {
    val wh = setup("conflict")
    spark.conf.set("spark.sql.catalog.gtx3", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtx3.warehouse", wh)
    import SparkTestSession.spark.implicits._
    vsql("BEGIN TRANSACTION").collect()
    vsql("INSERT INTO gtx3.d.acct VALUES (4, 400)").collect()
    vsql("INSERT INTO gtx3.d.audit VALUES (4, 1)").collect()
    // another session commits to acct while the transaction is open
    observed {
      LakeTable.load(wh, "d", "acct").append(
        Seq((50L, 500L)).toDF("k", "v"))
    }
    intercept[java.util.ConcurrentModificationException] {
      vsql("COMMIT").collect()
    }
    // all-or-nothing: the interloper's row is there, the
    // transaction's rows are NOT — in either table
    val acct = observed(LakeTable.load(wh, "d", "acct").read(spark)
      .select("k").collect().map(_.getLong(0)).toSet)
    assert(acct == Set(1L, 2L, 50L), acct.toString)
    val audit = observed(
      LakeTable.load(wh, "d", "audit").read(spark).count())
    assert(audit == 0L, "half-transaction leaked")
    // the transaction is closed: a fresh BEGIN works and commits
    vsql("BEGIN TRANSACTION").collect()
    vsql("INSERT INTO gtx3.d.audit VALUES (5, 1)").collect()
    vsql("COMMIT").collect()
    assert(observed(
      LakeTable.load(wh, "d", "audit").read(spark).count()) == 1L)
  }

  test("CHECK constraints enforce inside a transaction at the " +
      "violating statement, fail-fast, and the block can roll back") {
    val wh = setup("cons")
    spark.conf.set("spark.sql.catalog.gtx4", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtx4.warehouse", wh)
    LakeTable.load(wh, "d", "acct")
      .addConstraint(spark, "v_pos", "v > 0")
    vsql("BEGIN TRANSACTION").collect()
    try {
      vsql("INSERT INTO gtx4.d.acct VALUES (3, 300)").collect()
      // the violating statement fails AT ITS OWN commit (buffered ops
      // validate fail-fast), not at the distant COMMIT
      val e = intercept[Exception] {
        vsql("INSERT INTO gtx4.d.acct VALUES (4, -4)").collect()
      }
      def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
        .takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
      assert(msgs(e).contains("v_pos"), msgs(e))
      // the earlier clean statement is still staged — COMMIT keeps it
      vsql("COMMIT").collect()
    } finally if (graft.lake.SqlTxn.active.nonEmpty)
      graft.lake.SqlTxn.rollback()
    assert(spark.sql("SELECT k FROM gtx4.d.acct ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "the clean staged insert commits; the violating one never lands")
  }

  test("read-set validation: a concurrent commit to a table the " +
      "transaction only READ conflicts the COMMIT (no write skew)") {
    val wh = setup("skew")
    import SparkTestSession.spark.implicits._
    spark.conf.set("spark.sql.catalog.gtx6", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtx6.warehouse", wh)
    vsql("BEGIN TRANSACTION").collect()
    // read-only enlist of acct, then derive audit from it
    vsql("INSERT INTO gtx6.d.audit " +
      "SELECT k, v FROM gtx6.d.acct WHERE k = 1").collect()
    // another session commits to acct while we are open
    observed {
      LakeTable.load(wh, "d", "acct").append(
        Seq((60L, 600L)).toDF("k", "v"))
    }
    intercept[java.util.ConcurrentModificationException] {
      vsql("COMMIT").collect()
    }
    assert(observed(
      LakeTable.load(wh, "d", "audit").read(spark).count()) == 0L,
      "the skewed derivation must not publish")
    // re-run on fresh state succeeds
    vsql("BEGIN TRANSACTION").collect()
    vsql("INSERT INTO gtx6.d.audit " +
      "SELECT k, v FROM gtx6.d.acct WHERE k = 1").collect()
    vsql("COMMIT").collect()
    assert(observed(
      LakeTable.load(wh, "d", "audit").read(spark).count()) == 1L)
  }

  test("MERGE INTO stages inside a transaction: three clauses (incl. " +
      "NOT MATCHED BY SOURCE), read-your-writes on the target, " +
      "all-or-nothing under an interloper — CoW and merge-on-read") {
    for (mor <- Seq(false, true)) {
      val wh = setup(if (mor) "mergemor" else "mergecow")
      val cat = if (mor) "gtxm2" else "gtxm1"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      if (mor) LakeTable.load(wh, "d", "acct")
        .updateProperties(Map("write.merge.mode" -> "merge-on-read"))
      import SparkTestSession.spark.implicits._
      vsql("BEGIN TRANSACTION").collect()
      // the staged insert the MERGE's target scan must see
      vsql(s"INSERT INTO $cat.d.acct VALUES (3, 300)").collect()
      vsql(
        s"""MERGE INTO $cat.d.acct t
           |USING (SELECT * FROM VALUES (1L, 11L), (3L, 33L), (7L, 700L)
           |       AS s(k, nv)) s
           |ON t.k = s.k
           |WHEN MATCHED AND s.nv < 20 THEN UPDATE SET v = t.v + s.nv
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
        .collect()
      // inside: (1,111) matched+cond, (3,33) matched (the STAGED row
      // — a MERGE that misses it would insert (3,700)-style garbage),
      // (7,700) inserted, (2,200) deleted by NOT MATCHED BY SOURCE
      val inside = spark.sql(s"SELECT k, v FROM $cat.d.acct ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(inside == Seq((1L, 111L), (3L, 33L), (7L, 700L)),
        s"mor=$mor staged merge state: $inside")
      // invisible outside until COMMIT
      assert(observed(LakeTable.load(wh, "d", "acct").read(spark)
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet) ==
        Set((1L, 100L), (2L, 200L)), s"mor=$mor merge leaked pre-COMMIT")
      vsql("COMMIT").collect()
      assert(observed(LakeTable.load(wh, "d", "acct").read(spark)
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet) ==
        inside.toSet, s"mor=$mor COMMIT must publish the merge")
      // all-or-nothing: an interloper mid-transaction conflicts the
      // COMMIT and the merge publishes NOTHING
      vsql("BEGIN TRANSACTION").collect()
      vsql(
        s"""MERGE INTO $cat.d.acct t
           |USING (SELECT * FROM VALUES (1L, 5L) AS s(k, nv)) s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)"""
          .stripMargin).collect()
      observed {
        LakeTable.load(wh, "d", "acct").append(
          Seq((50L, 500L)).toDF("k", "v"))
      }
      intercept[java.util.ConcurrentModificationException] {
        vsql("COMMIT").collect()
      }
      val after = observed(LakeTable.load(wh, "d", "acct").read(spark)
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
      assert(after == inside.toSet + ((50L, 500L)),
        s"mor=$mor conflicted merge must publish nothing: $after")
    }
  }

  test("validate-under-claim: an in-flight v+1 claim on a read table " +
      "conflicts COMMIT (even with the pointer lagging); a clean " +
      "commit holds the read table through the protocol with a " +
      "content-identical version") {
    val wh = setup("claimskew")
    spark.conf.set("spark.sql.catalog.gtx7", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtx7.warehouse", wh)
    val mdir = java.nio.file.Paths.get(wh, "d", "acct", "metadata")
    def hint: Int = Files.readString(
      mdir.resolve("version-hint.text")).trim.toInt
    vsql("BEGIN TRANSACTION").collect()
    vsql("INSERT INTO gtx7.d.audit " +
      "SELECT k, v FROM gtx7.d.acct WHERE k = 1").collect()
    // a concurrent committer inside its claim→flip window on the READ
    // table: v+1 exists, the pointer still reads v — the old
    // hint-only validation called this 'still current' (the claim
    // rolls forward moments later: write skew)
    val n = hint
    val fake = mdir.resolve(s"v${n + 1}.json")
    Files.copy(mdir.resolve(s"v$n.json"), fake)
    try
      intercept[java.util.ConcurrentModificationException] {
        vsql("COMMIT").collect()
      }
    finally Files.deleteIfExists(fake)
    assert(observed(
      LakeTable.load(wh, "d", "audit").read(spark).count()) == 0L,
      "the skewed derivation must not publish")
    // clean re-run: publishes, and the read-only participant's claim
    // flips a CONTENT-IDENTICAL metadata version (the hold itself)
    val snapsBefore = observed(
      LakeTable.load(wh, "d", "acct").metadata.snapshots.map(_.id))
    val hintBefore = hint
    vsql("BEGIN TRANSACTION").collect()
    vsql("INSERT INTO gtx7.d.audit " +
      "SELECT k, v FROM gtx7.d.acct WHERE k = 1").collect()
    vsql("COMMIT").collect()
    assert(observed(
      LakeTable.load(wh, "d", "audit").read(spark).count()) == 1L)
    assert(observed(LakeTable.load(wh, "d", "acct").metadata.snapshots
      .map(_.id)) == snapsBefore,
      "the read-only hold must not change the table's content")
    assert(hint == hintBefore + 1,
      "the read-only participant must have claimed (and flipped) the " +
        "next metadata version — that hold IS the validation")
  }

  test("maintenance refuses inside a transaction: CALL procedures, " +
      "MV DDL, and constraint DDL all name the open transaction") {
    val wh = setup("maint")
    spark.conf.set("spark.sql.catalog.gtx5", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtx5.warehouse", wh)
    vsql("BEGIN TRANSACTION").collect()
    try {
      def refusesByName(q: String): Unit = {
        val e = intercept[Exception] {
          if (q.startsWith("CALL")) spark.sql(q).collect()
          else vsql(q).collect()
        }
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" ")
        assert(msgs.contains("SQL transactions"), s"$q → $msgs")
      }
      refusesByName("CALL gtx5.system.compact('d', 'acct')")
      refusesByName("CREATE MATERIALIZED VIEW gtx5.d.mv AS " +
        "SELECT k, count(*) AS n FROM gtx5.d.acct GROUP BY k")
      refusesByName("ALTER TABLE gtx5.d.acct ADD CONSTRAINT p " +
        "CHECK (v > 0)")
    } finally vsql("ROLLBACK").collect()
  }

  test("cross-warehouse statements refuse inside a transaction") {
    val wh1 = setup("whA")
    val wh2 = setup("whB")
    spark.conf.set("spark.sql.catalog.gtxa", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtxa.warehouse", wh1)
    spark.conf.set("spark.sql.catalog.gtxb", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtxb.warehouse", wh2)
    vsql("BEGIN TRANSACTION").collect()
    try {
      vsql("INSERT INTO gtxa.d.acct VALUES (7, 700)").collect()
      val e = intercept[Exception] {
        vsql("INSERT INTO gtxb.d.acct VALUES (7, 700)").collect()
      }
      def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
        .takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
      assert(msgs(e).contains("bound to warehouse"), msgs(e))
    } finally vsql("ROLLBACK").collect()
  }
}
