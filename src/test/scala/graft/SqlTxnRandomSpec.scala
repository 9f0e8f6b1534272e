package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Seeded differential for SQL session transactions: a soup of
  * BEGIN / INSERT / UPDATE / DELETE / COMMIT / ROLLBACK over two
  * tables, mirrored against an in-memory ledger. After every COMMIT
  * or ROLLBACK the committed table state must equal the ledger
  * exactly, and DURING every open transaction an observer thread must
  * see only the last committed state — never a partial stage.
  */
class SqlTxnRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vsql(q: String) =
    org.apache.spark.sql.GraftViewSubstitution.sql(spark, q)

  private def observed[A](body: => A): A = {
    @volatile var out: Either[Throwable, A] = null
    val t = new Thread(() =>
      out = try Right(body) catch { case e: Throwable => Left(e) })
    t.start(); t.join()
    out.fold(throw _, identity)
  }

  test("op soup: committed state always equals the ledger; observers " +
      "never see a partial transaction") {
    val wh = Files.createTempDirectory("graft-sqltxn-rand").toString
    for (t <- Seq("a", "b"))
      Engine.processTableDefJson(wh,
        s"""{"database_name":"d","table_name":"$t","columns":[
           |{"column_name":"k","data_type":"long"},
           |{"column_name":"v","data_type":"long"}],
           |"partitions":[]}""".stripMargin)
    spark.conf.set("spark.sql.catalog.gtxr", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gtxr.warehouse", wh)
    val rnd = new scala.util.Random(47L)
    // the ledger: committed truth and the open transaction's overlay
    val committed = Map("a" -> scala.collection.mutable.Map[Long, Long](),
      "b" -> scala.collection.mutable.Map[Long, Long]())
    var overlay: Option[Map[String,
      scala.collection.mutable.Map[Long, Long]]] = None
    def working(t: String) = overlay.map(_(t)).getOrElse(committed(t))
    var nextK = 0L
    def tableState(t: String): Map[Long, Long] = observed {
      LakeTable.load(wh, "d", t).read(spark).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    var commits = 0; var rollbacks = 0; var observerChecks = 0
    for (step <- 0 until 40) {
      if (overlay.isEmpty && rnd.nextInt(3) == 0) {
        vsql("BEGIN TRANSACTION").collect()
        overlay = Some(Map(
          "a" -> committed("a").clone(), "b" -> committed("b").clone()))
      }
      val t = if (rnd.nextBoolean()) "a" else "b"
      rnd.nextInt(5) match {
        case 0 | 1 =>
          nextK += 1
          val v = rnd.nextInt(1000).toLong
          vsql(s"INSERT INTO gtxr.d.$t VALUES ($nextK, $v)").collect()
          working(t)(nextK) = v
        case 2 if working(t).nonEmpty =>
          val k = working(t).keys.toSeq(rnd.nextInt(working(t).size))
          vsql(s"UPDATE gtxr.d.$t SET v = v + 7 WHERE k = $k").collect()
          working(t)(k) += 7
        case 3 if working(t).nonEmpty =>
          val k = working(t).keys.toSeq(rnd.nextInt(working(t).size))
          vsql(s"DELETE FROM gtxr.d.$t WHERE k = $k").collect()
          working(t).remove(k)
        case 4 if working(t).nonEmpty =>
          // three-clause MERGE through the DSv2 row-level plumbing:
          // update one live key, insert one fresh key
          val k = working(t).keys.toSeq(rnd.nextInt(working(t).size))
          nextK += 1
          val nv = rnd.nextInt(1000).toLong
          vsql(
            s"""MERGE INTO gtxr.d.$t x
               |USING (SELECT * FROM VALUES (${k}L, ${nv}L),
               |       (${nextK}L, ${nv + 1}L) AS s(k, v)) s
               |ON x.k = s.k
               |WHEN MATCHED THEN UPDATE SET v = s.v
               |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
              .stripMargin).collect()
          working(t)(k) = nv
          working(t)(nextK) = nv + 1
        case _ => ()
      }
      if (overlay.isDefined && rnd.nextInt(4) == 0) {
        // mid-transaction: observers see ONLY committed state
        for (tt <- Seq("a", "b"))
          assert(tableState(tt) == committed(tt).toMap,
            s"step $step: observer saw staged rows in $tt")
        observerChecks += 1
      }
      if (overlay.isDefined && rnd.nextInt(4) == 0) {
        if (rnd.nextBoolean()) {
          vsql("COMMIT").collect()
          for (tt <- Seq("a", "b")) {
            committed(tt).clear(); committed(tt) ++= overlay.get(tt)
          }
          commits += 1
        } else {
          vsql("ROLLBACK").collect()
          rollbacks += 1
        }
        overlay = None
        for (tt <- Seq("a", "b"))
          assert(tableState(tt) == committed(tt).toMap,
            s"step $step: committed state diverged in $tt")
      }
      // autocommit statements (no open transaction) publish directly
      if (overlay.isEmpty && rnd.nextInt(5) == 0)
        for (tt <- Seq("a", "b"))
          assert(tableState(tt) == committed(tt).toMap,
            s"step $step: autocommit state diverged in $tt")
    }
    if (overlay.isDefined) vsql("ROLLBACK").collect()
    for (tt <- Seq("a", "b"))
      assert(tableState(tt) == committed(tt).toMap, s"final state $tt")
    assert(commits >= 2 && rollbacks >= 2 && observerChecks >= 3,
      s"coverage: commits=$commits rollbacks=$rollbacks " +
        s"observer=$observerChecks")
  }
}
