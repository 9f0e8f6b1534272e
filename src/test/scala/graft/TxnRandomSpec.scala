package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Differential model check for transactions: the SAME seeded op
  * sequence runs (a) as individual commits and (b) inside one
  * transaction, and everything observable must agree — final content,
  * the per-snapshot operation log, and the complete row-lineage map
  * (ids AND last-updated sequences). Buffered commits that drifted
  * from the individual-commit semantics in any way — id assignment
  * order, delete-vector state, sequence stamping — show up as a
  * mismatch with the seed that produced it.
  */
class TxnRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mkTable(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-txnrand-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"double"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "t")
    t.updateProperties(Map("format-version" -> "3"))
    (wh, LakeTable.load(wh, "d", "t"))
  }

  private def df(rows: Seq[(Long, Double)]): DataFrame = {
    import SparkTestSession.spark.implicits._
    rows.toDF("id", "v")
  }

  /** One op against a handle; both sides run the same closure. */
  private type Op = LakeTable => Unit

  private def randomOps(rnd: scala.util.Random, n: Int): Seq[(String, Op)] =
    (1 to n).map { step =>
      rnd.nextInt(6) match {
        case 0 =>
          val base = 1000L * step
          val rows = (0 until 2 + rnd.nextInt(3)).map(i =>
            (base + i, rnd.nextInt(100).toDouble))
          (s"append$step", (t: LakeTable) => { t.append(df(rows)); () })
        case 1 =>
          val cut = rnd.nextInt(100).toDouble
          (s"updCoW$step", (t: LakeTable) =>
            { t.update(spark, Map("v" -> (col("v") + 0.5)),
                col("v") < cut); () })
        case 2 =>
          val cut = rnd.nextInt(100).toDouble
          (s"updMoR$step", (t: LakeTable) =>
            { t.updateMoR(spark, Map("v" -> (col("v") + 0.25)),
                col("v") >= cut); () })
        case 3 =>
          val cut = rnd.nextInt(60).toDouble
          (s"delMoR$step", (t: LakeTable) =>
            { t.deleteMoR(spark,
                col("v") < cut && col("v") >= cut - 7.0); () })
        case 4 =>
          val cut = rnd.nextInt(100).toDouble
          (s"delCoW$step", (t: LakeTable) =>
            { t.delete(spark, col("v") > cut + 70.0); () })
        case 5 =>
          (s"compact$step", (t: LakeTable) =>
            { t.compactScoped(spark); () })
      }
    }

  private def observe(wh: String)
      : (Map[Long, Double], Seq[String], Map[Long, (Long, Long)]) = {
    val t = LakeTable.load(wh, "d", "t")
    val content = t.read(spark).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oplog = t.metadata.snapshots.map(_.operation)
    val lineage = t.readLineage(spark).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    (content, oplog, lineage)
  }

  test("a transaction is observably identical to its ops committed one by one") {
    for (seed <- Seq(11L, 4242L, 777L)) {
      val rnd = new scala.util.Random(seed)
      val seedRows = (0L until 20L).map(i =>
        (i, rnd.nextInt(100).toDouble))
      val ops = randomOps(rnd, 4 + rnd.nextInt(3))

      val (whA, a) = mkTable(s"indiv$seed")
      a.append(df(seedRows))
      ops.foldLeft(LakeTable.load(whA, "d", "t")) { (t, op) =>
        op._2(t); LakeTable.load(whA, "d", "t")
      }

      val (whB, b) = mkTable(s"txn$seed")
      b.append(df(seedRows))
      LakeTable.load(whB, "d", "t").transaction { tx =>
        ops.foreach(_._2(tx))
      }

      val (ca, oa, la) = observe(whA)
      val (cb, ob, lb) = observe(whB)
      val tag = s"seed $seed ops ${ops.map(_._1).mkString(",")}"
      assert(ca == cb, s"$tag: content diverged")
      assert(oa == ob, s"$tag: op log diverged: $oa vs $ob")
      assert(la == lb, s"$tag: lineage diverged")
      // and the txn side really was ONE publish for the whole chain
      val versionsB = {
        val dir = java.nio.file.Paths.get(whB, "d", "t", "metadata")
        scala.util.Using.resource(java.nio.file.Files.list(dir)) { st =>
          st.iterator().asScala.count { p =>
            val n = p.getFileName.toString
            n.startsWith("v") && n.endsWith(".json")
          }
        }
      }
      // create + format-version + seed append + 1 txn publish
      assert(versionsB == 4,
        s"$tag: expected 4 metadata versions, got $versionsB")
    }
  }

  private implicit class IterHasAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters
      .IteratorHasAsScala(it).asScala
  }
}
