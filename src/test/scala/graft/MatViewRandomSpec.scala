package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Randomized differential check for incremental MV maintenance: a
  * SEEDED random op sequence (appends, MoR deletes, CoW deletes, CoW
  * updates, equality upserts) mutates the source, refreshes fire at
  * random points (so deltas span several heterogeneous commits), and
  * after EVERY refresh the materialized content must equal a
  * from-scratch recompute of the defining query — for a retractable
  * COUNT/SUM/AVG shape (signed merge, or touched-group recompute when
  * an equality upsert lands in the range) and for a MIN/MAX shape
  * (append-only merge, touched-group recompute otherwise). One seeded
  * run, deterministic; a drift of one row, one count, or one decimal
  * ulp fails the comparison.
  */
class MatViewRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vsql(q: String) =
    org.apache.spark.sql.GraftViewSubstitution.sql(spark, q)

  test("seeded op soup: incremental always equals the recompute — " +
      "signed merge, append merge, and touched-group recompute") {
    val wh = Files.createTempDirectory("graft-mv-random").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"src","columns":[
        |{"column_name":"k","data_type":"string"},
        |{"column_name":"x","data_type":"long"},
        |{"column_name":"amt","data_type":"decimal(18,4)"}],
        |"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    val rnd = new scala.util.Random(11L)
    val keys = Vector("a", "b", "c", "d", "e")
    var nextX = 0L
    def randRows(n: Int) = {
      val rows = (0 until n).map { _ =>
        nextX += 1
        // NULL measures are a third of the stream: retraction must
        // restore a group's sum/avg to NULL when its last non-null
        // value is deleted (the signed merge alone would leave 0)
        val amt = if (rnd.nextInt(3) == 0) null
          else s"${rnd.nextInt(2000)}.${1000 + rnd.nextInt(9000)}"
        (keys(rnd.nextInt(keys.size)), nextX, amt)
      }
      rows.toDF("k", "x", "amt").select(col("k"), col("x"),
        col("amt").cast("decimal(18,4)").as("amt"))
    }
    LakeTable.load(wh, "d", "src").append(randRows(20))
    spark.conf.set("spark.sql.catalog.gmvr2", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmvr2.warehouse", wh)
    vsql("CREATE MATERIALIZED VIEW gmvr2.d.ret AS " +
      "SELECT k, count(*) AS n, sum(amt) AS s, avg(amt) AS a " +
      "FROM gmvr2.d.src GROUP BY k").collect()
    vsql("CREATE MATERIALIZED VIEW gmvr2.d.mm AS " +
      "SELECT k, min(x) AS mn, max(x) AS mx, count(*) AS n " +
      "FROM gmvr2.d.src GROUP BY k").collect()
    // DISTINCT shape: every refresh must route through the
    // touched-group recompute (appends can duplicate counted values)
    vsql("CREATE MATERIALIZED VIEW gmvr2.d.dct AS " +
      "SELECT k, count(DISTINCT amt) AS nd, sum(DISTINCT amt) AS sd, " +
      "avg(DISTINCT amt) AS ad, count(*) AS n " +
      "FROM gmvr2.d.src GROUP BY k").collect()
    for (name <- Seq("ret", "mm", "dct"))
      assert(graft.sources.LakeViews.read(
        graft.sources.LakeViews.path(wh, "d", name)).get
        .properties.get("graft.mat-view.incr").contains("true"), name)

    def recomputeRet(): Set[(String, Long, String, String)] =
      LakeTable.load(wh, "d", "src").read(spark).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("amt").as("s"),
          avg("amt").as("a"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.toString).orNull,
          Option(r.get(3)).map(_.toString).orNull)).toSet
    def viewRet(): Set[(String, Long, String, String)] =
      vsql("SELECT k, n, CAST(s AS STRING) AS s, CAST(a AS STRING) " +
        "AS a FROM gmvr2.d.ret").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getString(3))).toSet
    def recomputeMm(): Set[(String, Long, Long, Long)] =
      LakeTable.load(wh, "d", "src").read(spark).groupBy("k")
        .agg(min("x").as("mn"), max("x").as("mx"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
    def viewMm(): Set[(String, Long, Long, Long)] =
      vsql("SELECT k, mn, mx, n FROM gmvr2.d.mm").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    def recomputeDct(): Set[(String, Long, String, String, Long)] =
      LakeTable.load(wh, "d", "src").read(spark).groupBy("k")
        .agg(countDistinct(col("amt")).as("nd"),
          sum_distinct(col("amt")).as("sd"),
          expr("avg(DISTINCT amt)").as("ad"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.toString).orNull,
          Option(r.get(3)).map(_.toString).orNull,
          r.getLong(4))).toSet
    def viewDct(): Set[(String, Long, String, String, Long)] =
      vsql("SELECT k, nd, CAST(sd AS STRING) AS sd, " +
        "CAST(ad AS STRING) AS ad, n FROM gmvr2.d.dct").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSet

    // the op soup: every incremental refresh (either shape, any op
    // mix short of a replace) must now SUCCEED — signed merge where
    // the range allows it, touched-group recompute where it doesn't
    var incrRet = 0; var incrMm = 0; var upserts = 0
    // CoW verbs refuse while equality batches are live — compact (a
    // byte-move, invisible to the refresh algebra) materializes them
    var liveEq = false
    def compacted(): LakeTable = {
      val t = LakeTable.load(wh, "d", "src")
      if (liveEq) { t.compact(spark); liveEq = false }
      LakeTable.load(wh, "d", "src")
    }
    for (i <- 0 until 14) {
      rnd.nextInt(5) match {
        case 0 =>
          LakeTable.load(wh, "d", "src").append(randRows(3 + rnd.nextInt(5)))
        case 1 =>
          val key = keys(rnd.nextInt(keys.size))
          compacted()
            .deleteMoR(spark, col("k") === key && col("x") % 3 === 0)
        case 2 =>
          val cut = nextX - rnd.nextInt(10)
          compacted().delete(spark, col("x") > cut) // copy-on-write
        case 3 =>
          val key = keys(rnd.nextInt(keys.size))
          compacted().update(spark,
            Map("amt" -> (col("amt") + lit(1).cast("decimal(18,4)"))),
            col("k") === key) // copy-on-write rewrite
        case 4 =>
          // equality upsert: an existing x moves to a (possibly)
          // different group — markers carry only x, so this forces
          // the touched-group recompute on BOTH shapes
          val x = 1L + rnd.nextInt(nextX.toInt).toLong
          val row = randRows(1).select(lit(keys(rnd.nextInt(keys.size)))
            .as("k"), lit(x).as("x"), col("amt"))
          LakeTable.load(wh, "d", "src").upsertMoR(spark, row,
            keys = Seq("x"))
          liveEq = true
          upserts += 1
      }
      if (rnd.nextInt(10) < 7) {
        vsql("REFRESH MATERIALIZED VIEW gmvr2.d.ret INCREMENTAL")
          .collect()
        incrRet += 1
        assert(viewRet() == recomputeRet(), s"ret drifted at step $i")
      }
      if (rnd.nextInt(10) < 5) {
        vsql("REFRESH MATERIALIZED VIEW gmvr2.d.mm INCREMENTAL")
          .collect()
        incrMm += 1
        assert(viewMm() == recomputeMm(), s"mm drifted at step $i")
      }
      // deterministic cadence (no rnd draw — keeps the op stream
      // stable): the DISTINCT shape refreshes over multi-commit
      // heterogeneous deltas and must always equal the recompute
      if (i % 2 == 0) {
        vsql("REFRESH MATERIALIZED VIEW gmvr2.d.dct INCREMENTAL")
          .collect()
        assert(viewDct() == recomputeDct(), s"dct drifted at step $i")
      }
    }
    // final convergence + the run actually exercised every path
    vsql("REFRESH MATERIALIZED VIEW gmvr2.d.ret INCREMENTAL").collect()
    assert(viewRet() == recomputeRet(), "final ret")
    vsql("REFRESH MATERIALIZED VIEW gmvr2.d.mm INCREMENTAL").collect()
    assert(viewMm() == recomputeMm(), "final mm")
    vsql("REFRESH MATERIALIZED VIEW gmvr2.d.dct INCREMENTAL").collect()
    assert(viewDct() == recomputeDct(), "final dct")
    assert(incrRet >= 5 && incrMm >= 3 && upserts >= 1,
      s"coverage: incrRet=$incrRet incrMm=$incrMm upserts=$upserts")
  }

  test("join-shape op soup: fact deltas, dim appends, and dim blind " +
      "UPSERTS always equal the recompute; dim deletes refuse and " +
      "recover by full refresh") {
    val wh = Files.createTempDirectory("graft-mv-random-join").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"fact","columns":[
        |{"column_name":"cid","data_type":"long"},
        |{"column_name":"x","data_type":"long"},
        |{"column_name":"amt","data_type":"decimal(18,4)"}],
        |"partitions":[]}""".stripMargin)
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"dim","columns":[
        |{"column_name":"c_id","data_type":"long"},
        |{"column_name":"seg","data_type":"string"}],
        |"partitions":[]}""".stripMargin)
    import SparkTestSession.spark.implicits._
    val rnd = new scala.util.Random(23L)
    LakeTable.load(wh, "d", "dim").append(
      (1L to 6L).map(i => (i, s"s${i % 3}")).toDF("c_id", "seg"))
    var nextX = 0L
    def randFacts(n: Int) = {
      val rows = (0 until n).map { _ =>
        nextX += 1
        val amt = if (rnd.nextInt(4) == 0) null
          else s"${rnd.nextInt(500)}.${1000 + rnd.nextInt(9000)}"
        (1L + rnd.nextInt(6).toLong, nextX, amt)
      }
      rows.toDF("cid", "x", "amt").select(col("cid"), col("x"),
        col("amt").cast("decimal(18,4)").as("amt"))
    }
    LakeTable.load(wh, "d", "fact").append(randFacts(15))
    spark.conf.set("spark.sql.catalog.gmvrj", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmvrj.warehouse", wh)
    vsql("CREATE MATERIALIZED VIEW gmvrj.d.segroll AS " +
      "SELECT seg, count(*) AS n, sum(amt) AS s " +
      "FROM gmvrj.d.fact JOIN gmvrj.d.dim ON cid = c_id " +
      "GROUP BY seg").collect()
    assert(graft.sources.LakeViews.read(
      graft.sources.LakeViews.path(wh, "d", "segroll")).get
      .properties.contains("graft.mat-view.dims"))
    def recompute(): Set[(String, Long, String)] =
      LakeTable.load(wh, "d", "fact").read(spark)
        .join(LakeTable.load(wh, "d", "dim").read(spark),
          col("cid") === col("c_id"))
        .groupBy("seg").agg(count(lit(1)).as("n"), sum("amt").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.toString).orNull)).toSet
    def view(): Set[(String, Long, String)] =
      vsql("SELECT seg, n, CAST(s AS STRING) AS s FROM gmvrj.d.segroll")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getString(2))).toSet
    var incr = 0; var dimDeltas = 0; var dimRefusals = 0
    var dimUpserts = 0
    var dimBroken = false
    var dimKeys = (1L to 6L).toVector
    for (i <- 0 until 24) {
      rnd.nextInt(6) match {
        case 0 => LakeTable.load(wh, "d", "fact")
          .append(randFacts(2 + rnd.nextInt(4)))
        case 1 => LakeTable.load(wh, "d", "fact")
          .deleteMoR(spark, col("x") % 5 === i % 5)
        case 2 =>
          val cut = nextX - rnd.nextInt(8)
          LakeTable.load(wh, "d", "fact")
            .delete(spark, col("x") > cut)
        case 3 =>
          // a dim APPEND maintains incrementally (F_w ⋈ ΔD leg) —
          // half the time the appended key DUPLICATES a live one, so
          // unchanged fact rows gain a second join partner (the case
          // only the dim leg can express)
          val k = if (rnd.nextBoolean() && dimKeys.nonEmpty)
            dimKeys(rnd.nextInt(dimKeys.size))
          else 100L + i
          dimKeys :+= k
          LakeTable.load(wh, "d", "dim").append(
            Seq((k, s"s${rnd.nextInt(4)}")).toDF("c_id", "seg"))
          dimDeltas += 1
        case 4 =>
          // a dim DELETE removes join contributions — the NEXT
          // incremental must refuse by name (keyed eq-delete: it
          // composes with the upsert ops' live equality batches,
          // where a positional MoR delete would refuse)
          LakeTable.load(wh, "d", "dim").deleteByKeysMoR(spark,
            Seq(dimKeys(rnd.nextInt(dimKeys.size))).toDF("c_id"))
          dimBroken = true
        case 5 =>
          // a dim BLIND UPSERT re-segments a live key (the CDC-sink
          // shape): groups lose old contributions AND gain new ones —
          // maintained through the touched-group recompute
          val k = dimKeys(rnd.nextInt(dimKeys.size))
          LakeTable.load(wh, "d", "dim").upsertMoR(spark,
            Seq((k, s"s${rnd.nextInt(4)}")).toDF("c_id", "seg"),
            keys = Seq("c_id"))
          dimUpserts += 1
      }
      if (rnd.nextInt(10) < 6) {
        if (dimBroken) {
          val e = intercept[Exception] {
            vsql("REFRESH MATERIALIZED VIEW gmvrj.d.segroll INCREMENTAL")
              .collect()
          }
          val msgs = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .map(t => Option(t.getMessage).getOrElse("")).mkString(" ")
          assert(msgs.contains("dim"), s"step $i: $msgs")
          dimRefusals += 1
          vsql("REFRESH MATERIALIZED VIEW gmvrj.d.segroll").collect()
          dimBroken = false
        } else {
          vsql("REFRESH MATERIALIZED VIEW gmvrj.d.segroll INCREMENTAL")
            .collect()
          incr += 1
        }
        assert(view() == recompute(), s"segroll drifted at step $i")
      }
    }
    if (dimBroken) vsql("REFRESH MATERIALIZED VIEW gmvrj.d.segroll")
      .collect()
    else vsql("REFRESH MATERIALIZED VIEW gmvrj.d.segroll INCREMENTAL")
      .collect()
    assert(view() == recompute(), "final")
    assert(incr >= 3 && dimDeltas >= 1 && dimRefusals >= 1 &&
      dimUpserts >= 1,
      s"coverage: incr=$incr dimDeltas=$dimDeltas " +
        s"refusals=$dimRefusals upserts=$dimUpserts")
  }
}
