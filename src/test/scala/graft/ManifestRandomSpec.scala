package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Randomized model check for the manifest tier over a PARTITIONED
  * table with a wide key spread: seeded interleavings of wide appends
  * (>summaryCap distinct partition values — forces ManifestSet
  * clustering), narrow appends, blind upserts, eq-deletes,
  * metadata-only manifest rewrites, and reloads must always read back
  * exactly the in-memory model — under full scans AND per-partition
  * pruned scans (per-part summary skipping), through the native and
  * DSv2 readers alike. The final compact pins the distributed
  * `.partitions` rollup against the model per group.
  */
class ManifestRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val groups = (0 until 20).map(i => s"g$i")

  private def runScenario(seed: Long, ops: Int): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(seed)
    val wh = Files.createTempDirectory(s"graft-mfrnd-$seed").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"w","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"grp","data_type":"string"},
        |{"column_name":"v","data_type":"string"}],
        |"partitions":[{"column":"grp","name":"grp"}]}""".stripMargin)
    var t = LakeTable.load(wh, "d", "w")
    // id -> (grp, v); last write wins per id
    val model = scala.collection.mutable.Map.empty[Long, (String, String)]
    var nextFresh = 1000L

    def freshRows(grps: Seq[String], perGroup: Int): Seq[(Long, String, String)] =
      grps.flatMap(g => (1 to perGroup).map { _ =>
        nextFresh += 1
        (nextFresh, g, s"v$nextFresh")
      })

    def readAll(tb: LakeTable): Map[Long, (String, String)] =
      tb.read(spark).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

    (1 to ops).foreach { i =>
      rnd.nextInt(10) match {
        case 0 | 1 => // WIDE append: every group at once → ManifestSet
          val rows = freshRows(groups, 1)
          t.append(rows.toDF("id", "grp", "v"))
          rows.foreach { case (k, g, v) => model(k) = (g, v) }
        case 2 | 3 => // narrow append: a couple of groups
          val rows = freshRows(
            Seq.fill(2)(groups(rnd.nextInt(groups.size))).distinct, 2)
          t.append(rows.toDF("id", "grp", "v"))
          rows.foreach { case (k, g, v) => model(k) = (g, v) }
        case 4 | 5 => // blind upsert: move some keys to new groups
          val keys = if (model.isEmpty) Seq.empty
            else Seq.fill(1 + rnd.nextInt(3))(
              model.keySet.toSeq(rnd.nextInt(model.size))).distinct
          if (keys.nonEmpty) {
            val rows = keys.map(k =>
              (k, groups(rnd.nextInt(groups.size)), s"u$i-$k"))
            t.upsertMoR(spark, rows.toDF("id", "grp", "v"), Seq("id"))
            rows.foreach { case (k, g, v) => model(k) = (g, v) }
          }
        case 6 => // eq-delete some keys (+ a guaranteed miss)
          val keys = (if (model.isEmpty) Seq.empty
            else Seq.fill(1 + rnd.nextInt(3))(
              model.keySet.toSeq(rnd.nextInt(model.size))).distinct) :+
            (999999L + i)
          t.deleteByKeysMoR(spark, keys.toDF("id"))
          keys.foreach(model.remove)
        case 7 => // metadata-only manifest rewrite: state must not move
          t.rewriteManifests()
          t = LakeTable.load(wh, "d", "w")
        case 8 => // reload (manifest-set JSON round-trip under load)
          t = LakeTable.load(wh, "d", "w")
        case 9 => ()
      }
      if (i % 6 == 0) {
        assert(readAll(t) == model.toMap,
          s"full-scan divergence at op $i (seed $seed)")
        // pruned scan of one random group — per-part summary skipping
        // must drop files, never rows
        val g = groups(rnd.nextInt(groups.size))
        val got = t.read(spark, prune = Map("grp" -> Set(g))).collect()
          .map(r => r.getLong(0) -> r.getString(2)).toMap
        val expect = model.collect {
          case (k, (mg, v)) if mg == g => k -> v
        }.toMap
        assert(got == expect,
          s"pruned-scan divergence for $g at op $i (seed $seed)")
      }
    }
    assert(readAll(t) == model.toMap, s"final divergence (seed $seed)")
    // DSv2 reader agrees
    spark.conf.set(s"spark.sql.catalog.gmfr$seed", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.gmfr$seed.warehouse", wh)
    val sql = spark.sql(s"SELECT id, grp, v FROM gmfr$seed.d.w").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(sql == model.toMap, s"DSv2 divergence (seed $seed)")
    // after compaction physical rows == live rows, so the DISTRIBUTED
    // .partitions rollup must equal the model per group
    LakeTable.load(wh, "d", "w").compact(spark)
    val parts = spark.sql(
      s"""SELECT partition, n_rows FROM gmfr$seed.d.w.partitions
         |ORDER BY partition""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectParts = model.toMap.groupBy { case (_, (g, _)) => s"grp=$g" }
      .map { case (g, m) => g -> m.size.toLong }
    assert(parts == expectParts,
      s".partitions rollup diverged from the model (seed $seed)")
  }

  test("random wide-partition interleavings with manifest rewrites " +
      "match the model") {
    runScenario(seed = 20260813L, ops = 28)
  }

  test("a second seed exercises a different interleaving") {
    runScenario(seed = 4242L, ops = 28)
  }
}
