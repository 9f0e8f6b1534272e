package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable, ManifestFiles, MetadataIO}
import graft.schema.Json

/** Two-tier metadata (SURVEY.md §4, Iceberg's manifest-list→manifest
  * shape): snapshot file lists live out-of-line in immutable manifest
  * JSONs; the table JSON carries only references + partition
  * summaries. Pins the O(snapshots) table document, byte-for-byte
  * manifest re-referencing across commits, lazy loading, summary-level
  * prune skipping, and inline (pre-manifest) metadata compatibility.
  */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mkPlain(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-manifest-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"m","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],
        |"partitions":[]}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "m"))
  }

  private def mkPartitioned(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-manifest-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"p","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"grp","data_type":"string"},
        |{"column_name":"v","data_type":"string"}],
        |"partitions":[{"column":"grp","name":"grp"}]}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "p"))
  }

  private def metadataDir(wh: String, db: String, tbl: String) =
    Paths.get(wh, db, tbl, "metadata")

  private def versionJson(wh: String, db: String, tbl: String,
      v: Int): String =
    Files.readString(metadataDir(wh, db, tbl).resolve(s"v$v.json"))

  private def latestVersion(wh: String, db: String, tbl: String): Int =
    Files.readString(metadataDir(wh, db, tbl)
      .resolve("version-hint.text")).trim.toInt

  private def manifestNames(wh: String, db: String, tbl: String): Set[String] =
    scala.util.Using.resource(Files.list(metadataDir(wh, db, tbl))) { st =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator())
        .asScala.map(_.getFileName.toString)
        .filter(_.startsWith("manifest-")).toSet
    }

  test("file lists live out-of-line: table JSON is O(snapshots)") {
    import spark.implicits._
    val (wh, t) = mkPlain("oline")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))

    // the table document never inlines a data-file entry
    val v = latestVersion(wh, "d", "m")
    val doc = versionJson(wh, "d", "m", v)
    assert(!doc.contains(".parquet"),
      "table JSON must not inline data-file paths")
    assert(doc.contains("\"manifest\""))

    // one immutable manifest per data-bearing snapshot
    assert(manifestNames(wh, "d", "m").size == 2)

    // a fresh load sees lazy handles: counts answer without IO
    val t2 = LakeTable.load(wh, "d", "m")
    val handles = t2.metadata.snapshots.map(_.files)
    assert(handles.forall(_.isInstanceOf[ManifestFiles]))
    val h = handles.map(_.asInstanceOf[ManifestFiles])
    assert(h.map(_.size).sum >= 2) // ≥1 file per append, counted
    assert(h.forall(!_.isMaterialized),
      "size/isEmpty must answer from recorded counts, not manifest IO")
    assert(h.map(_.rowCount).sum == 3)
    assert(h.forall(_.byteCount > 0))

    // materialized content round-trips: the read is correct
    assert(t2.read(spark).collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(h.exists(_.isMaterialized))
  }

  test("an unchanged snapshot re-references its manifest byte-for-byte") {
    import spark.implicits._
    val (wh, t) = mkPlain("reref")
    t.append(Seq((1L, "a")).toDF("id", "v")) // -> v2.json
    t.append(Seq((2L, "b")).toDF("id", "v")) // -> v3.json

    def manifestOf(doc: String, snapIdx: Int): String = {
      val snaps = Json.parse(doc).asObj("snapshots").asArr
      snaps(snapIdx).asObj("manifest").asStr
    }
    val m2 = manifestOf(versionJson(wh, "d", "m", 2), 0)
    val m3 = manifestOf(versionJson(wh, "d", "m", 3), 0)
    assert(m2 == m3,
      "commit #2 must re-reference snapshot #1's existing manifest")
    // and the in-memory handle after the second commit is the same file
    assert(t.metadata.snapshots.head.files
      .asInstanceOf[ManifestFiles].manifestName == m2)
  }

  test("summary pruning skips loading pruned-out manifests entirely") {
    import spark.implicits._
    val (wh, t) = mkPartitioned("prune")
    // two single-partition appends → each manifest summarizes one grp
    t.append(Seq((1L, "x", "a"), (2L, "x", "b")).toDF("id", "grp", "v"))
    t.append(Seq((3L, "y", "c"), (4L, "y", "d")).toDF("id", "grp", "v"))

    val t2 = LakeTable.load(wh, "d", "p")
    val planned = t2.plannedFiles(prune = Map("grp" -> Set("x")))
    assert(planned.nonEmpty &&
      planned.forall(_.partitionValues("grp") == "x"))

    val Seq(hx, hy) = t2.metadata.snapshots.map(
      _.files.asInstanceOf[ManifestFiles])
    assert(hx.partitionSummary("grp") == Set("x"))
    assert(hy.partitionSummary("grp") == Set("y"))
    assert(hx.isMaterialized, "the overlapping manifest is loaded")
    assert(!hy.isMaterialized,
      "a summary-pruned manifest must never be read from disk")

    // the pruned read itself returns exactly the partition's rows
    assert(t2.read(spark, prune = Map("grp" -> Set("x"))).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("stats summary skips manifests wholly outside a filter range") {
    import spark.implicits._
    val (wh, t) = mkPlain("stats")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((100L, "c"), (101L, "d")).toDF("id", "v"))

    val t2 = LakeTable.load(wh, "d", "m")
    val planned = t2.plannedFiles(statsFilters =
      Seq(graft.lake.RangeFilter("id", loNum = Some(BigDecimal(100)))))
    assert(planned.nonEmpty && planned.flatMap(_.stats.get(1)).nonEmpty)

    val Seq(h1, h2) = t2.metadata.snapshots.map(
      _.files.asInstanceOf[ManifestFiles])
    assert(h2.isMaterialized, "the in-range manifest is loaded")
    assert(!h1.isMaterialized,
      "a manifest whose aggregate [min,max] misses the filter is skipped")
    // the filtered read returns exactly the in-range rows
    assert(t2.read(spark, statsFilters = Seq(graft.lake.RangeFilter("id",
      loNum = Some(BigDecimal(100))))).collect()
      .map(_.getLong(0)).toSet == Set(100L, 101L))
  }

  test("inline (pre-manifest) metadata still loads and reads") {
    import spark.implicits._
    val (wh, t) = mkPlain("inline")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    // rewrite the table document with the file list inlined (the
    // pre-manifest format) and point the hint at it
    val inlined = t.metadata.copy(snapshots =
      t.metadata.snapshots.map(s => s.copy(files = s.files.toVector)))
    val dir = metadataDir(wh, "d", "m")
    val v = latestVersion(wh, "d", "m") + 1
    Files.writeString(dir.resolve(s"v$v.json"),
      Json.write(MetadataIO.toJson(inlined)))
    Files.writeString(dir.resolve("version-hint.text"), v.toString)

    assert(versionJson(wh, "d", "m", v).contains(".parquet"))
    val t2 = LakeTable.load(wh, "d", "m")
    assert(t2.read(spark).collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap == Map(1L -> "a", 2L -> "b"))
    // and the next commit externalizes the inline list
    t2.append(Seq((3L, "c")).toDF("id", "v"))
    assert(!versionJson(wh, "d", "m", v + 1).contains(".parquet"))
  }

  test(".files is a distributed scan: one input partition per manifest") {
    import spark.implicits._
    val (wh, t) = mkPlain("distfiles")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.delete(spark, org.apache.spark.sql.functions.col("id") === 2L)
    spark.conf.set("spark.sql.catalog.gmfs", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gmfs.warehouse", wh)

    val df = spark.sql("SELECT snapshot_id, path FROM gmfs.d.m.files")
    // three data-bearing snapshots (two appends + the CoW overwrite),
    // each its own manifest partition, parsed executor-side
    assert(df.rdd.getNumPartitions == 3)
    // the relation equals the planner's live set (replay equivalence:
    // removed-path filtering inside partitions matches liveFiles)
    val t2 = LakeTable.load(wh, "d", "m")
    assert(df.collect().map(_.getString(1)).toSet ==
      t2.plannedFiles().map(_.path).toSet)

    // a rewrite resets the contributing suffix to itself: 1 partition
    t2.compact(spark)
    val after = spark.sql("SELECT path FROM gmfs.d.m.files")
    assert(after.rdd.getNumPartitions == 1)
    assert(after.collect().map(_.getString(0)).toSet ==
      LakeTable.load(wh, "d", "m").plannedFiles().map(_.path).toSet)
  }

  test("expire + orphan sweep: squash gets a fresh manifest, sweep " +
      "reclaims unreferenced ones") {
    import spark.implicits._
    val (wh, t) = mkPlain("expire")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.delete(spark, org.apache.spark.sql.functions.col("id") === 1L)
    assert(t.expireSnapshots(keepAfter = 3) == 3)
    val removed = t.removeOrphanFiles(olderThanMillis = 0)
    assert(removed.nonEmpty)
    // the expired snapshots' manifests are unreferenced now — swept
    assert(removed.exists(_.contains("manifest-")),
      "sweep must reclaim manifests the current metadata dropped")

    val t2 = LakeTable.load(wh, "d", "m")
    assert(t2.read(spark).collect().map(_.getLong(0)).toSeq == Seq(2L))
    // the squash snapshot's manifest resolves (sweep kept it) and only
    // referenced manifests remain on disk
    val mf = t2.metadata.snapshots.head.files.asInstanceOf[ManifestFiles]
    assert(mf.nonEmpty && mf.forall(f => Files.exists(Paths.get(f.path))))
    assert(manifestNames(wh, "d", "m") == Set(mf.manifestName))
  }

  test("wide partition spread clusters into a ManifestSet; parts " +
      "prune and load independently") {
    import spark.implicits._
    val (wh, t) = mkPartitioned("cluster")
    // 20 distinct partition values in ONE commit — beyond summaryCap
    // (16), so a single manifest would lose its summary and every
    // pruned read would load the whole inventory
    val rows = (0 until 40).map(i => (i.toLong, s"g${i % 20}", s"v$i"))
    t.append(rows.toDF("id", "grp", "v"))
    val t2 = LakeTable.load(wh, "d", "p")
    val ms = t2.metadata.snapshots.head.files
      .asInstanceOf[graft.lake.ManifestSet]
    assert(ms.parts.size == 2, "20 groups chunk into 16 + 4")
    assert(ms.parts.forall(_.partitionSummary.contains("grp")),
      "every part keeps a prunable summary")
    assert(ms.size == 20 && ms.rowCount == 40,
      "counts answer from summaries")
    assert(ms.parts.forall(!_.isMaterialized))
    // a one-partition plan loads ONLY the part covering it
    val planned = t2.plannedFiles(prune = Map("grp" -> Set("g3")))
    assert(planned.nonEmpty &&
      planned.forall(_.partitionValues("grp") == "g3"))
    val (hot, cold) = ms.parts.partition(
      _.partitionSummary("grp").contains("g3"))
    assert(hot.size == 1 && hot.head.isMaterialized)
    assert(cold.forall(!_.isMaterialized),
      "non-overlapping parts stay cold")
    // full read round-trips
    assert(t2.read(spark).count() == 40)
    // the metadata relations see the parts
    spark.conf.set("spark.sql.catalog.gclu", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gclu.warehouse", wh)
    assert(spark.sql("SELECT * FROM gclu.d.p.manifests").count() == 2)
    assert(spark.sql("SELECT * FROM gclu.d.p.files").count() == 20)
    assert(spark.sql("SELECT * FROM gclu.d.p.partitions").count() == 20)
    assert(spark.sql(
      "SELECT n_files, n_rows FROM gclu.d.p.snapshots").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((20, 40L)))
    // rewrite_manifests over a wide table keeps the clustering (the
    // merged inventory re-clusters instead of flattening into one)
    t2.append(Seq((100L, "g3", "x")).toDF("id", "grp", "v"))
    val t3 = LakeTable.load(wh, "d", "p")
    t3.rewriteManifests()
    val t4 = LakeTable.load(wh, "d", "p")
    val rw = t4.metadata.snapshots.last.files
    assert(rw.isInstanceOf[graft.lake.ManifestSet],
      "the rewrite output is partition-clustered too")
    assert(t4.read(spark).count() == 41)
    assert(t4.read(spark, prune = Map("grp" -> Set("g7"))).count() == 2)
  }

  test("rewrite_manifests: forward reads replay ONE merged manifest, " +
      "history and CDC stay intact") {
    import spark.implicits._
    val (wh, t) = mkPlain("rwm")
    // a trail of small commits incl. a CoW delete, a MoR position
    // delete, and an eq-delete — the live state is non-trivial
    val s1 = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")).id
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.append(Seq((4L, "d")).toDF("id", "v"))
    t.delete(spark, org.apache.spark.sql.functions.col("id") === 3L)
    t.deleteMoR(spark, org.apache.spark.sql.functions.col("id") === 2L)
    t.deleteByKeysMoR(spark, Seq(99L).toDF("id")) // no-match batch stays live
    val before = t.read(spark).collect().map(_.getLong(0)).sorted.toSeq

    val snap = t.rewriteManifests()
    val t2 = LakeTable.load(wh, "d", "m")
    assert(t2.read(spark).collect().map(_.getLong(0)).sorted.toSeq
      == before, "rewrite must not change the visible state")
    // forward planning materialized ONLY the merged manifest — every
    // pre-rewrite manifest handle stays cold on a fresh load
    val handles = t2.metadata.snapshots.collect {
      case s if s.files.isInstanceOf[ManifestFiles] =>
        (s.id, s.files.asInstanceOf[ManifestFiles])
    }
    assert(handles.filter(_._1 < snap.id).forall(!_._2.isMaterialized),
      "pre-rewrite manifests must not load for a forward read")
    // time travel BEFORE the rewrite still replays the old trail
    assert(t2.read(spark, asOfSnapshot = Some(s1)).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // CDC across the rewrite delivers nothing for it
    assert(t2.changesBetween(spark, snap.id - 1, snap.id).count() == 0)
    // fixpoint: a second rewrite with nothing to merge is a no-op (a
    // scheduled maintenance loop must not grow metadata forever)
    val n = t2.metadata.snapshots.size
    assert(t2.rewriteManifests().id == snap.id)
    assert(t2.metadata.snapshots.size == n)
    // appends continue past it; expire later squashes cleanly
    t2.append(Seq((5L, "e")).toDF("id", "v"))
    assert(LakeTable.load(wh, "d", "m").read(spark).collect()
      .map(_.getLong(0)).sorted.toSeq == before :+ 5L)

    // SQL procedure surface
    spark.conf.set("spark.sql.catalog.grwm", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.grwm.warehouse", wh)
    val row = spark.sql(
      "CALL grwm.system.rewrite_manifests('d', 'm')").collect().head
    assert(row.getInt(1) >= 3, "live_files counts the merged file set")
    assert(row.getInt(2) == 2,
      "merges the prior rewrite + the append that followed it")
  }
}
