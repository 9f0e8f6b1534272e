package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.lake._
import graft.schema.FieldIds

/** Property pins for two-tier manifest planning: summary-level
  * manifest skipping must be invisible to the planned file set, for
  * ANY snapshot log (append/overwrite/rewrite replay), any partition
  * prune, and any stats range filter. This model-checks the soundness
  * argument in `ManifestFiles.prunedOut` — a summarized column is
  * present in every file, so a summary miss implies a per-file miss —
  * including its interplay with overwrite removals of files in
  * skipped manifests.
  */
object ManifestProps extends Properties("graft.lake.manifests") {

  private val schema = StructType(Seq(
    FieldIds.withId(StructField("k", LongType, nullable = true), 1),
    FieldIds.withId(StructField("s", StringType, nullable = true), 2)))

  // fixed dir, wiped per run — generators write real manifests here
  // and must not accumulate across JVM invocations
  private val manifestDir = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-manifest-props")
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f)))
    Files.createDirectories(p)
  }

  private val partVals = Seq("p0", "p1", "p2", "p3")

  private val fileGen: Gen[DataFileMeta] = for {
    pv <- Gen.oneOf(partVals)
    withPart <- Gen.oneOf(true, false)
    lo <- Gen.choose(0L, 90L)
    hi <- Gen.choose(lo, 100L)
    withStats <- Gen.oneOf(true, false)
  } yield DataFileMeta("f", schemaId = 0, specId = 0, rows = 1L,
    partitionValues = if (withPart) Map("grp" -> pv) else Map.empty,
    stats = if (withStats)
      Map(1 -> ColStats("num", lo.toString, hi.toString)) else Map.empty)

  /** A snapshot whose file list is written through the real manifest
    * tier (so summaries and lazy handles are the production ones).
    */
  private def snapGen(id: Long, priorPaths: Seq[String])
      : Gen[SnapshotMeta] = for {
    n <- Gen.choose(1, 4)
    raw <- Gen.listOfN(n, fileGen)
    files = raw.zipWithIndex.map { case (f, i) =>
      f.copy(path = s"f$id-$i")
    }.toVector
    op <- if (priorPaths.isEmpty) Gen.const("append")
      else Gen.frequency(5 -> "append", 2 -> "overwrite", 1 -> "rewrite")
    removed <- op match {
      case "overwrite" => Gen.someOf(priorPaths).map(_.toSeq)
      case _ => Gen.const(Seq.empty[String])
    }
  } yield SnapshotMeta(id, ManifestIO.write(
    manifestDir.resolve(
      s"manifest-prop-${java.util.UUID.randomUUID()}.json"),
    files), schemaId = 0, operation = op, removedPaths = removed)

  private val logGen: Gen[Seq[SnapshotMeta]] = for {
    n <- Gen.choose(1, 6)
    snaps <- (1 to n).foldLeft(
      Gen.const(Vector.empty[SnapshotMeta])) { (acc, id) =>
      acc.flatMap { sofar =>
        snapGen(id.toLong, sofar.flatMap(_.files.map(_.path)))
          .map(sofar :+ _)
      }
    }
  } yield snaps

  private val pruneGen: Gen[Map[String, Set[String]]] = Gen.frequency(
    1 -> Gen.const(Map.empty[String, Set[String]]),
    3 -> Gen.someOf(partVals).map(vs => Map("grp" -> vs.toSet)))

  private val filterGen: Gen[Seq[RangeFilter]] = Gen.frequency(
    1 -> Gen.const(Seq.empty[RangeFilter]),
    3 -> Gen.zip(Gen.choose(0L, 100L), Gen.choose(0L, 100L)).map {
      case (a, b) => Seq(RangeFilter("k",
        loNum = Some(BigDecimal(a min b)),
        hiNum = Some(BigDecimal(a max b))))
    })

  property("summary skipping never changes the planned file set") =
    forAll(logGen, pruneGen, filterGen) { (log, prune, filters) =>
      // reference plan: full replay, per-file pruning only
      val reference = LakeTable.matchingFiles(
        LakeTable.liveFiles(log), schema, prune, filters)
      // production plan: manifest-level skip + the same per-file prune,
      // over freshly-loaded lazy handles (the load path's shape)
      val lazyLog = log.map { s =>
        val mf = s.files.asInstanceOf[ManifestFiles]
        s.copy(files = ManifestIO.ref(mf.pathStr, mf.fileCount,
          mf.rowCount, mf.byteCount, mf.partitionSummary, mf.statsSummary))
      }
      val planned = LakeTable.matchingFiles(
        LakeTable.liveFiles(lazyLog, prune, schema, filters),
        schema, prune, filters)
      planned.map(f => (f.path, f.seq)) == reference.map(f => (f.path, f.seq))
    }
}
