package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.LakeTable

/** Group-based (copy-on-write) row-level operations: the hook behind
  * SQL `UPDATE graft.db.t SET …` and `MERGE INTO graft.db.t …`.
  *
  * Spark's rewrite rules plan these as ReplaceData: the operation's
  * SCAN reads the groups (files) that may contain matches — narrowed
  * by the engine's stats pruning and, when Spark applies runtime group
  * filtering, by join-produced filters — the updated/merged rows are
  * recomputed, and the operation's WRITE writes the replacement rows.
  * commit() swaps exactly the scanned files for the written ones in a
  * single "overwrite" snapshot, so concurrent readers see either the
  * old or the new state, never a mix. abort() deletes staged files.
  */
private[sources] class LakeRowLevelOperation(wh: String, db: String,
    tbl: String, cmd: RowLevelOperation.Command) extends RowLevelOperation {

  // the group: files the operation's scan planned (set on the driver
  // during planInputPartitions, read at commit)
  @volatile private var scannedPaths: Seq[String] = Seq.empty

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-lake $cmd"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val t = LakeTable.load(wh, db, tbl)
    new LakeScanBuilder(wh, db, tbl, 0L, t.currentSchema,
      onPlanned = files => scannedPaths = files.map(_.path))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          private val (writtenSchemaId, partPlan, stage) = {
            val t = LakeTable.load(wh, db, tbl)
            val plan = LakeStreamingWrite.partitionPlan(
              t, info.schema(): StructType)
            (t.metadata.currentSchemaId, plan,
              LakeTable.tableLocation(wh, db, tbl).resolve("data")
                .resolve(s"rewrite-${java.util.UUID.randomUUID()
                  .toString.take(8)}").toString)
          }

          override def createBatchWriterFactory(
              pInfo: PhysicalWriteInfo): DataWriterFactory =
            new LakeBatchWriterFactory(stage, info.schema(), partPlan)

          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val files = messages.collect {
              case LakeFilesCommit(fs) => fs
            }.flatten.toSeq
            LakeTable.load(wh, db, tbl).commitExternalFiles(
              files, writtenSchemaId,
              operation = "overwrite", removedPaths = scannedPaths)
            ()
          }

          override def abort(messages: Array[WriterCommitMessage]): Unit =
            messages.collect { case LakeFilesCommit(fs) => fs }.flatten
              .foreach { case (p, _) =>
                val path = Paths.get(p)
                Files.deleteIfExists(path)
                Files.deleteIfExists(path.getParent.resolve(
                  "." + path.getFileName.toString + ".crc"))
              }
        }
      }
    }
  }
}

private[sources] class LakeBatchWriterFactory(stageDir: String,
    schema: StructType, partPlan: Seq[PartField]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new LakeParquetDataWriter(stageDir, schema, partPlan,
      s"rw-$partitionId-$taskId")
}
