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

  // Handle captured at operation creation: its optimistic-concurrency
  // baseline makes commit() throw ConcurrentModificationException if
  // another writer commits between scan and rewrite (instead of
  // silently resurrecting concurrently deleted rows).
  private val table = LakeTable.load(wh, db, tbl)

  // the group: files the operation's scan planned (set on the driver
  // during planInputPartitions, read at commit). Spark's runtime group
  // filtering builds its subquery from the TABLE relation, not this
  // operation, so only the main ReplaceData scan reports here; if a
  // second op-scan ever appears, the main scan plans last (subqueries
  // execute before the main stage) and last-write-wins stays correct.
  @volatile private var scannedPaths: Seq[String] = Seq.empty

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-lake $cmd"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(wh, db, tbl, 0L, table.currentSchema,
      onPlanned = files => scannedPaths = files.map(_.path))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          private val (writtenSchemaId, writtenSpecId, partPlan, stage) = {
            val plan = LakeStreamingWrite.partitionPlan(
              table, info.schema(): StructType)
            (table.metadata.currentSchemaId, table.metadata.currentSpecId,
              plan,
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
            // no-op statement (nothing scanned, nothing written):
            // don't burn a metadata version on an empty snapshot
            if (files.isEmpty && scannedPaths.isEmpty) return
            table.commitExternalFiles(
              files, writtenSchemaId, writtenSpecId,
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
