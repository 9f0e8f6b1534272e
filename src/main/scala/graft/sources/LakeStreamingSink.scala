package graft.sources

import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.TaskType
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

import graft.lake.{DataFileMeta, FileStats, LakeTable}
import graft.schema.FieldIds

/** DSv2 streaming sink: `df.writeStream.format("graft-lake")…` commits
  * one snapshot per non-empty micro-batch WITHOUT foreachBatch.
  *
  * Executor side: each task streams its InternalRows straight into a
  * parquet file under the table's data directory (Spark's own
  * ParquetWriteSupport — full type coverage, INT64-micros timestamps)
  * and reports the path in its commit message. Driver side: commit()
  * turns the paths into one append snapshot tagged with (queryId,
  * epochId), so replayed epochs after a crash are skipped — the same
  * exactly-once contract as StreamIngest, now with distributed writes
  * (rows never travel to the driver).
  *
  * Unpartitioned tables only: hidden-partition derivation happens in
  * the batch write path; partitioned tables keep using
  * StreamIngest/foreachBatch. abort() deletes staged files.
  */
private[sources] class LakeStreamingWrite(wh: String, db: String, tbl: String,
    queryId: String, schema: StructType) extends StreamingWrite {

  // schema version the executors write under, captured at query start:
  // a mid-stream ALTER TABLE must not re-label old-schema files
  private val writtenSchemaId: Int = {
    val t = LakeTable.load(wh, db, tbl)
    require(t.metadata.currentSpec.fields.isEmpty,
      "graft-lake streaming sink supports unpartitioned tables; use " +
        "StreamIngest.intoLake (foreachBatch) for hidden partitioning")
    t.metadata.currentSchemaId
  }

  private def deleteStaged(p: String): Unit = {
    val path = Paths.get(p)
    Files.deleteIfExists(path)
    // Hadoop local-FS checksum sidecar
    Files.deleteIfExists(path.getParent.resolve(
      "." + path.getFileName.toString + ".crc"))
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val stage = LakeTable.tableLocation(wh, db, tbl)
      .resolve("data").resolve(s"stream-${UUID.randomUUID().toString.take(8)}")
    new LakeStreamingWriterFactory(stage.toString, schema)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val paths = messages.collect {
      case LakeFileCommit(p) if p != null => p
    }.toSeq
    if (paths.isEmpty) return
    val t = LakeTable.load(wh, db, tbl)
    // idempotence: a replayed epoch (driver died between snapshot
    // commit and checkpoint write) must not append twice
    if (t.lastStreamBatchId(queryId).exists(_ >= epochId)) {
      paths.foreach(deleteStaged)
      return
    }
    t.commitExternalFiles(paths, writtenSchemaId,
      streamBatchId = Some(epochId), streamId = Some(queryId))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case LakeFileCommit(p) if p != null => p }
      .foreach(deleteStaged)
}

private[sources] case class LakeFileCommit(path: String)
    extends WriterCommitMessage

private[sources] class LakeStreamingWriterFactory(stageDir: String,
    schema: StructType) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LakeParquetDataWriter(stageDir, schema,
      s"part-$epochId-$partitionId-${UUID.randomUUID().toString.take(8)}.parquet")
}

/** Writes InternalRows to one parquet file via Spark's
  * ParquetWriteSupport (lazily — an empty task creates no file).
  */
private[sources] class LakeParquetDataWriter(stageDir: String,
    schema: StructType, fileName: String) extends DataWriter[InternalRow] {

  private var writer: org.apache.hadoop.mapreduce.RecordWriter[Void, InternalRow] = _
  private var ctx: TaskAttemptContextImpl = _
  private val path = s"$stageDir/$fileName"

  private def open(): Unit = {
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    // everything ParquetWriteSupport/SparkToParquetSchemaConverter
    // read from the Hadoop conf (Spark's prepareWrite sets the same)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
    conf.set(SQLConf.CASE_SENSITIVE.key, "false")
    ctx = new TaskAttemptContextImpl(conf,
      new org.apache.hadoop.mapreduce.TaskAttemptID(
        "graft", 0, TaskType.MAP, 0, 0))
    val fmt = new org.apache.parquet.hadoop.ParquetOutputFormat[InternalRow](
      new ParquetWriteSupport())
    writer = fmt.getRecordWriter(ctx.getConfiguration,
      new org.apache.hadoop.fs.Path(path),
      org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
  }

  override def write(record: InternalRow): Unit = {
    if (writer == null) open()
    writer.write(null, record)
  }

  override def commit(): WriterCommitMessage = {
    if (writer == null) return LakeFileCommit(null) // filtered by commit()
    writer.close(ctx)
    LakeFileCommit(path)
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close(ctx) catch { case _: Exception => () }
      val p = Paths.get(path)
      Files.deleteIfExists(p)
      Files.deleteIfExists(p.getParent.resolve(
        "." + p.getFileName.toString + ".crc"))
    }
  }

  override def close(): Unit = ()
}
