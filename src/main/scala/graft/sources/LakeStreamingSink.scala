package graft.sources

import java.nio.file.{Files, Paths}
import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.TaskType
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.lake.LakeTable
import graft.schema.FieldIds

/** DSv2 streaming sink: `df.writeStream.format("graft-lake")…` commits
  * one snapshot per non-empty micro-batch WITHOUT foreachBatch.
  *
  * Executor side: each task streams its InternalRows straight into
  * parquet files under the table's data directory (Spark's own
  * ParquetWriteSupport — full type coverage, INT64-micros timestamps),
  * fanning out one file per hidden-partition value (transforms are
  * evaluated per row with the same rendering as the batch writer, so
  * metadata pruning sees identical strings). Driver side: commit()
  * turns (path, partitionValues) pairs into one append snapshot tagged
  * with (queryId, epochId), so replayed epochs after a crash are
  * skipped — the same exactly-once contract as StreamIngest, with
  * distributed writes (rows never travel to the driver).
  *
  * abort() deletes staged files (and checksum sidecars).
  */
private[sources] class LakeStreamingWrite(wh: String, db: String, tbl: String,
    queryId: String, schema: StructType,
    branch: Option[String] = None) extends StreamingWrite {

  // schema version + partition plan captured at query start: a
  // mid-stream ALTER TABLE must not re-label old-schema files
  private val (writtenSchemaId, writtenSpecId, partPlan) = {
    val t = LakeTable.load(wh, db, tbl)
    (t.metadata.currentSchemaId, t.metadata.currentSpecId,
      LakeStreamingWrite.partitionPlan(t, schema))
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
    new LakeStreamingWriterFactory(stage.toString, schema, partPlan)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case LakeFilesCommit(fs) => fs
    }.flatten.toSeq
    if (files.isEmpty) return
    val t = LakeTable.load(wh, db, tbl)
    // idempotence: a replayed epoch (driver died between snapshot
    // commit and checkpoint write) must not append twice
    if (t.lastStreamBatchId(queryId).exists(_ >= epochId)) {
      files.foreach(f => deleteStaged(f._1))
      return
    }
    t.commitExternalFiles(files, writtenSchemaId, writtenSpecId,
      streamBatchId = Some(epochId), streamId = Some(queryId),
      branch = branch)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case LakeFilesCommit(fs) => fs }
      .flatten.foreach(f => deleteStaged(f._1))
}

private[graft] object LakeStreamingWrite {

  /** Resolve the table's partition spec against a writer's row schema:
    * (partition name, transform, source ordinal, type) per spec field,
    * failing fast on transforms the executor-side renderer can't
    * produce.
    */
  def partitionPlan(t: LakeTable, schema: StructType): Seq[PartField] = {
    val md = t.metadata
    val plan = md.currentSpec.fields.map { f =>
      val srcName = FieldIds.flatten(md.currentSchema)
        .collectFirst { case (p, fd) if FieldIds.idOf(fd) == f.sourceFieldId => p }
        .getOrElse(throw new IllegalStateException(
          s"spec source field ${f.sourceFieldId} not in schema"))
      val ord = try schema.fieldIndex(srcName) catch {
        case _: IllegalArgumentException =>
          throw new UnsupportedOperationException(
            s"graft-lake writer: partition source '$srcName' is nested — " +
              "distributed writes support top-level sources only; use the " +
              "driver-side batch path")
      }
      PartField(f.name, f.transform, ord, schema.fields(ord).dataType)
    }
    plan.foreach(renderCheck)
    plan
  }

  /** Throws for (transform, type) pairs renderValue can't produce.
    * Time transforms are limited to wall-clock types (NTZ/date): the
    * batch writer renders tz-aware timestamps in the SESSION timezone
    * via date_format, which an executor cannot reproduce portably.
    */
  def renderCheck(p: PartField): Unit = (p.transform, p.dataType) match {
    case ("identity", StringType | IntegerType | LongType | BooleanType |
                      DoubleType | FloatType | DateType) => ()
    case ("year" | "month" | "day" | "hour",
          TimestampNTZType | DateType) => ()
    case (tf, _) if graft.lake.Transforms.bucketCount(tf).isDefined => ()
    case (tf, StringType | IntegerType | LongType)
        if graft.lake.Transforms.truncateWidth(tf).isDefined => ()
    case (tf, dt) => throw new UnsupportedOperationException(
      s"graft-lake writer: partition transform $tf(${dt.simpleString}) is " +
        "not supported for distributed writes; use LakeTable.append / " +
        "StreamIngest.intoLake (driver-side batch path) for this table")
  }

  /** Same rendering as the batch writer's directory values
    * (Transforms.expr + Hive null dir), evaluated on an InternalRow.
    */
  def renderValue(p: PartField, row: InternalRow): String = {
    // bucket first: the batch expression pmod(hash(col), n) maps NULL
    // to pmod(seed, n), never to the default partition dir
    graft.lake.Transforms.bucketCount(p.transform).foreach { n =>
      val v = if (row.isNullAt(p.ordinal)) null else row.get(p.ordinal, p.dataType)
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(v, p.dataType, 42L).toInt
      val m = h % n
      return (if (m < 0) m + n else m).toString
    }
    if (row.isNullAt(p.ordinal)) return "__HIVE_DEFAULT_PARTITION__"
    // truncate next: same NULL → default-dir rule as identity/time, then
    // the batch expression's floor/prefix on the non-null value
    graft.lake.Transforms.truncateWidth(p.transform).foreach { w =>
      return (p.dataType match {
        case IntegerType =>
          val v = row.getInt(p.ordinal); (v - Math.floorMod(v, w)).toString
        case LongType =>
          val v = row.getLong(p.ordinal)
          (v - Math.floorMod(v, w.toLong)).toString
        case StringType =>
          // character (codepoint-pair) prefix, matching substring(col,1,w)
          val v = row.getUTF8String(p.ordinal).substringSQL(1, w).toString
          if (v.isEmpty) "__HIVE_DEFAULT_PARTITION__" else v
        case other => throw new UnsupportedOperationException(other.simpleString)
      })
    }
    def ldt: LocalDateTime = p.dataType match {
      case TimestampNTZType =>
        val micros = row.getLong(p.ordinal)
        LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      case DateType =>
        LocalDate.ofEpochDay(row.getInt(p.ordinal).toLong).atStartOfDay
      case other => throw new UnsupportedOperationException(other.simpleString)
    }
    p.transform match {
      case "identity" => p.dataType match {
        case StringType =>
          // Hive path treats null AND empty as the default partition
          val v = row.getUTF8String(p.ordinal).toString
          if (v.isEmpty) "__HIVE_DEFAULT_PARTITION__" else v
        case IntegerType => row.getInt(p.ordinal).toString
        case LongType => row.getLong(p.ordinal).toString
        case BooleanType => row.getBoolean(p.ordinal).toString
        case DoubleType => row.getDouble(p.ordinal).toString
        case FloatType => row.getFloat(p.ordinal).toString
        case DateType => LocalDate.ofEpochDay(row.getInt(p.ordinal).toLong).toString
        case other => throw new UnsupportedOperationException(other.simpleString)
      }
      case t @ ("year" | "month" | "day" | "hour") =>
        graft.lake.Transforms.renderLocal(t, ldt)
      case other => throw new UnsupportedOperationException(other)
    }
  }
}

/** One spec field bound to the query schema: partition name, transform,
  * source ordinal, source type.
  */
private[graft] case class PartField(name: String, transform: String,
    ordinal: Int, dataType: DataType)

private[graft] case class LakeFilesCommit(
    files: Seq[(String, Map[String, String])]) extends WriterCommitMessage

private[sources] class LakeStreamingWriterFactory(stageDir: String,
    schema: StructType, partPlan: Seq[PartField])
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LakeParquetDataWriter(stageDir, schema, partPlan,
      s"$epochId-$partitionId")
}

/** Writes InternalRows to parquet, one lazily opened file per hidden-
  * partition value (Spark's ParquetWriteSupport). An empty task
  * creates no files.
  *
  * `closeOnKeyChange` (the r17 batch direct-write mode): the task
  * holds ONE open file and closes it whenever the rendered partition
  * key changes — callers sort rows by the partition transform
  * expressions first, so each key is one contiguous run and the write
  * is one file per (task, value) with O(1) open-sink memory at ANY
  * partition cardinality (FileFormatWriter's sorted dynamic-partition
  * behavior). If a key DOES reappear (unsorted input), a second file
  * for the same value is emitted — more files, never wrong data — so
  * the mode is safe unconditionally; the MaxOpenPartitions cap only
  * guards the multi-sink streaming mode.
  */
private[graft] class LakeParquetDataWriter(stageDir: String,
    schema: StructType, partPlan: Seq[PartField], filePrefix: String,
    closeOnKeyChange: Boolean = false)
    extends DataWriter[InternalRow] {

  private case class Sink(
      writer: org.apache.hadoop.mapreduce.RecordWriter[Void, InternalRow],
      ctx: TaskAttemptContextImpl, path: String)

  private val sinks = mutable.LinkedHashMap.empty[Seq[String], Sink]
  private val MaxOpenPartitions = 1000
  // closeOnKeyChange mode: files already closed mid-task, reported at commit
  private val closed = mutable.ArrayBuffer.empty[(String, Map[String, String])]
  private var fileSeq = 0

  private def open(path: String): Sink = {
    val conf = graft.lake.HadoopConfs.mutable()
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
    val ctx = new TaskAttemptContextImpl(conf,
      new org.apache.hadoop.mapreduce.TaskAttemptID(
        "graft", 0, TaskType.MAP, 0, 0))
    val fmt = new org.apache.parquet.hadoop.ParquetOutputFormat[InternalRow](
      new ParquetWriteSupport())
    Sink(fmt.getRecordWriter(ctx.getConfiguration,
      new org.apache.hadoop.fs.Path(path),
      org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY),
      ctx, path)
  }

  // Spark's group-based row-level writes (UPDATE/MERGE → ReplaceData)
  // prepend a __row_operation column the physical plan does not project
  // away; shift it off so rows match the declared write schema
  private lazy val projected = new org.apache.spark.sql.catalyst
    .ProjectingInternalRow(schema,
      (1 to schema.length).toIndexedSeq)

  override def write(record: InternalRow): Unit = {
    val row =
      if (record.numFields == schema.length) record
      else if (record.numFields == schema.length + 1) {
        projected.project(record); projected
      } else throw new IllegalStateException(
        s"row has ${record.numFields} fields for ${schema.length}-column schema")
    val key = partPlan.map(p => LakeStreamingWrite.renderValue(p, row))
    if (closeOnKeyChange && sinks.nonEmpty && !sinks.contains(key)) {
      val (prevKey, prev) = sinks.head
      prev.writer.close(prev.ctx)
      closed += prev.path -> partPlan.map(_.name).zip(prevKey).toMap
      sinks.clear()
    }
    val sink = sinks.getOrElseUpdate(key, {
      require(closeOnKeyChange || sinks.size < MaxOpenPartitions,
        s"task exceeds $MaxOpenPartitions open partitions — repartition " +
          "the input by the partition source columns (each open file " +
          "buffers a row group; memory limits bite before this cap)")
      fileSeq += 1
      open(s"$stageDir/part-$filePrefix-${fileSeq - 1}-" +
        s"${UUID.randomUUID().toString.take(8)}.parquet")
    })
    sink.writer.write(null, row)
  }

  override def commit(): WriterCommitMessage = {
    val files = sinks.toSeq.map { case (key, sink) =>
      sink.writer.close(sink.ctx)
      sink.path -> partPlan.map(_.name).zip(key).toMap
    }
    sinks.clear()
    val all = closed.toSeq ++ files
    closed.clear()
    LakeFilesCommit(all)
  }

  override def abort(): Unit = {
    sinks.values.foreach { sink =>
      try sink.writer.close(sink.ctx) catch { case _: Exception => () }
      val p = Paths.get(sink.path)
      Files.deleteIfExists(p)
      Files.deleteIfExists(p.getParent.resolve(
        "." + p.getFileName.toString + ".crc"))
    }
    sinks.clear()
    closed.foreach { case (path, _) =>
      val p = Paths.get(path)
      Files.deleteIfExists(p)
      Files.deleteIfExists(p.getParent.resolve(
        "." + p.getFileName.toString + ".crc"))
    }
    closed.clear()
  }

  override def close(): Unit = ()
}
