package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.{LakeTable, Reconcile}
import graft.schema.FieldIds

/** DataSource V2 connector for lake tables — the streaming read half of
  * the Iceberg story (the write half is StreamIngest):
  *
  *   spark.readStream.format("graft-lake")
  *     .option("warehouse", wh).option("database", db).option("table", t)
  *     .load()
  *
  * Offsets are snapshot ids: each micro-batch reads the data files of
  * the append snapshots in (start, end], so a batch is exactly one or
  * more committed snapshots — the same incremental contract as
  * `LakeTable.changesBetween` (rewrite/overwrite snapshots move or
  * mutate existing rows and are skipped; the stream is append-only CDC).
  * `option("startSnapshot", n)` begins after snapshot n.
  *
  * Batch reads (`spark.read.format("graft-lake")`) plan the current
  * live file set through the same reader.
  *
  * Scale: planInputPartitions is a metadata-only walk (one partition
  * per data file — no listing, no footer reads on the driver); each
  * file is read by one task and reconciled to the stream-start schema
  * by field ID, so mid-stream schema evolution never breaks a running
  * query. Reconciliation runs recursively through structs, lists and
  * maps; every TypeMapper type (decimal included) is supported.
  */
class LakeStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"

  private def load(m: java.util.Map[String, String]): LakeTable = {
    def req(k: String) = Option(m.get(k)).getOrElse(
      throw new IllegalArgumentException(s"graft-lake: missing option '$k'"))
    LakeTable.load(req("warehouse"), req("database"), req("table"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = Reconcile.clean(load(options).currentSchema)
      .asInstanceOf[StructType]
    if (Option(options.get("changelog")).exists(_.toBoolean))
      LakeSource.changelogSchema(base)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val t = load(properties)
    new LakeSparkTable(
      properties.get("warehouse"), properties.get("database"),
      properties.get("table"),
      Option(properties.get("startSnapshot")).map(_.toLong).getOrElse(0L),
      t,
      changelogMode =
        Option(properties.get("changelog")).exists(_.toBoolean))
  }
}

private[sources] class LakeSparkTable(val wh: String, val db: String,
    val tbl: String,
    startSnapshot: Long, lake: LakeTable,
    val asOfSnapshot: Option[Long] = None,
    val branchName: Option[String] = None,
    changelogMode: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** Row-identity metadata columns — `SELECT _graft_file, _graft_pos
    * FROM graft.db.t` works, and they are the rowId the delta-based
    * (merge-on-read) SQL row-level operations key their position
    * deletes on.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = {
    import org.apache.spark.sql.connector.catalog.MetadataColumn
    Array(
      new MetadataColumn {
        override def name(): String = LakeSource.FileMetaCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          StringType
        override def isNullable: Boolean = false
        override def comment(): String = "data file path of the row"
      },
      new MetadataColumn {
        override def name(): String = LakeSource.PosMetaCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          LongType
        override def isNullable: Boolean = false
        override def comment(): String = "row position within its data file"
      },
      new MetadataColumn {
        override def name(): String = LakeSource.RowIdMetaCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          LongType
        override def isNullable: Boolean = true
        override def comment(): String =
          "stable row-lineage id (Iceberg v3): preserved across " +
            "rewrites; null for rows written before lineage existed"
      },
      new MetadataColumn {
        override def name(): String = LakeSource.LastUpdMetaCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          LongType
        override def isNullable: Boolean = true
        override def comment(): String =
          "data sequence of the commit that last wrote the row"
      })
  }

  private def requireWritable(): Unit =
    require(asOfSnapshot.isEmpty && branchName.isEmpty,
      "cannot write to a table pinned with VERSION AS OF " +
        "(branch writes go through LakeTable.appendToBranch)")

  /** SQL UPDATE / MERGE INTO / (non-convertible) DELETE: group-based
    * copy-on-write rewrite by default — the scanned files are replaced
    * by the recomputed rows in one overwrite snapshot. Tables that set
    * write.update.mode / write.merge.mode / write.delete.mode to
    * "merge-on-read" route to the delta operation instead: position
    * deletes + delta files, no target rewrite (LakeRowLevelOps).
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    requireWritable()
    import org.apache.spark.sql.connector.write.RowLevelOperation.Command
    val modeKey = info.command match {
      case Command.UPDATE => "write.update.mode"
      case Command.MERGE => "write.merge.mode"
      case Command.DELETE => "write.delete.mode"
    }
    val mor = LakeTable.load(wh, db, tbl).metadata.properties
      .get(modeKey).contains("merge-on-read")
    () =>
      if (mor) new LakeDeltaOperation(wh, db, tbl, info.command)
      else new LakeRowLevelOperation(wh, db, tbl, info.command)
  }

  /** SQL `DELETE FROM graft.<db>.<t> WHERE …`: Spark hands over the
    * predicate as source filters when they are fully convertible;
    * they run through the engine's copy-on-write delete (file-pruned
    * rewrite + overwrite snapshot). Unconvertible predicates make
    * Spark raise its standard "cannot delete" analysis error.
    */
  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    requireWritable()
    val spark = org.apache.spark.sql.SparkSession.active
    val predicate = filters.map(LakeSource.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val t = LakeTable.load(wh, db, tbl)
    // "write.delete.mode"="merge-on-read": position-delete files instead
    // of copy-on-write file rewrites (Iceberg v2's table property)
    if (t.metadata.properties.get("write.delete.mode")
        .contains("merge-on-read"))
      t.deleteMoR(spark, predicate)
    else t.delete(spark, predicate)
    ()
  }

  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(LakeSource.convertibleFilter)

  // a version pin reads under the schema current AT that snapshot
  private lazy val pinnedSchema: StructType =
    asOfSnapshot.map(lake.schemaAsOf).getOrElse(lake.currentSchema)

  override def name(): String = s"graft.$db.$tbl"
  // surfaces in DESCRIBE EXTENDED / SHOW TBLPROPERTIES
  override def properties(): java.util.Map[String, String] =
    scala.jdk.CollectionConverters.MapHasAsJava(
      lake.metadata.properties).asJava

  override def schema(): StructType = {
    if (changelogMode)
      return LakeSource.changelogSchema(
        Reconcile.clean(pinnedSchema).asInstanceOf[StructType])
    val clean = Reconcile.clean(pinnedSchema).asInstanceOf[StructType]
    // advertise defaults in Spark's convention so `INSERT ... VALUES
    // (..., DEFAULT)` resolves to the declared literal instead of
    // NULL: CURRENT_DEFAULT is the mutable write default,
    // EXISTS_DEFAULT the immutable initial one
    StructType(clean.fields.zip(pinnedSchema.fields).map {
      case (cf, pf) =>
        val b = new org.apache.spark.sql.types.MetadataBuilder()
        graft.schema.Defaults.writeOf(pf).foreach(v =>
          b.putString("CURRENT_DEFAULT", graft.schema.Defaults.sqlText(pf, v)))
        graft.schema.Defaults.of(pf).foreach(v =>
          b.putString("EXISTS_DEFAULT", graft.schema.Defaults.sqlText(pf, v)))
        val m = b.build()
        if (m == org.apache.spark.sql.types.Metadata.empty) cf
        else cf.copy(metadata = m)
    })
  }

  /** Advertise the current partition spec (identity/years/months/days/
    * hours over source columns) — surfaces in DESCRIBE and lets Spark
    * reason about the table's layout.
    */
  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val flat = graft.schema.FieldIds.flatten(pinnedSchema)
    lake.metadata.currentSpec.fields.flatMap { f =>
      flat.collectFirst {
        case (p, fd) if graft.schema.FieldIds.idOf(fd) == f.sourceFieldId => p
      }.map { src =>
        f.transform match {
          case "identity" => Expressions.identity(src)
          case "year" => Expressions.years(src)
          case "month" => Expressions.months(src)
          case "day" => Expressions.days(src)
          case "hour" => Expressions.hours(src)
          case t if graft.lake.Transforms.bucketCount(t).isDefined =>
            Expressions.bucket(graft.lake.Transforms.bucketCount(t).get, src)
          case t if graft.lake.Transforms.truncateWidth(t).isDefined =>
            Expressions.apply("truncate",
              Expressions.literal(graft.lake.Transforms.truncateWidth(t).get),
              org.apache.spark.sql.GraftPlanBridge.fieldRef(src))
          case other => Expressions.apply(other, Expressions.column(src))
        }
      }
    }.toArray
  }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.STREAMING_WRITE,
      // INSERT OVERWRITE = truncate-then-write on the write builder
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // incremental batch read (Iceberg's start/end-snapshot-id options):
    // rows ADDED by snapshots in (fromSnapshot, toSnapshot] — the batch
    // form of changesBetween, with column pruning + stats file skipping
    // intact. toSnapshot defaults to the latest commit.
    val incremental = Option(options.get("fromSnapshot")).map { f =>
      require(asOfSnapshot.isEmpty && branchName.isEmpty,
        "fromSnapshot cannot combine with VERSION AS OF or a branch")
      (f.toLong, Option(options.get("toSnapshot")).map(_.toLong)
        .getOrElse(Long.MaxValue))
    }
    require(!(changelogMode && incremental.isDefined),
      "changelog cannot combine with fromSnapshot/toSnapshot (the " +
        "stream's startSnapshot option positions a changelog read)")
    // keep the field-id-bearing schema (the reader reconciles by id)
    // but force data columns nullable — marker rows null-fill non-key
    // columns; readSchema cleans at the end like the normal path
    val full =
      if (changelogMode)
        StructType(pinnedSchema.fields.toSeq.map(_.copy(nullable = true)) ++
          LakeSource.changelogFields)
      else pinnedSchema
    new LakeScanBuilder(wh, db, tbl, startSnapshot, full, asOfSnapshot,
      maxSnapshotsPerTrigger =
        Option(options.get("maxSnapshotsPerTrigger")).map(_.toInt),
      branchName = branchName,
      skipDeleteSnapshots =
        Option(options.get("skipDeleteSnapshots")).exists(_.toBoolean),
      incremental = incremental,
      changelogMode = changelogMode)
  }

  /** INSERT INTO / df.writeTo(...).append() via the V1 write bridge:
    * Spark resolves the input to the table schema, then the append goes
    * through the engine's own write path (align → hidden partitioning →
    * clustering → stats → snapshot commit) on the driver side — the
    * same single-writer commit contract as LakeTable.append.
    */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    requireWritable()
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      // INSERT OVERWRITE arrives as truncate-then-write
      private var doOverwrite = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        doOverwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write
            with org.apache.spark.sql.connector.write
              .RequiresDistributionAndOrdering {

          /** Cluster incoming rows by the identity partition columns so
            * each partition value lands in ONE write task — one file
            * per partition per epoch instead of one per (task,
            * partition). Identity specs only: time transforms would
            * need the function catalog, which format()-routed streams
            * don't carry; they keep the per-task fan-out writer.
            */
          override def requiredDistribution()
              : org.apache.spark.sql.connector.distributions.Distribution = {
            import org.apache.spark.sql.connector.expressions.Expressions
            val t = LakeTable.load(wh, db, tbl)
            val md = t.metadata
            val flat = graft.schema.FieldIds.flatten(md.currentSchema)
            val idCols = md.currentSpec.fields
              .filter(_.transform == "identity")
              .flatMap(f => flat.collectFirst {
                case (p, fd)
                  if graft.schema.FieldIds.idOf(fd) == f.sourceFieldId => p
              })
            if (idCols.nonEmpty &&
                idCols.size == md.currentSpec.fields.size &&
                idCols.forall(c => !c.contains(".")))
              org.apache.spark.sql.connector.distributions.Distributions
                .clustered(idCols.map(c =>
                  Expressions.identity(c): org.apache.spark.sql.connector
                    .expressions.Expression).toArray)
            else org.apache.spark.sql.connector.distributions.Distributions
              .unspecified()
          }
          override def requiredOrdering()
              : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            Array.empty
          override def requiredNumPartitions(): Int = 0
          override def distributionStrictlyRequired(): Boolean = false

          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
              val t = LakeTable.load(wh, db, tbl)
              if (doOverwrite || overwrite) t.overwrite(data)
              else t.append(data)
              ()
            }
          // streaming path: executor-side parquet writers + one
          // snapshot commit per epoch (LakeStreamingSink)
          override def toStreaming: org.apache.spark.sql.connector.write
              .streaming.StreamingWrite = {
            // declaring SupportsTruncate makes Spark ACCEPT
            // outputMode("complete") streams and route them through
            // truncate() — but the sink only appends per epoch, which
            // would silently duplicate the full result every batch
            if (doOverwrite) throw new UnsupportedOperationException(
              "graft-lake sink: Complete output mode is not supported " +
                "(per-epoch append sink); use update/append modes or " +
                "foreachBatch with LakeTable.overwrite")
            val tableSchema = Reconcile
              .clean(LakeTable.load(wh, db, tbl).currentSchema)
              .asInstanceOf[StructType]
            require(LakeSource.sameShape(tableSchema, info.schema),
              s"graft-lake streaming sink: query schema ${info.schema.sql} " +
                s"does not match table schema ${tableSchema.sql} — cast " +
                "columns first (e.g. timestamp vs timestamp_ntz)")
            // option("branch", name): per-epoch commits stage onto the
            // branch instead of main — streaming write-audit-publish.
            // Validate the ref at QUERY START: a typo'd branch must
            // fail before executors write a whole epoch for nothing.
            val branchOpt = Option(info.options.get("branch"))
            branchOpt.foreach { b =>
              val refs = LakeTable.load(wh, db, tbl).metadata.refs
              require(refs.get(b).exists(r =>
                r.kind == "branch" && r.baseSnapshotId.isDefined),
                s"graft-lake sink: no writable branch '$b' (refs: " +
                  s"${refs.keys.toSeq.sorted.mkString(", ")})")
            }
            new LakeStreamingWrite(wh, db, tbl, info.queryId(), info.schema,
              branchOpt)
          }
        }
    }
  }
}

/** Scan planning with the two pushdowns that matter at scale:
  *
  *  - column pruning (`SupportsPushDownRequiredColumns`): the scan's
  *    target schema shrinks to the referenced columns, so the record
  *    reader materializes (and parquet decodes) only those — a
  *    2-column projection of a 100-column table reads 2 columns;
  *  - filter pushdown (`SupportsPushDownFilters`): comparison/equality
  *    predicates on top-level columns become metadata RangeFilters
  *    that drop whole data files by min/max stats before any IO. All
  *    filters are returned as residual — the engine's pruning is
  *    advisory (file granularity), Spark still applies the exact
  *    predicate to the rows that survive.
  */
private[graft] class LakeScanBuilder(wh: String, db: String, tbl: String,
    startSnapshot: Long, full: StructType,
    asOfSnapshot: Option[Long] = None,
    onPlanned: Seq[graft.lake.DataFileMeta] => Unit = _ => (),
    maxSnapshotsPerTrigger: Option[Int] = None,
    branchName: Option[String] = None,
    skipDeleteSnapshots: Boolean = false,
    incremental: Option[(Long, Long)] = None,
    changelogMode: Boolean = false,
    rowLevelOp: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var target: StructType = full
  private var stats: Seq[graft.lake.RangeFilter] = Seq.empty
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var aggResult: Option[(StructType, Array[Any])] = None

  /** COUNT(*) / MIN(col) / MAX(col) with no filters and no grouping are
    * answered from snapshot metadata — per-file footer row counts and
    * min/max column stats recorded at commit — zero data IO at any
    * table size. MIN/MAX require every live file to carry stats for the
    * column, a numeric/temporal type (string footer stats can be
    * truncated by writers), and no live merge-on-read deletes (a
    * deleted row could BE the extremum). Everything else stays
    * unpushed. The result is validated and captured on ONE metadata
    * load; the scan emits it as a single partial row that Spark's final
    * aggregate folds (count sums, min-of-min, max-of-max).
    */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty ||
        agg.aggregateExpressions.isEmpty) return false
    // a branch overlay's live set differs from main's — no
    // metadata-only answers through the main-history rollups below
    if (branchName.isDefined) return false
    // an incremental range reads raw added files, not the live set —
    // the metadata rollups below would answer for the wrong row set
    if (incremental.isDefined) return false

    val t = LakeTable.load(wh, db, tbl)
    val visible = LakeSource.visibleSnapshots(t, asOfSnapshot)
    val live = LakeTable.liveFiles(visible)
    val deletes = LakeTable.liveDeletes(visible)
    if (!live.forall(_.rows >= 0)) return false
    // live equality deletes make per-file row counts unknowable
    // without scanning — no metadata-only answers
    if (LakeTable.liveEqDeletes(visible).nonEmpty) return false

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        target.fields.find(_.name == r.fieldNames()(0))
      case _ => None
    }
    def statsValue(sf: StructField, wantMin: Boolean): Option[Any] = {
      if (deletes.nonEmpty || !FieldIds.hasId(sf)) return None
      if (live.isEmpty) return Some(null) // MIN/MAX over empty = NULL
      val id = FieldIds.idOf(sf)
      val perFile = live.map(_.stats.get(id))
      if (!perFile.forall(_.exists(_.kind == "num"))) return None
      val vals = perFile.flatten.map(cs =>
        BigDecimal(if (wantMin) cs.min else cs.max))
      val v = if (wantMin) vals.min else vals.max
      sf.dataType match {
        case IntegerType => Some(v.toIntExact)
        case LongType => Some(v.toLongExact)
        case FloatType => Some(v.toFloat)
        case DoubleType => Some(v.toDouble)
        case DateType => Some(v.toIntExact)
        case TimestampType | TimestampNTZType => Some(v.toLongExact)
        case d: DecimalType =>
          Some(org.apache.spark.sql.types.Decimal(v, d.precision, d.scale))
        case _ => None
      }
    }
    val answered = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some((StructField("count(*)", LongType, nullable = false),
          live.map(_.rows).sum - deletes.values.map(_.rows).sum: Any))
      case m: Min => colOf(m.column).flatMap(sf =>
        statsValue(sf, wantMin = true).map(v =>
          (StructField(s"min(${sf.name})", sf.dataType), v)))
      case m: Max => colOf(m.column).flatMap(sf =>
        statsValue(sf, wantMin = false).map(v =>
          (StructField(s"max(${sf.name})", sf.dataType), v)))
      case _ => None
    }
    if (answered.forall(_.isDefined)) {
      val pairs = answered.flatten
      aggResult = Some((StructType(pairs.map(_._1)),
        pairs.map(_._2).toArray))
      true
    } else false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep full-field definitions (ids, nested types) in required
    // order; _graft_file/_graft_pos metadata columns pass through
    target = StructType(requiredSchema.fields.toSeq.flatMap { rf =>
      if (LakeSource.isMetaCol(rf.name)) Some(rf)
      else full.fields.find(_.name == rf.name)
    })

  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    stats = filters.toSeq.flatMap(LakeSource.filterToRanges)
    pushed = filters
    filters // all residual: file skipping is coarse, rows re-filtered
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  override def build(): Scan =
    new LakeScan(wh, db, tbl, startSnapshot, target, stats, aggResult,
      asOfSnapshot, onPlanned, maxSnapshotsPerTrigger, branchName,
      skipDeleteSnapshots, incremental, changelogMode, rowLevelOp)
}

private[sources] class LakeScan(wh: String, db: String, tbl: String,
    startSnapshot: Long, target: StructType,
    statsFilters: Seq[graft.lake.RangeFilter] = Seq.empty,
    aggResult: Option[(StructType, Array[Any])] = None,
    asOfSnapshot: Option[Long] = None,
    onPlanned: Seq[graft.lake.DataFileMeta] => Unit = _ => (),
    maxSnapshotsPerTrigger: Option[Int] = None,
    branchName: Option[String] = None,
    skipDeleteSnapshots: Boolean = false,
    incremental: Option[(Long, Long)] = None,
    changelogMode: Boolean = false,
    rowLevelOp: Boolean = false) extends Scan
    with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  // one metadata load shared by statistics and batch planning
  private lazy val planned = {
    val t = LakeTable.load(wh, db, tbl)
    incremental match {
      case Some((from, to)) =>
        // rows ADDED in (from, to] — raw append/upsert files, no
        // delete application (changesBetween semantics): a consumer of
        // the range wants the added row versions, and retractions are
        // the changelog's job. A row-REMOVING commit inside the range
        // (delete / overwrite / replace) means the added-rows view is
        // not the whole story: fail loudly — same contract as the
        // streaming path — unless skipDeleteSnapshots opted in.
        // Rewrites move bytes, not data, and are skipped silently.
        val inRange = t.metadata.snapshots
          .filter(s => s.id > from && s.id <= to)
        val destructive = inRange.filter(s =>
          s.operation != "append" && s.operation != "upsert" &&
            !LakeTable.isByteMove(s.operation))
        if (destructive.nonEmpty && !skipDeleteSnapshots)
          throw new IllegalStateException(
            s"incremental read of $db.$tbl ($from, $to] hit " +
              "row-removing snapshot(s) " +
              destructive.map(s => s"${s.id}(${s.operation})")
                .mkString(", ") +
              ": their retractions cannot be expressed as added rows — " +
              "use the changelog for CDC, or set " +
              "option(\"skipDeleteSnapshots\", \"true\") to read only " +
              "the range's added rows.")
        val files = inRange
          .filter(s => s.operation == "append" || s.operation == "upsert")
          .flatMap(_.files)
        (t, LakeTable.matchingFiles(files, target, Map.empty, statsFilters,
          t.metadata.schemaOpt),
          Map.empty[String, graft.lake.DeleteSet],
          Seq.empty[graft.lake.EqDeleteMeta])
      case None => plannedFull(t)
    }
  }

  private def plannedFull(t: LakeTable) = {
    branchName match {
      case Some(b) =>
        // branch overlay: main AS OF the fork base plus the branch's
        // own (staged) commits — same view LakeTable.readBranch serves
        val ref = t.metadata.refs.getOrElse(b,
          throw new IllegalArgumentException(s"no branch '$b'"))
        val base = ref.baseSnapshotId.getOrElse(
          throw new IllegalArgumentException(s"'$b' is not a writable branch"))
        val visible = t.metadata.snapshots.filter(_.id <= base)
        val marker = s"branch:$b"
        val branchSnaps = t.metadata.staged
          .filter(_.wapId.contains(marker))
        // branch commits re-sequence above the fork base so the view
        // equals the post-publish state — see LakeTable.readBranch
        val (overlay, branchEqs) =
          LakeTable.resequenceOverlay(base, branchSnaps)
        // staged copy-on-write commits rewrote files inside the branch:
        // drop their inputs, mirroring LakeTable.readBranch exactly
        val cowRemoved = branchSnaps.flatMap(_.removedPaths)
          .map(LakeTable.normalizePath).toSet
        (t, LakeTable.matchingFiles(
          (LakeTable.liveFiles(visible, Map.empty, target, statsFilters) ++
            overlay)
            .filterNot(f => cowRemoved(LakeTable.normalizePath(f.path))),
          target, Map.empty, statsFilters,
          t.metadata.schemaOpt), LakeTable.liveDeletes(visible),
          LakeTable.liveEqDeletes(visible) ++ branchEqs)
      case None =>
        val visible = LakeSource.visibleSnapshots(t, asOfSnapshot)
        (t, LakeTable.matchingFiles(
          LakeTable.liveFiles(visible, Map.empty, target, statsFilters),
          target, Map.empty, statsFilters,
          t.metadata.schemaOpt), LakeTable.liveDeletes(visible),
          LakeTable.liveEqDeletes(visible))
    }
  }

  /** Equality batches applicable to `f` (batch seq > file seq), with
    * key columns resolved by field id against the read-time schema —
    * the reader filters matching rows out (Iceberg's DeleteFilter).
    * Resolution runs against the PINNED as-of schema (the schema that
    * was current at the read's snapshot), matching LakeTable.readFiles:
    * a VERSION AS OF read of a state whose then-live key column was
    * later dropped is well-defined and must not fail against the
    * current schema.
    */
  private def eqBatchesFor(f: graft.lake.DataFileMeta): Seq[LakeEqBatch] = {
    lazy val schema: StructType = {
      val md = planned._1.metadata
      asOfSnapshot.flatMap(sid => md.snapshots.find(_.id == sid))
        .map(sn => md.schemaById(sn.schemaId))
        .getOrElse(md.currentSchema)
    }
    planned._4.filter(_.seq > f.seq).map { b =>
      LakeEqBatch(b.paths, StructType(b.fieldIds.map { id =>
        // the id may live nested in a struct — ship the LEAF field
        // (type + id metadata); the reader re-resolves the file-side
        // chain by id
        LakeTable.structPathOfId(schema, id).map(_._2)
          .getOrElse(throw new IllegalStateException(
            s"equality-delete key field id $id not in read schema"))
      }))
    }
  }

  private def deletePathsFor(f: graft.lake.DataFileMeta): Seq[String] =
    planned._3.get(LakeTable.normalizePath(f.path))
      .map(_.paths).getOrElse(Seq.empty)

  private def dvFor(f: graft.lake.DataFileMeta): Option[(String, Long, Long)] =
    planned._3.get(LakeTable.normalizePath(f.path)).flatMap(_.dv)
      .map(d => (d.dvPath, d.offset, d.length))

  /** Storage-partitioned join support: when every live file sits under
    * the current partition spec, every transform is identity (exactly
    * parseable source types) or a time transform over a wall-clock
    * source, and the source columns survive column pruning, the scan
    * reports KeyGroupedPartitioning over those transforms and every
    * input partition carries its partition key. Two lake tables
    * partitioned the same way then join with ZERO shuffle (Spark
    * groups the file tasks by key on both sides; time transforms
    * resolve through the catalog's years/months/days/hours functions) —
    * at 100 TB this is the difference between a metadata-driven merge
    * and re-shuffling both tables.
    * Requires spark.sql.sources.v2.bucketing.enabled=true.
    */
  private lazy val keyedSpec
      : Option[Seq[(graft.lake.SpecField, StructField)]] = {
    val (t, files, _, _) = planned
    val spec = t.metadata.currentSpec
    def srcField(id: Int): Option[StructField] =
      target.fields.find(f => FieldIds.hasId(f) && FieldIds.idOf(f) == id)
    def usable(f: graft.lake.SpecField, sf: StructField): Boolean =
      f.transform match {
        case "identity" => LakeSource.partitionKeyParseable(sf.dataType)
        case "year" | "month" | "day" | "hour" =>
          sf.dataType == TimestampNTZType || sf.dataType == DateType
        case t if graft.lake.Transforms.truncateWidth(t).isDefined =>
          sf.dataType == IntegerType || sf.dataType == LongType ||
            sf.dataType == StringType
        case t => graft.lake.Transforms.bucketCount(t).isDefined
      }
    val cols = spec.fields.map(f => srcField(f.sourceFieldId).map(f -> _))
    if (aggResult.isEmpty && files.nonEmpty &&
        spec.fields.nonEmpty &&
        files.forall(_.specId == spec.id) &&
        cols.forall(_.isDefined) &&
        cols.flatten.forall { case (f, sf) =>
          usable(f, sf) && files.forall(_.partitionValues.contains(f.name))
        })
      Some(cols.flatten)
    else None
  }

  private def partitionKeyOf(f: graft.lake.DataFileMeta,
      spec: Seq[(graft.lake.SpecField, StructField)]): Array[Any] =
    spec.map { case (sf, col) =>
      val v = f.partitionValues(sf.name)
      sf.transform match {
        case "identity" => LakeSource.parsePartitionValue(col.dataType, v)
        case t if graft.lake.Transforms.bucketCount(t).isDefined => v.toInt
        case t if graft.lake.Transforms.truncateWidth(t).isDefined =>
          // truncate keeps the SOURCE type (floor / prefix), so the key
          // parses like an identity value of that type
          LakeSource.parsePartitionValue(col.dataType, v)
        case _ => // time transforms: the key IS the rendered string
          if (v == "__HIVE_DEFAULT_PARTITION__") null
          else UTF8String.fromString(v)
      }
    }.toArray

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyedSpec match {
      case Some(spec) =>
        import org.apache.spark.sql.connector.expressions.Expressions
        val keys = planned._2
          .map(f => partitionKeyOf(f, spec).toSeq).distinct.size
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            spec.map { case (f, col) =>
              f.transform match {
                case "identity" => Expressions.identity(col.name)
                case "year" => Expressions.years(col.name)
                case "month" => Expressions.months(col.name)
                case "day" => Expressions.days(col.name)
                case "hour" => Expressions.hours(col.name)
                case t if graft.lake.Transforms.truncateWidth(t).isDefined =>
                  // width-in-name single-arg form: SPJ only admits
                  // transforms with ONE reference child (see
                  // LakeFunctions), so truncate[16] reports as
                  // truncate_16(col)
                  Expressions.apply(
                    s"truncate_${graft.lake.Transforms.truncateWidth(t).get}",
                    org.apache.spark.sql.GraftPlanBridge.fieldRef(col.name))
                case t => Expressions.bucket(
                  graft.lake.Transforms.bucketCount(t).get, col.name)
              }
            }.toArray, keys)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  /** Per-partition ordering from the recorded write sort order: every
    * input partition is exactly one file, so a file written by a
    * `write.sort-order` clustered write IS a sorted partition
    * (ascending, nulls first — sortWithinPartitions' default). With
    * key-grouped partitioning reported above, a storage-partitioned
    * merge join then needs neither an Exchange nor a Sort — the whole
    * join is metadata-planned. Conservative: reported only when EVERY
    * live file carries the same recorded sort ids and they all survive
    * column pruning (merge-on-read position deletes drop rows in
    * place, preserving order).
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    val files = planned._2
    if (aggResult.nonEmpty || files.isEmpty) return Array.empty
    val ids = files.head.sortedByIds
    if (ids.isEmpty || !files.forall(_.sortedByIds == ids)) return Array.empty
    val names = ids.map(id => target.fields
      .find(f => FieldIds.hasId(f) && FieldIds.idOf(f) == id).map(_.name))
    if (names.exists(_.isEmpty)) return Array.empty
    names.flatten.map(n =>
      // verbatim reference, NOT Expressions.column: the latter PARSES
      // the name as a multipart identifier, so a column named "a.b" or
      // "order date" would break every read of the table
      Expressions.sort(org.apache.spark.sql.GraftPlanBridge.fieldRef(n),
        SortDirection.ASCENDING)).toArray
  }

  /** File-size/row statistics from metadata — this is what lets
    * Catalyst auto-broadcast a small lake table in a join without
    * scanning it first.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    if (aggResult.isDefined)
      // metadata-only aggregate scan emits exactly one tiny row — do
      // not report (or recompute) full-table stats for it
      new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(16L)
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.of(1L)
      }
    else new org.apache.spark.sql.connector.read.Statistics {
      private val files = planned._2
      private val deletedRows = files
        .flatMap(f => planned._3.get(LakeTable.normalizePath(f.path)))
        .map(_.rows).sum
      override def sizeInBytes(): java.util.OptionalLong =
        if (files.forall(_.bytes >= 0))
          java.util.OptionalLong.of(files.map(_.bytes).sum)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (files.forall(_.rows >= 0))
          java.util.OptionalLong.of(files.map(_.rows).sum - deletedRows)
        else java.util.OptionalLong.empty()
      // ANALYZE-computed ndv/null counts (LakeTable.analyze), resolved
      // by FIELD ID against the read schema so renames can't misbind —
      // this is what the cost-based optimizer joins plans on. Pinned
      // (VERSION/TIMESTAMP AS OF, branch) scans serve none: the stats
      // describe the CURRENT snapshot, not the pinned state.
      //
      // Staleness guard: snapshots landing after the ANALYZE drift the
      // true cardinalities, and a confident misestimate is WORSE for
      // the CBO than no estimate. The live-row ratio (now/analyzed)
      // decides: minor churn serves verbatim, moderate churn scales
      // ndv/null counts by the ratio (capped at the live row count),
      // and a table that churned beyond recognition (>8x growth, or
      // emptied) abstains entirely — never verbatim-stale.
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val out = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        if (asOfSnapshot.isDefined || branchName.isDefined) return out
        planned._1.metadata.tableStats.foreach { ts =>
          val snaps = planned._1.metadata.snapshots
          val headSnap = snaps.map(_.id).foldLeft(0L)(math.max)
          // table-level live rows (NOT this scan's pruned subset —
          // pruning is selectivity, not churn); metadata-only
          lazy val liveNow: Option[Long] = {
            val live = LakeTable.liveFiles(snaps)
            if (live.exists(_.rows < 0)) None
            else Some(live.map(_.rows).sum -
              LakeTable.liveDeletes(snaps).values.map(_.rows).sum)
          }
          val scale: Option[(Double, Long)] =
            if (ts.snapshotId == headSnap) Some((1.0, ts.rowCount))
            else liveNow match {
              case Some(now) if ts.rowCount > 0 && now > 0 =>
                val r = now.toDouble / ts.rowCount
                if (r >= 0.8 && r <= 1.25) Some((1.0, now))
                else if (r <= 8.0) Some((r, now))
                else None
              case _ => None
            }
          scale.foreach { case (k, now) =>
            val byId = ts.cols.map(c => c.fieldId -> c).toMap
            target.fields.foreach { tf =>
              if (FieldIds.hasId(tf)) byId.get(FieldIds.idOf(tf)).foreach {
                cs => out.put(
                  org.apache.spark.sql.connector.expressions.Expressions
                    .column(tf.name),
                  new org.apache.spark.sql.connector.read.colstats
                      .ColumnStatistics {
                    private def scaled(v: Long): Long =
                      math.min(math.ceil(v * k).toLong, now)
                    override def distinctCount(): java.util.OptionalLong =
                      java.util.OptionalLong.of(scaled(cs.ndv))
                    override def nullCount(): java.util.OptionalLong =
                      java.util.OptionalLong.of(scaled(cs.nullCount))
                  })
              }
            }
          }
        }
        out
      }
    }

  override def readSchema(): StructType =
    aggResult match {
      case Some((schema, _)) => schema
      case None => Reconcile.clean(target).asInstanceOf[StructType]
    }

  override def toBatch: Batch = if (changelogMode)
    throw new UnsupportedOperationException(
      "option(\"changelog\", \"true\") is a streaming read option — " +
        "for a batch changelog use CALL system.create_changelog_view")
  else if (aggResult.isDefined) new Batch {
    // metadata-only answer: one partition, one partial row, zero data
    // IO — the values were validated and captured at pushdown time
    def planInputPartitions(): Array[InputPartition] =
      Array(LakeAggPartition(aggResult.get._2))
    def createReaderFactory(): PartitionReaderFactory = new LakeReaderFactory
  } else new Batch {
    // the columnar decision is per-SCAN (Spark forbids mixing row and
    // columnar partitions in one scan): planInputPartitions stamps
    // "all clean vectorizable files?" into the shared holder —
    // supportsColumnar runs after planning, so it reads a set flag
    private val decision = new ColumnarDecision
    // live set resolved at partition-planning time so runtime filters
    // (applied to the scan after static planning) take effect
    def planInputPartitions(): Array[InputPartition] = {
      val (t, matched, _, _) = planned
      val files = LakeTable.matchingFiles(matched, target,
        Map.empty, runtimeRanges, t.metadata.schemaOpt)
      onPlanned(files) // row-level ops capture the replaced group here
      val ext = LakeSource.externalTest(t.location)
      val out: Array[InputPartition] = keyedSpec match {
        case Some(spec) => files.map(f => LakeKeyedFilePartition(f.path,
            t.metadata.schemaById(f.schemaId), target,
            partitionKeyOf(f, spec), deletePathsFor(f),
            eqBatchesFor(f), external = ext(f.path),
            dv = dvFor(f), firstRowId = f.firstRowId, fileSeq = f.seq,
            lineageMat = f.lineageCols,
            pushedRanges =
              if (rowLevelOp) Seq.empty
              else statsFilters ++ runtimeRanges)).toArray
        case None =>
          // LARGE-file byte-range splitting (Iceberg's
          // read.split.target-size): a multi-GB compacted/CTAS file
          // must not serialize into one task at 1000-executor scale.
          // Ranges are planned with ZERO footer IO — parquet's
          // midpoint rule assigns each row group to exactly one range
          // at read time. Position-consuming reads (MoR position
          // deletes, deletion vectors, meta/lineage columns) split
          // too: each range's reader starts its row counter at
          // [[LakeSource.splitStartRow]] (exact, derived from the
          // SAME range filter parquet applies), so compact-then-
          // delete files — the 100-TB lifecycle norm — stop being
          // one straggler task each. Only external bytes (foreign
          // encodings) keep one partition per file, and row-level op
          // scans keep file-granular groups (their filters select
          // FILES for rewrite, not records).
          // floor 4 KiB (a smaller value is a misconfiguration, and a
          // pathological one must not plan millions of partitions);
          // unparseable values fall back to the default rather than
          // failing every scan of the table
          val splitTarget: Long = t.metadata.properties
            .get("read.split.target-size")
            .flatMap(s => scala.util.Try(s.toLong).toOption)
            .map(math.max(_, 4096L))
            .getOrElse(128L * 1024 * 1024)
          files.flatMap { f =>
            val deletes = deletePathsFor(f)
            val eqs = eqBatchesFor(f)
            val dv = dvFor(f)
            val isExt = ext(f.path)
            val one = LakeFilePartition(f.path,
              t.metadata.schemaById(f.schemaId), target, deletes,
              eqs, external = isExt, dv = dv,
              firstRowId = f.firstRowId, fileSeq = f.seq,
              lineageMat = f.lineageCols,
              // pushed + runtime (DPP) ranges travel to the reader for
              // row-group skipping INSIDE surviving files; the reader
              // gates on position-independence before applying them.
              // NEVER for a row-level operation's scan: its filters
              // select GROUPS (files) — the rewrite must carry every
              // surviving file's non-matching rows, and a record-level
              // drop would silently delete them (caught by lake_sql_dml)
              pushedRanges =
                if (rowLevelOp) Seq.empty
                else statsFilters ++ runtimeRanges)
            if (rowLevelOp || isExt || f.bytes <= splitTarget)
              Seq(one)
            else {
              // cap the fan-out per file: a tiny configured target on
              // a huge file must widen its ranges, not flood the
              // planner with partitions
              val eff = math.max(splitTarget,
                (f.bytes + 8191) / 8192)
              val n = ((f.bytes + eff - 1) / eff).toInt
              (0 until n).map { i =>
                val st = i.toLong * eff
                one.copy(start = st,
                  length = math.min(eff, f.bytes - st))
              }
            }
          }.toArray
      }
      decision.allColumnar = LakeReaderFactory.allVectorizable(out)
      out
    }
    def createReaderFactory(): PartitionReaderFactory =
      new LakeReaderFactory(decision)
  }

  // dynamic file pruning: join-produced runtime filters (Spark's DPP
  // mechanism) re-prune the file list by min/max stats just before
  // execution — a selective dimension join then opens only the files
  // whose ranges cover the surviving keys
  @volatile private var runtimeRanges: Seq[graft.lake.RangeFilter] = Seq.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    target.fields.map(f => org.apache.spark.sql.connector.expressions
      .Expressions.column(f.name))

  override def filter(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    runtimeRanges = filters.toSeq.flatMap(LakeSource.filterToRanges)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LakeMicroBatchStream(wh, db, tbl, startSnapshot, target,
      maxSnapshotsPerTrigger, skipDeleteSnapshots, changelogMode)
}

private[sources] case class LakeOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

/** One equality-delete batch as shipped to a reader task: the key-file
  * paths plus the key columns (current-schema fields, field-id
  * metadata attached) in batch order — the parquet files store the
  * keys as `k<fieldId>` columns.
  */
private[sources] case class LakeEqBatch(paths: Seq[String],
    keyFields: StructType)

/** `emitOnlyDeleted` inverts the position-delete filter: the reader
  * emits ONLY the rows at deleted positions — the changelog stream's
  * full-row delete markers.
  */
/** `dv`: the file's deletion vector as (container path, offset,
  * length) — Iceberg v3's per-file bitmap replaces the `deletes`
  * parquet list when the table writes vectors; under
  * `emitOnlyDeleted` the planner passes the commit's DELTA blob so
  * changelog markers are exactly the newly-deleted rows.
  */
private[sources] case class LakeFilePartition(path: String,
    fileSchema: StructType, target: StructType,
    deletes: Seq[String] = Seq.empty,
    eqBatches: Seq[LakeEqBatch] = Seq.empty,
    emitOnlyDeleted: Boolean = false,
    external: Boolean = false,
    dv: Option[(String, Long, Long)] = None,
    firstRowId: Long = -1L,
    fileSeq: Long = -1L,
    lineageMat: Boolean = false,
    pushedRanges: Seq[graft.lake.RangeFilter] = Seq.empty,
    // byte-range split of a LARGE clean file (parquet's midpoint rule
    // assigns each row group to exactly one range): start=0/length=-1
    // reads the whole file; the planner only splits position-free
    // clean files, so row counters never see a partial file
    start: Long = 0L,
    length: Long = -1L)
    extends InputPartition

/** Equality-delete batch key files as changelog delete markers: each
  * record's key columns (stored as `k<fieldId>`) fill the matching
  * TOP-LEVEL target fields, everything else null — the batch never
  * knew the victim rows, only their keys.
  */
private[sources] case class LakeEqMarkerPartition(paths: Seq[String],
    keyFields: StructType, target: StructType) extends InputPartition

/** Wraps any row-producing partition with the three changelog columns
  * appended at fixed values. `target` is the full changelog schema the
  * scan serves; inner rows carry `target` minus the changelog columns,
  * in order.
  */
private[sources] case class LakeChangelogPartition(inner: InputPartition,
    changeType: String, ordinal: Int, snapshotId: Long,
    target: StructType) extends InputPartition

/** A file partition that knows its (identity-transform) partition key —
  * the HasPartitionKey half of the storage-partitioned-join contract:
  * Spark groups same-key partitions into one task and lines the tasks
  * up across the two join sides.
  */
private[sources] case class LakeKeyedFilePartition(path: String,
    fileSchema: StructType, target: StructType, key: Array[Any],
    deletes: Seq[String] = Seq.empty,
    eqBatches: Seq[LakeEqBatch] = Seq.empty,
    external: Boolean = false,
    dv: Option[(String, Long, Long)] = None,
    firstRowId: Long = -1L,
    fileSeq: Long = -1L,
    lineageMat: Boolean = false,
    pushedRanges: Seq[graft.lake.RangeFilter] = Seq.empty)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(key)
  /** The same read, minus the key (which only groups tasks — the
    * partition source columns live IN the data file): keyed partitions
    * read through the identical file readers, vectorized included.
    */
  def toFilePartition: LakeFilePartition =
    LakeFilePartition(path, fileSchema, target, deletes, eqBatches,
      external = external, dv = dv, firstRowId = firstRowId,
      fileSeq = fileSeq, lineageMat = lineageMat,
      pushedRanges = pushedRanges)
}

private[sources] case class LakeAggPartition(values: Array[Any])
    extends InputPartition

private[sources] class LakeMicroBatchStream(wh: String, db: String,
    tbl: String, startSnapshot: Long, target: StructType,
    maxSnapshotsPerTrigger: Option[Int] = None,
    skipDeleteSnapshots: Boolean = false,
    changelogMode: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // metadata is reloaded per call so a long-running stream sees commits
  // made through any other handle/process
  private def snapshots = LakeTable.load(wh, db, tbl).metadata.snapshots
  private def maxSnapshotId: Long =
    snapshots.map(_.id).foldLeft(startSnapshot)(math.max)

  // Trigger.AvailableNow: pin the end offset once so the query drains
  // to a fixed point and stops even if writers keep committing
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(maxSnapshotId)

  override def initialOffset(): Offset = LakeOffset(startSnapshot)
  override def latestOffset(): Offset =
    LakeOffset(availableNowCap.getOrElse(maxSnapshotId))
  // SupportsAdmissionControl (pulled in by SupportsTriggerAvailableNow):
  // without maxSnapshotsPerTrigger every batch drains to the latest
  // snapshot; with it, each micro-batch advances over at most N
  // snapshots (Iceberg's streaming-read rate limiting) — at scale one
  // trigger must not swallow an unbounded backlog of commits. Under
  // Trigger.AvailableNow the engine keeps scheduling batches until the
  // returned offset stops moving, so a capped stream still drains the
  // full backlog, N snapshots at a time, through ONE query.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val cap = availableNowCap.getOrElse(maxSnapshotId)
    maxSnapshotsPerTrigger match {
      case None => LakeOffset(cap)
      case Some(n) =>
        require(n > 0, s"maxSnapshotsPerTrigger must be > 0, got $n")
        val s = start.asInstanceOf[LakeOffset].snapshotId
        val next = snapshots.map(_.id).filter(id => id > s && id <= cap)
          .sorted.take(n)
        LakeOffset(next.lastOption.getOrElse(s))
    }
  }
  override def deserializeOffset(json: String): Offset =
    LakeOffset(json.toLong)

  /** A micro-batch delivers the rows ADDED in (start, end] — appends
    * and upserts, mirroring `changesBetween` (an upsert's data files
    * are its inserted row versions; the paired equality deletes retract
    * prior versions, which an append-only stream cannot express).
    * Rewrites move bytes, not data, and are skipped silently. Anything
    * that removes or replaces rows (delete / overwrite / replace) makes
    * the stream's history unrepresentable: fail loudly — the offset
    * must not advance past data loss — unless the user opted in with
    * `skipDeleteSnapshots=true` (Iceberg's streaming-skip-delete /
    * skip-overwrite semantics).
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[LakeOffset].snapshotId,
      end.asInstanceOf[LakeOffset].snapshotId)
    val md = LakeTable.load(wh, db, tbl).metadata
    val inRange = md.snapshots.filter(sn => sn.id > s && sn.id <= e)
    if (changelogMode) {
      decision.allColumnar = false // marker/wrapped partitions are row
      return planChangelogPartitions(md, inRange)
    }
    val destructive = inRange.filter(sn =>
      sn.operation != "append" && sn.operation != "upsert" &&
        !LakeTable.isByteMove(sn.operation))
    if (destructive.nonEmpty && !skipDeleteSnapshots)
      throw new IllegalStateException(
        s"streaming read of $db.$tbl hit non-append snapshot(s) " +
          destructive.map(sn => s"${sn.id}(${sn.operation})").mkString(", ") +
          ": a row-removing commit cannot be replayed as a stream of " +
          "inserts. Set option(\"skipDeleteSnapshots\", \"true\") to " +
          "skip them and stream only added rows.")
    val ext = LakeSource.externalTest(LakeTable.tableLocation(wh, db, tbl))
    val out: Array[InputPartition] = inRange
      .filter(sn => sn.operation == "append" || sn.operation == "upsert")
      .flatMap(sn => sn.files.map(f =>
        LakeFilePartition(f.path, md.schemaById(f.schemaId), target,
          external = ext(f.path))))
      .toArray
    // micro-batches execute sequentially (plan N → run N → plan N+1),
    // so one shared holder per stream is safe; changelog batches keep
    // the default false via their own partition types
    decision.allColumnar = LakeReaderFactory.allVectorizable(out)
    out
  }

  /** Changelog mode (`option("changelog", "true")`): each micro-batch
    * delivers `_change_type`-tagged rows for every snapshot in (start,
    * end] — full-row delete markers for position deletes, key-only
    * markers for equality batches, and the snapshots' added rows as
    * inserts — the streaming form of `LakeTable.changelogBetween`, so
    * delete-bearing histories STREAM instead of failing or skipping.
    * `_change_ordinal` is dense within the micro-batch; cross-batch
    * replay order is (_change_snapshot_id, deletes-before-inserts).
    * Copy-on-write commits still refuse (no row-level change info).
    */
  private def planChangelogPartitions(md: graft.lake.TableMetadata,
      inRange: Seq[graft.lake.SnapshotMeta]): Array[InputPartition] = {
    val bad = inRange.filterNot(sn =>
      Set("append", "upsert", "delete").contains(sn.operation) ||
        LakeTable.isByteMove(sn.operation))
    if (bad.nonEmpty) throw new IllegalStateException(
      s"changelog stream of $db.$tbl hit snapshot(s) " +
        bad.map(sn => s"${sn.id}(${sn.operation})").mkString(", ") +
        ": copy-on-write commits carry no row-level change information")
    val dataTarget = StructType(
      target.fields.filterNot(f => LakeSource.isChangelogCol(f.name)))
    val ext = LakeSource.externalTest(LakeTable.tableLocation(wh, db, tbl))
    inRange.filterNot(sn => LakeTable.isByteMove(sn.operation))
      .sortBy(_.id).zipWithIndex
      .flatMap { case (sn, ord) =>
        def wrap(p: InputPartition, typ: String): InputPartition =
          LakeChangelogPartition(p, typ, ord, sn.id, target)
        val pos: Seq[InputPartition] =
          if (sn.deletePaths.isEmpty && sn.dvs.isEmpty) Seq.empty
          else {
            val byPath = md.snapshots.filter(_.id <= sn.id)
              .flatMap(_.files)
              .map(f => LakeTable.normalizePath(f.path) -> f).toMap
            val affected = sn.deleteCounts.keySet
            val missing = affected.filterNot(byPath.contains)
            require(missing.isEmpty,
              s"changelog stream: snapshot ${sn.id}'s position deletes " +
                "reference data file(s) no longer in history (expired?): " +
                missing.toSeq.sorted.mkString(", "))
            // vector commit: each marker partition reads its file's
            // DELTA blob (exactly the rows this snapshot deleted)
            val deltaByPath = sn.dvs.map(d =>
              LakeTable.normalizePath(d.dataPath) ->
                ((d.dvPath, d.deltaOffset, d.deltaLength))).toMap
            affected.toSeq.sorted.flatMap(byPath.get).map(f =>
              LakeFilePartition(f.path, md.schemaById(f.schemaId),
                dataTarget, deletes = sn.deletePaths,
                emitOnlyDeleted = true, external = ext(f.path),
                dv = deltaByPath.get(LakeTable.normalizePath(f.path))))
          }
        val eq: Seq[InputPartition] = sn.eqDeletes.flatMap { b =>
          val keyFields = b.fieldIds.map { id =>
            val f = md.currentSchema.fields
              .find(f => FieldIds.hasId(f) && FieldIds.idOf(f) == id)
            f.getOrElse(throw new UnsupportedOperationException(
              s"changelog stream: equality-delete key field id $id is " +
                "not a top-level column of the current schema (nested " +
                "keys are batch-changelog-only — use " +
                "CALL create_changelog_view)"))
          }
          b.paths.map(p =>
            LakeEqMarkerPartition(Seq(p), StructType(keyFields), dataTarget))
        }
        val ins: Seq[InputPartition] = sn.files.map(f =>
          LakeFilePartition(f.path, md.schemaById(f.schemaId), dataTarget,
            external = ext(f.path)))
        (pos ++ eq).map(wrap(_, "delete")) ++ ins.map(wrap(_, "insert"))
      }.toArray
  }

  // per-stream columnar flag, stamped at each micro-batch's planning
  // (micro-batches run strictly plan-then-execute, one at a time)
  private val decision = new ColumnarDecision

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(decision)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] object LakeReaderFactory {
  /** A partition the VECTORIZED columnar path can serve: Spark's own
    * batch parquet decoder instead of the row-at-a-time Group
    * materializer — at 100 TB the decode cost of wide scans is the
    * hot path, and columnar batches keep downstream whole-stage
    * codegen in its vectorized form. Since r14 MERGE-ON-READ state
    * (position/vector/equality deletes) stays columnar too: the
    * deletes apply as a selection map on the decoded batch
    * ([[MorVectorizedLakeReader]]), so one file with live deletes no
    * longer demotes the whole scan to row mode. Remaining gates: no
    * changelog emission, no metadata / lineage columns
    * (position-derived values are per-ROW by construction), engine-
    * written files, and the (file, target) schema pair must map —
    * [[LakeVectorize.vectorSchema]] for clean files (renames by
    * field ID, legal widenings), [[BatchRowLakeReader.plan]] when
    * delete state needs equality-key columns re-requested.
    */
  def vectorizable(p: LakeFilePartition): Boolean =
    !sys.props.contains("graft.read.novector") &&
      !p.emitOnlyDeleted && !p.external &&
      !p.target.fieldNames.exists(LakeSource.isMetaCol) &&
      (if (p.deletes.isEmpty && p.eqBatches.isEmpty && p.dv.isEmpty)
         LakeVectorize.vectorSchema(p.target, p.fileSchema).isDefined
       else BatchRowLakeReader.plan(p).isDefined)

  /** The per-scan uniform decision [[LakeReaderFactory]] needs. Keyed
    * partitions (partitioned tables — the NORMAL state at 100 TB)
    * vectorize like plain file partitions: the key only groups tasks.
    */
  def allVectorizable(ps: Array[InputPartition]): Boolean =
    ps.nonEmpty && ps.forall {
      case fp: LakeFilePartition => vectorizable(fp)
      case kp: LakeKeyedFilePartition => vectorizable(kp.toFilePartition)
      case _ => false
    }
}

/** The per-scan columnar flag, shared between the Batch (which sets it
  * at partition-planning time) and the reader factory (which answers
  * supportColumnarReads from it). A dedicated serializable holder — a
  * closure over the Batch would drag the whole non-serializable scan
  * into the factory's executor-bound object graph. The driver always
  * plans partitions before asking supportsColumnar, so the flag is set
  * before it is read; executors receive a post-decision snapshot.
  */
private[sources] class ColumnarDecision extends Serializable {
  @volatile var allColumnar: Boolean = false
}

private[sources] class LakeReaderFactory(
    decision: ColumnarDecision = new ColumnarDecision)
    extends PartitionReaderFactory {

  /** Per-SCAN columnar decision, not per-partition: Spark's
    * DataSourceV2ScanExecBase.supportsColumnar REQUIRES every
    * partition of one scan to agree ("Cannot mix row-based and
    * columnar input partitions"), so the batch that planned the
    * partitions passes a thunk answering "is EVERY planned partition
    * a vectorizable clean file?". Mixed or MoR-bearing scans run
    * whole-scan row mode; metadata/agg/streaming factories keep the
    * default always-false thunk.
    */
  override def supportColumnarReads(p: InputPartition): Boolean =
    decision.allColumnar

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    def mk(fp: LakeFilePartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
      if (fp.deletes.isEmpty && fp.eqBatches.isEmpty && fp.dv.isEmpty)
        new VectorizedLakeReader(fp)
      else new MorVectorizedLakeReader(fp,
        BatchRowLakeReader.plan(fp).getOrElse(throw new IllegalStateException(
          s"columnar MoR read planned for an unmappable pair " +
            s"(file ${fp.path}) — LakeReaderFactory gate out of sync")))
    partition match {
      case fp: LakeFilePartition => mk(fp)
      case kp: LakeKeyedFilePartition => mk(kp.toFilePartition)
      case other => throw new UnsupportedOperationException(
        s"no columnar reader for $other")
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case LakeAggPartition(values) => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = !emitted && { emitted = true; true }
        override def get(): InternalRow = new GenericInternalRow(values)
        override def close(): Unit = ()
      }
      case p: LakeFilePartition =>
        BatchRowLakeReader.plan(p) match {
          case Some(pl) => new BatchRowLakeReader(p, pl)
          case None => new GroupRowReader(p)
        }
      case p: LakeKeyedFilePartition =>
        val fp = p.toFilePartition
        BatchRowLakeReader.plan(fp) match {
          case Some(pl) => new BatchRowLakeReader(fp, pl)
          case None => new GroupRowReader(fp)
        }
      case p: LakeEqMarkerPartition => new EqMarkerReader(p)
      case p: LakeChangelogPartition =>
        val innerReader = createReader(p.inner)
        // pad the inner row out to the changelog schema: changelog
        // columns take the partition's constants, everything else
        // copies through in order
        val typeUtf = UTF8String.fromString(p.changeType)
        val fill: Array[Either[Any, (Int, DataType)]] = {
          var innerIdx = -1
          p.target.fields.map { f =>
            if (f.name == LakeSource.ChangeTypeCol) Left(typeUtf)
            else if (f.name == LakeSource.ChangeOrdinalCol) Left(p.ordinal)
            else if (f.name == LakeSource.ChangeSnapshotCol)
              Left(p.snapshotId)
            else { innerIdx += 1; Right((innerIdx, f.dataType)) }
          }
        }
        new PartitionReader[InternalRow] {
          override def next(): Boolean = innerReader.next()
          override def get(): InternalRow = {
            val in = innerReader.get()
            val arr = new Array[Any](fill.length)
            var i = 0
            while (i < fill.length) {
              arr(i) = fill(i) match {
                case Left(c) => c
                case Right((j, dt)) => in.get(j, dt)
              }
              i += 1
            }
            new GenericInternalRow(arr)
          }
          override def close(): Unit = innerReader.close()
        }
    }
}

/** Changelog delete markers from equality-delete key files: one output
  * row per key tuple, key columns filled (physical-type-adaptive via
  * `eqKeyValue` — batches written before a type promotion still read),
  * all other columns null.
  */
private[sources] class EqMarkerReader(p: LakeEqMarkerPartition)
    extends PartitionReader[InternalRow] {
  private val keyByFieldId: Map[Int, StructField] =
    p.keyFields.fields.map(f => FieldIds.idOf(f) -> f).toMap
  private val fillers: Array[Group => Any] = p.target.fields.map { tf =>
    if (FieldIds.hasId(tf) && keyByFieldId.contains(FieldIds.idOf(tf))) {
      val id = FieldIds.idOf(tf)
      (g: Group) => LakeSource.eqKeyValue(g, s"k$id", tf.dataType)
    } else (_: Group) => null
  }
  private val files = p.paths.iterator
  private var reader: ParquetReader[Group] = _
  private var cur: Group = _
  override def next(): Boolean = {
    cur = if (reader == null) null else reader.read()
    while (cur == null && files.hasNext) {
      if (reader != null) reader.close()
      reader = ParquetReader.builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(files.next())).build()
      cur = reader.read()
    }
    cur != null
  }
  override def get(): InternalRow =
    new GenericInternalRow(fillers.map(_(cur)))
  override def close(): Unit = if (reader != null) reader.close()
}

/** Decides whether the vectorized batch path can serve a (target,
  * file) schema pair, and builds the requested read schema for it:
  * the TARGET schema rewritten recursively to the file's physical
  * field names (matched by field ID — rename-safe), keeping the
  * TARGET types. Spark 4's vectorized parquet updaters perform the
  * engine's legal promotions in place (IntegerToLongUpdater,
  * FloatToDoubleUpdater, decimal precision widening at equal scale —
  * the same set SchemaDiff.promotionAllowed admits), and the reader
  * null-fills requested fields absent from the file — so one
  * requested schema yields batches already in target shape with no
  * per-row reconcile. Returns None when the pair still needs the
  * row path:
  *  - a non-widening type change anywhere, or a map-KEY change
  *  - a target field with no field ID (synthetic)
  *  - an absent field with a recorded initial DEFAULT anywhere in its
  *    subtree (the batch reader null-fills where the row path fills
  *    the default)
  *  - an absent field whose target name collides case-insensitively
  *    with a file field's physical name at the same level (the
  *    name-based clip would bind the WRONG column — rename-swap)
  */
private[sources] object LakeVectorize {
  import graft.schema.{Defaults, FieldIds}

  /** The engine's legal in-place widenings (CLEANED types in, CLEANED
    * out) — exactly what Spark's vectorized updaters perform.
    */
  private[sources] def widens(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if a == b => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) =>
        d2.precision >= d1.precision && d1.scale == d2.scale
      case _ => false
    }

  // generic recursion through ANY nesting (array<array<struct>>, map
  // keys included) — a default recorded anywhere in the subtree gates
  // the null-filling batch path off, exactly as the doc promises
  private def noDefaultsDeep(dt: DataType): Boolean = dt match {
    case st: StructType => st.fields.forall(noDefaultsIn)
    case ArrayType(e, _) => noDefaultsDeep(e)
    case MapType(k, v, _) => noDefaultsDeep(k) && noDefaultsDeep(v)
    case _ => true
  }

  private def noDefaultsIn(f: StructField): Boolean =
    Defaults.of(f).isEmpty && noDefaultsDeep(f.dataType)

  private def mapType(t: DataType, f: DataType): Option[DataType] =
    (t, f) match {
      case (ts: StructType, fs: StructType) => mapStruct(ts, fs)
      case (ArrayType(te, _), ArrayType(fe, _)) =>
        mapType(te, fe).map(ArrayType(_, containsNull = true))
      case (MapType(tk, tv, _), MapType(fk, fv, _))
          if Reconcile.clean(tk) == Reconcile.clean(fk) =>
        mapType(tv, fv).map(MapType(Reconcile.clean(tk), _,
          valueContainsNull = true))
      case (a, b) if widens(Reconcile.clean(b), Reconcile.clean(a)) =>
        Some(Reconcile.clean(a))
      case _ => None
    }

  private def mapStruct(target: StructType,
      file: StructType): Option[StructType] = {
    val out = target.fields.map { tf =>
      if (!FieldIds.hasId(tf)) return None
      val id = FieldIds.idOf(tf)
      file.fields.find(ff => FieldIds.hasId(ff) &&
          FieldIds.idOf(ff) == id) match {
        case Some(ff) =>
          mapType(tf.dataType, ff.dataType) match {
            case Some(dt) => StructField(ff.name, dt, nullable = true)
            case None => return None
          }
        case None =>
          // absent from the file: reader null-fills — legal only with
          // no recorded default and no physical-name collision (a
          // rename-swap would bind the wrong column by name)
          if (!noDefaultsIn(tf) ||
              file.fields.exists(_.name.equalsIgnoreCase(tf.name)))
            return None
          StructField(tf.name, Reconcile.clean(tf.dataType),
            nullable = true)
      }
    }
    Some(StructType(out))
  }

  /** The requested read schema for the pair, None = row path. */
  def vectorSchema(target: StructType,
      fileSchema: StructType): Option[StructType] =
    mapStruct(target, fileSchema)

  /** Pushed ranges rewritten to the file's PHYSICAL column names,
    * matched by field ID — a name-based lookup would bind the wrong
    * physical column under a rename-swap. Filters whose column has no
    * id-matched file field (added after the file was written) are
    * dropped: they cannot prune inside a file that predates them.
    */
  def renameRanges(ranges: Seq[graft.lake.RangeFilter], target: StructType,
      fileSchema: StructType): Seq[graft.lake.RangeFilter] =
    ranges.flatMap { r =>
      target.fields.find(tf => tf.name == r.column && FieldIds.hasId(tf))
        .flatMap(tf => fileSchema.fields.find(ff => FieldIds.hasId(ff) &&
          FieldIds.idOf(ff) == FieldIds.idOf(tf)))
        .map(ff => r.copy(column = ff.name))
    }

  /** Externally-registered files (add_files) vectorize only when
    * every registered column is FLAT and the footer stores it in the
    * one physical encoding the engine itself writes — the vectorized
    * updaters and the Group converter provably agree there. Anything
    * else (legacy INT96/MILLIS timestamps, unsigned ints, nested
    * columns, exotic annotations) keeps the footer-reconciled Group
    * walk. `adjusted` is the registered schema already rewritten to
    * footer spellings with absent fields dropped.
    */
  def externalFlatStandard(
      footer: org.apache.parquet.schema.MessageType,
      adjusted: StructType): Boolean = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    def std(pt: org.apache.parquet.schema.PrimitiveType,
        dt: DataType): Boolean = {
      val ann = pt.getLogicalTypeAnnotation
      if (pt.isRepetition(org.apache.parquet.schema.Type.Repetition.REPEATED))
        return false
      dt match {
        case IntegerType => pt.getPrimitiveTypeName == INT32 &&
          (ann == null || ann == LogicalTypeAnnotation.intType(32, true))
        case LongType => pt.getPrimitiveTypeName == INT64 &&
          (ann == null || ann == LogicalTypeAnnotation.intType(64, true))
        case FloatType => pt.getPrimitiveTypeName == FLOAT && ann == null
        case DoubleType => pt.getPrimitiveTypeName == DOUBLE && ann == null
        case BooleanType => pt.getPrimitiveTypeName == BOOLEAN && ann == null
        case StringType => pt.getPrimitiveTypeName == BINARY &&
          ann == LogicalTypeAnnotation.stringType()
        case BinaryType => pt.getPrimitiveTypeName == BINARY && ann == null
        case DateType => pt.getPrimitiveTypeName == INT32 &&
          ann == LogicalTypeAnnotation.dateType()
        case TimestampType => pt.getPrimitiveTypeName == INT64 &&
          ann == LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS)
        case TimestampNTZType => pt.getPrimitiveTypeName == INT64 &&
          ann == LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS)
        case d: DecimalType => ann match {
          case dec: DecimalLogicalTypeAnnotation =>
            dec.getScale == d.scale && dec.getPrecision <= d.precision &&
              (pt.getPrimitiveTypeName == INT32 ||
                pt.getPrimitiveTypeName == INT64 ||
                pt.getPrimitiveTypeName == BINARY ||
                pt.getPrimitiveTypeName == FIXED_LEN_BYTE_ARRAY)
          case _ => false
        }
        case _ => false
      }
    }
    adjusted.fields.forall { f =>
      footer.containsField(f.name) && {
        val t = footer.getType(footer.getFieldIndex(f.name))
        t.isPrimitive && std(t.asPrimitiveType(), f.dataType)
      }
    }
  }

  /** A VectorizedParquetRecordReader over `path` decoding `requested`
    * (already rewritten to the file's physical names): batches when
    * `returnBatches`, else vectorized decode with row-at-a-time
    * emission — the mode Spark itself uses when a plan can't consume
    * batches. The conf keys mirror ParquetFileFormat.
    * buildReaderWithPartitionValues; rebase modes are CORRECTED — the
    * engine writes its own files that way.
    */
  def openReader(path: String, requested: StructType,
      pred: Option[org.apache.parquet.filter2.predicate.FilterPredicate],
      returnBatches: Boolean, start: Long = 0L, length: Long = -1L)
      : org.apache.spark.sql.execution.datasources
      .parquet.VectorizedParquetRecordReader = {
    import org.apache.spark.sql.internal.SQLConf
    val conf = graft.lake.HadoopConfs.mutable()
    conf.set(org.apache.spark.sql.execution.datasources.parquet
      .ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, requested.json)
    conf.set(SQLConf.PARQUET_BINARY_AS_STRING.key, "false")
    conf.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, "true")
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
    conf.set(SQLConf.CASE_SENSITIVE.key, "false")
    conf.set(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key, "false")
    // the 2-arg initialize resolves its ReadSupport from the conf —
    // without this key getReadSupportInstance NPEs on every scan
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet
        .ParquetReadSupport].getName)
    pred.foreach(fp => org.apache.parquet.hadoop.ParquetInputFormat
      .setFilterPredicate(conf, fp))
    val reader =
      new org.apache.spark.sql.execution.datasources.parquet
        .VectorizedParquetRecordReader(
          null, "CORRECTED", "UTC", "CORRECTED", "UTC",
          /* useOffHeap = */ false, /* capacity = */ 4096)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val len =
      if (length >= 0) length
      else java.nio.file.Files.size(java.nio.file.Paths.get(path))
    // mapred.FileSplit (it extends the mapreduce one): the reader base
    // downcasts to it internally
    val split = new org.apache.hadoop.mapred.FileSplit(
      hPath, start, len, Array.empty[String])
    val attempt = new org.apache.hadoop.mapreduce.task
      .TaskAttemptContextImpl(conf,
        new org.apache.hadoop.mapreduce.TaskAttemptID())
    reader.initialize(split, attempt)
    reader.initBatch(new StructType(), InternalRow.empty)
    if (returnBatches) reader.enableReturningBatches()
    reader
  }
}

/** The vectorized fast path: Spark's own batch parquet decoder over a
  * clean file (no MoR state, no meta columns — [[LakeReaderFactory]]
  * gates; renames and widening promotions are served HERE via the
  * [[LakeVectorize]] requested-schema mapping). Emits ColumnarBatches,
  * so downstream whole-stage codegen stays in its vectorized form;
  * pushed ranges go down as a parquet FilterPredicate for row-group /
  * page skipping (nothing positional is consumed here). The conf keys
  * mirror what ParquetFileFormat.buildReaderWithPartitionValues
  * stamps; rebase modes are CORRECTED — the engine writes its own
  * files that way.
  */
private[sources] class VectorizedLakeReader(p: LakeFilePartition)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  // target rewritten to the file's physical names by field ID, target
  // types kept (updaters widen in place) — gate guarantees it maps
  private val requested: StructType =
    LakeVectorize.vectorSchema(p.target, p.fileSchema).getOrElse(
      throw new IllegalStateException(
        s"vectorized read planned for an unmappable schema pair " +
          s"(file ${p.path}) — LakeReaderFactory gate out of sync"))

  private val reader = LakeVectorize.openReader(p.path, requested,
    // ranges arrive named by the TARGET schema; rewrite to the file's
    // physical names by field id (rename-safe) before translation
    LakeSource.parquetPredicate(
      LakeVectorize.renameRanges(p.pushedRanges, p.target, p.fileSchema),
      p.fileSchema, n => requested.fieldNames.contains(n)),
    returnBatches = true, start = p.start, length = p.length)

  override def next(): Boolean = reader.nextKeyValue()
  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
    reader.getCurrentValue
      .asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
  override def close(): Unit = reader.close()
}

/** Vectorized DECODE with row EMISSION — the mode Spark itself uses
  * when a plan can't consume batches: Spark's columnar parquet decoder
  * does the page/dictionary work in batches, and rows come off the
  * decoded vectors one at a time, so merge-on-read state (position
  * deletes, deletion vectors, equality batches), `_graft_pos`/lineage
  * metadata, and changelog delete markers all apply exactly as on the
  * Group walk — at a fraction of its per-record Group-assembly cost.
  * At 100 TB this removes the decode cliff for MoR-bearing tables
  * (the clean-file case goes fully columnar instead; see
  * [[VectorizedLakeReader]]). The requested schema reuses
  * [[LakeVectorize.vectorSchema]] (rename-safe by field ID, widenings
  * in place), extended with equality-delete key columns the
  * projection pruned and the materialized lineage columns.
  * Externally-registered files vectorize too when every column is
  * flat in the one physical encoding the engine writes
  * ([[LakeVectorize.externalFlatStandard]]); [[GroupRowReader]]
  * remains for exotic external encodings, unmappable schema pairs,
  * and nested/exotic equality keys.
  */
private[graft] object BatchRowLakeReader {

  /** Readers constructed since JVM start — test observability pinning
    * that MoR/meta reads actually take the vectorized-decode path
    * (local-mode tests share the JVM with executors).
    */
  val opened = new java.util.concurrent.atomic.AtomicLong

  /** Decode plan: the physical schema to request and where each
    * output / equality-key / lineage value sits in the decoded row.
    * None = stay on the Group walk.
    */
  final case class Plan(requested: StructType, srcIdx: Array[Int],
      eqIdx: Array[Array[Int]], eqTypes: Array[Array[DataType]],
      rowIdSrc: Int, lastUpdSrc: Int)

  def plan(p: LakeFilePartition): Option[Plan] = {
    if (sys.props.contains("graft.read.novector")) return None
    // externally-registered files: reconcile against the actual footer
    // (physical spellings, absent columns dropped — same first step as
    // the Group walk) and vectorize only when every column is flat in
    // the ONE encoding the engine itself writes; anything exotic keeps
    // the Group walk. The footer read happens HERE, executor-side —
    // the Group walk pays the identical read for externals
    val fileSchema: StructType =
      if (!p.external) p.fileSchema
      else LakeSource.readFooterSchema(p.path) match {
        case Some(ft) =>
          val adj = LakeSource.reconcileToFooter(p.fileSchema, ft)
          if (LakeVectorize.externalFlatStandard(ft, adj)) adj
          else return None
        case None => return None
      }
    val dataFields = p.target.fields.filterNot(tf =>
      LakeSource.isMetaCol(tf.name))
    val base = LakeVectorize.vectorSchema(StructType(dataFields),
      fileSchema) match {
      case Some(b) => b
      case None => return None
    }
    val fields = scala.collection.mutable.ArrayBuffer(base.fields: _*)
    // target-field id → decoded-row index (data fields first, then
    // appended equality-key / lineage columns)
    val idToIdx = scala.collection.mutable.HashMap.empty[Int, Int]
    dataFields.zipWithIndex.foreach { case (tf, i) =>
      idToIdx(FieldIds.idOf(tf)) = i
    }
    // equality-delete keys: reuse the projected column when the target
    // still carries it; else request the file's TOP-LEVEL column AS
    // the key's (current-schema) type — the vectorized updater widens
    // exactly like eqKeyValue's int→long conversion. Nested keys and
    // non-widening shapes stay on the Group walk.
    val eqIdx = new Array[Array[Int]](p.eqBatches.length)
    val eqTypes = new Array[Array[DataType]](p.eqBatches.length)
    var bi = 0
    p.eqBatches.foreach { b =>
      val idxs = new Array[Int](b.keyFields.fields.length)
      val types = new Array[DataType](b.keyFields.fields.length)
      var ki = 0
      b.keyFields.fields.foreach { kf =>
        val id = FieldIds.idOf(kf)
        val kt = Reconcile.clean(kf.dataType)
        idToIdx.get(id) match {
          case Some(i) =>
            if (Reconcile.clean(fields(i).dataType) != kt) return None
            idxs(ki) = i
          case None =>
            fileSchema.fields.find(ff => FieldIds.hasId(ff) &&
                FieldIds.idOf(ff) == id) match {
              case Some(ff)
                  if LakeVectorize.widens(
                    Reconcile.clean(ff.dataType), kt) =>
                fields += StructField(ff.name, kt, nullable = true)
                idToIdx(id) = fields.length - 1
                idxs(ki) = fields.length - 1
              case _ => return None
            }
        }
        types(ki) = kt
        ki += 1
      }
      eqIdx(bi) = idxs; eqTypes(bi) = types; bi += 1
    }
    // materialized v3 lineage columns (physical-only, outside the
    // registered schema): request them when the scan asks for lineage
    // metadata — a file that predates them null-fills, matching the
    // Group walk's containsField fallback
    var rowIdSrc = -1; var lastUpdSrc = -1
    if (p.lineageMat && p.target.fieldNames.exists(n =>
        n == LakeSource.RowIdMetaCol || n == LakeSource.LastUpdMetaCol)) {
      fields += StructField(LakeSource.RowIdMetaCol, LongType,
        nullable = true)
      rowIdSrc = fields.length - 1
      fields += StructField(LakeSource.LastUpdMetaCol, LongType,
        nullable = true)
      lastUpdSrc = fields.length - 1
    }
    // a requested-name collision would make the name-based clip bind
    // the wrong column; an empty request has nothing to drive the
    // row count — both are Group-walk territory
    val names = fields.map(_.name.toLowerCase(java.util.Locale.ROOT))
    if (fields.isEmpty || names.distinct.size != names.size) return None
    var di = -1
    val srcIdx = p.target.fields.map { tf =>
      if (LakeSource.isMetaCol(tf.name)) -1 else { di += 1; di }
    }
    Some(Plan(StructType(fields.toSeq), srcIdx, eqIdx, eqTypes,
      rowIdSrc, lastUpdSrc))
  }
}

private[sources] class BatchRowLakeReader(p: LakeFilePartition,
    plan: BatchRowLakeReader.Plan) extends PartitionReader[InternalRow] {
  BatchRowLakeReader.opened.incrementAndGet()

  // ROW-GROUP + record-level predicate skipping ONLY when the read is
  // position-independent — same gate as the Group walk: the position
  // counter below must see every physical row, and external files are
  // excluded from predicates entirely. (A position-free clean
  // partition lands here only inside a MIXED scan that dropped to row
  // mode as a whole.)
  private val positionFree = p.deletes.isEmpty && p.dv.isEmpty &&
    !p.emitOnlyDeleted && !p.external &&
    !p.target.fieldNames.exists(n => n == LakeSource.PosMetaCol ||
      n == LakeSource.RowIdMetaCol || n == LakeSource.LastUpdMetaCol)

  private val reader = LakeVectorize.openReader(p.path, plan.requested,
    if (!positionFree || p.pushedRanges.isEmpty) None
    else LakeSource.parquetPredicate(
      LakeVectorize.renameRanges(p.pushedRanges, p.target, p.fileSchema),
      p.fileSchema, n => plan.requested.fieldNames.contains(n)),
    returnBatches = false, start = p.start, length = p.length)

  private val srcTypes: Array[DataType] =
    plan.requested.fields.map(_.dataType)
  private val filePathUtf = UTF8String.fromString(
    LakeTable.normalizePath(p.path))
  private val fileIdx = p.target.fieldNames.indexOf(LakeSource.FileMetaCol)
  private val posIdx = p.target.fieldNames.indexOf(LakeSource.PosMetaCol)
  private val rowIdIdx = p.target.fieldNames.indexOf(LakeSource.RowIdMetaCol)
  private val lastUpdIdx =
    p.target.fieldNames.indexOf(LakeSource.LastUpdMetaCol)

  private val deletedPos: java.util.HashSet[java.lang.Long] =
    LakeSource.loadDeletedPositions(p.deletes, p.path)
  private val deletedBm: org.roaringbitmap.longlong.Roaring64Bitmap =
    p.dv match {
      case Some((path, off, len)) =>
        graft.lake.DeletionVectors.cached(path, off, len)
      case None => null
    }
  private def deletedAt(at: Long): Boolean =
    (deletedBm != null && deletedBm.contains(at)) ||
      (deletedPos != null && deletedPos.contains(at))

  private val eqSets = p.eqBatches.map(EqBatchCache.get).toArray
  private val eqProbes: Array[java.util.ArrayList[Any]] =
    plan.eqIdx.map(ix => new java.util.ArrayList[Any](ix.length))

  private def eqDeleted(r: InternalRow): Boolean = {
    var i = 0
    while (i < eqSets.length) {
      val idxs = plan.eqIdx(i)
      val types = plan.eqTypes(i)
      val probe = eqProbes(i)
      probe.clear()
      var j = 0
      while (j < idxs.length) {
        probe.add(if (r.isNullAt(idxs(j))) null else r.get(idxs(j), types(j)))
        j += 1
      }
      if (eqSets(i).contains(probe)) return true
      i += 1
    }
    false
  }

  // decoded values may reference the (reused) column vectors — copy
  // anything buffer-backed before it leaves the reader, exactly what
  // ColumnarBatchRow.copy() would do, minus the fields we drop
  private def copyVal(v: Any): Any = v match {
    case null => null
    case s: UTF8String => s.clone()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case r: InternalRow => r.copy()
    case b: Array[Byte] => java.util.Arrays.copyOf(b, b.length)
    case other => other
  }

  private def matLongAt(r: InternalRow, src: Int): java.lang.Long =
    if (src >= 0 && !r.isNullAt(src)) java.lang.Long.valueOf(r.getLong(src))
    else null

  private var cur: InternalRow = _
  // byte-range split of a position-consuming read: the counter starts
  // at the file-absolute index of the split's first row (exact — same
  // range filter parquet itself applies), so position deletes / DV /
  // meta / inherited lineage stay correct per split
  private var pos: Long =
    (if (!positionFree && p.start > 0L)
       LakeSource.splitStartRow(p.path, p.start, p.length)
     else 0L) - 1L

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      pos += 1
      val r = reader.getCurrentValue.asInstanceOf[InternalRow]
      if (p.emitOnlyDeleted) {
        // changelog delete markers: keep ONLY deleted positions
        if (deletedAt(pos)) { cur = r; return true }
      } else if (!deletedAt(pos) &&
          (eqSets.length == 0 || !eqDeleted(r))) {
        cur = r; return true
      }
    }
    false
  }

  override def get(): InternalRow = {
    val arr = new Array[Any](plan.srcIdx.length)
    var i = 0
    while (i < arr.length) {
      arr(i) =
        if (i == posIdx) pos
        else if (i == fileIdx) filePathUtf
        else if (i == rowIdIdx) {
          val mat = matLongAt(cur, plan.rowIdSrc)
          if (mat != null) mat.longValue()
          else if (p.firstRowId >= 0) p.firstRowId + pos
          else null
        } else if (i == lastUpdIdx) {
          val mat = matLongAt(cur, plan.lastUpdSrc)
          if (mat != null) mat.longValue()
          else if (p.fileSeq >= 0) p.fileSeq
          else null
        } else {
          val si = plan.srcIdx(i)
          if (si < 0) null // an unrecognized meta column reads null
          else if (cur.isNullAt(si)) null
          else copyVal(cur.get(si, srcTypes(si)))
        }
      i += 1
    }
    new GenericInternalRow(arr)
  }

  override def close(): Unit = reader.close()
}

/** Reads one parquet data file as example-Groups and reconciles each
  * record to the target schema by field ID (promotions int→long,
  * float→double included) — the executor-side mirror of
  * `Reconcile.projection`, minus Catalyst. Since r13 this is the
  * FALLBACK walk (exotic external encodings, unmappable schema
  * pairs, nested equality keys, absent-with-DEFAULT columns) —
  * everything else decodes through [[BatchRowLakeReader]]'s
  * vectorized path or the fully columnar [[VectorizedLakeReader]].
  */
private[sources] class GroupRowReader(p: LakeFilePartition)
    extends PartitionReader[InternalRow] {

  private def openFooter(): Option[org.apache.parquet.schema.MessageType] =
    LakeSource.readFooterSchema(p.path)

  // The registered file schema names columns the way the ENGINE named
  // them at write/registration time. An EXTERNALLY-registered file
  // (add_files) may spell the same columns with different case, or lack
  // a nullable table column entirely — both legal at registration
  // (validation is case-insensitive, absent columns read as null on the
  // Spark-native path). Reconcile ONCE against the file's actual footer
  // schema: names are rewritten to the footer's physical spelling
  // (case-insensitive, recursively through structs) and absent fields
  // dropped, so the by-id extractor falls back to the default/null
  // extractor instead of crashing the exact-name Group lookup with
  // parquet's InvalidRecordException. Engine-written files match their
  // registered schema by construction and SKIP the extra footer read —
  // at scale that is one metadata IO per file per scan saved on the
  // hot path (the pruning branch below reuses this handle when both
  // run).
  private val footerSchema: Option[org.apache.parquet.schema.MessageType] =
    if (p.external) openFooter() else None

  private val fileSchema: StructType = footerSchema
    .map(fs => LakeSource.reconcileToFooter(p.fileSchema, fs))
    .getOrElse(p.fileSchema)

  private val reader: ParquetReader[Group] = {
    // mutable copy: the pruning branch sets the requested read schema,
    // and concurrent readers must not see each other's projections
    val conf = graft.lake.HadoopConfs.mutable()
    // parquet-level column pruning: request only the file columns whose
    // field IDs the (possibly column-pruned) target still references —
    // other columns' pages are never decoded. The requested schema is a
    // subtree copy of the file's own footer schema, so it is compatible
    // by construction.
    // equality-delete key columns must stay readable even when the
    // projection pruned them — the filter needs their values. A key may
    // be struct-NESTED, so a top-level field survives pruning when ANY
    // id in its subtree is a key id (else the extractor would crash on
    // the pruned-away ancestor).
    val eqKeyIds = p.eqBatches
      .flatMap(_.keyFields.fields.map(FieldIds.idOf)).toSet
    // materialized lineage columns live OUTSIDE the registered schema
    // (physical-only, written by v3 rewrites) — keep them readable
    // when the scan asks for the lineage metadata columns
    val lineageKeep: Set[String] =
      if (p.lineageMat && p.target.fieldNames.exists(n =>
          n == LakeSource.RowIdMetaCol || n == LakeSource.LastUpdMetaCol))
        Set(LakeSource.RowIdMetaCol, LakeSource.LastUpdMetaCol)
      else Set.empty
    val keep = fileSchema.fields
      .filter(ff => p.target.fields.exists(tf =>
        FieldIds.hasId(tf) && FieldIds.idOf(tf) == FieldIds.idOf(ff)) ||
        FieldIds.flatten(StructType(Seq(ff))).exists { case (_, sf) =>
          FieldIds.hasId(sf) && eqKeyIds.contains(FieldIds.idOf(sf)) })
      .map(_.name).toSet ++ lineageKeep
    // prune against the FOOTER's field count (an external file can
    // carry extra columns the table never registered); engine files
    // only pay the footer read when the projection actually pruned
    if (keep.nonEmpty) {
      val full = footerSchema.orElse(
        if (keep.size < fileSchema.size) openFooter() else None)
      full.filter(_.getFieldCount > keep.size).foreach { fs =>
        try {
          val prunedFields = fs.getFields.asScala.filter(f => keep(f.getName))
          val pruned = new org.apache.parquet.schema.MessageType(
            fs.getName, prunedFields.asJava)
          conf.set(
            org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
            pruned.toString)
        } catch { case _: Exception => () } // fall back to full read
      }
    }
    // ROW-GROUP + record-level predicate skipping, ONLY when the read
    // is position-independent: the reader derives `_metadata.row_index`
    // / MoR delete positions / inherited row ids from a LINEAR row
    // counter, and a skipped row group (or filtered record) would
    // desynchronize it. Plain filtered scans — the dominant pattern —
    // qualify; anything positional keeps the full walk. External files
    // are excluded too (legacy INT96 timestamps compare differently).
    val positionFree = p.deletes.isEmpty && p.dv.isEmpty &&
      !p.emitOnlyDeleted && !p.external &&
      !p.target.fieldNames.exists(n => n == LakeSource.PosMetaCol ||
        n == LakeSource.RowIdMetaCol || n == LakeSource.LastUpdMetaCol)
    val pred =
      if (!positionFree || p.pushedRanges.isEmpty) None
      else LakeSource.parquetPredicate(p.pushedRanges, fileSchema,
        n => keep.isEmpty || keep(n))
    val b0 = ParquetReader
      .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(p.path))
      .withConf(conf)
    // byte-range split (planner splits only position-free clean files,
    // so the row counter below never sees a partial file)
    val b1 =
      if (p.length >= 0) b0.withFileRange(p.start, p.start + p.length)
      else b0
    pred.fold(b1)(fp => b1.withFilter(
      org.apache.parquet.filter2.compat.FilterCompat.get(fp))).build()
  }

  // per-target-field extractor, bound once: file field matched by id;
  // _graft_file is a per-partition constant and _graft_pos the row
  // counter (handled in get())
  private val filePathUtf = UTF8String.fromString(
    LakeTable.normalizePath(p.path))
  private val posIdx = p.target.fieldNames.indexOf(LakeSource.PosMetaCol)
  private val rowIdIdx = p.target.fieldNames.indexOf(LakeSource.RowIdMetaCol)
  private val lastUpdIdx =
    p.target.fieldNames.indexOf(LakeSource.LastUpdMetaCol)
  private val extractors: Array[Group => Any] =
    p.target.fields.map { tf =>
      if (tf.name == LakeSource.FileMetaCol) (_: Group) => filePathUtf
      else if (LakeSource.isMetaCol(tf.name)) (_: Group) => null
      else LakeSource.fieldExtractor(tf, fileSchema.fields.toSeq)
    }

  // v3 row lineage: materialized _graft_row_id / _graft_last_updated
  // cells win when the (rewritten) file physically carries them; null
  // cells and plain appends inherit firstRowId + position / the
  // file's data sequence (-1 = pre-lineage file -> null)
  private def matLong(g: Group, name: String): java.lang.Long =
    if (p.lineageMat && g.getType.containsField(name) &&
        g.getFieldRepetitionCount(name) > 0)
      java.lang.Long.valueOf(g.getLong(name, 0))
    else null

  private def rowIdAt(g: Group, at: Long): Any = {
    val mat = matLong(g, LakeSource.RowIdMetaCol)
    if (mat != null) mat.longValue()
    else if (p.firstRowId >= 0) p.firstRowId + at
    else null
  }

  private def lastUpdAt(g: Group): Any = {
    val mat = matLong(g, LakeSource.LastUpdMetaCol)
    if (mat != null) mat.longValue()
    else if (p.fileSeq >= 0) p.fileSeq
    else null
  }

  // merge-on-read: positions of this file deleted by live delete files.
  // The reader walks rows in physical order, so a simple position
  // counter matches the _metadata.row_index values captured at
  // delete-write time. (Scale note: a per-file set in memory — Iceberg
  // uses roaring bitmaps for the same structure.)
  private val deletedPos: java.util.HashSet[java.lang.Long] =
    LakeSource.loadDeletedPositions(p.deletes, p.path)

  // v3 deletion vector: the file's bitmap, loaded once per JVM from
  // the container blob (no per-partition delete-file scan at all —
  // the read amplification the vector model removes)
  private val deletedBm: org.roaringbitmap.longlong.Roaring64Bitmap =
    p.dv match {
      case Some((path, off, len)) =>
        graft.lake.DeletionVectors.cached(path, off, len)
      case None => null
    }

  private def deletedAt(at: Long): Boolean =
    (deletedBm != null && deletedBm.contains(at)) ||
      (deletedPos != null && deletedPos.contains(at))

  // equality deletes: per applicable batch, the key tuples as a hash
  // set (batches are upsert-sized — Iceberg's DeleteFilter keeps the
  // same in-memory structure) plus extractors that reconcile THIS
  // file's key columns to the batch's (current-schema) key types, so
  // an int-written file compares equal to a long-written key. The set
  // depends only on the (immutable) batch files, not the data file —
  // it loads once per executor via EqBatchCache, not once per
  // partition.
  private val eqFilters: Array[(Array[Group => Any],
      java.util.HashSet[java.util.ArrayList[Any]])] =
    p.eqBatches.map { b =>
      val extr = b.keyFields.fields.map(kf =>
        LakeSource.nestedFieldExtractor(kf, fileSchema))
      (extr, EqBatchCache.get(b))
    }.toArray

  // reusable probe per batch: refilled per row, zero allocation in the
  // innermost read loop (ArrayList equals/hashCode are element-wise)
  private val eqProbes: Array[java.util.ArrayList[Any]] =
    eqFilters.map(f => new java.util.ArrayList[Any](f._1.length))

  private def eqDeleted(g: Group): Boolean = {
    var i = 0
    while (i < eqFilters.length) {
      val (extr, set) = eqFilters(i)
      val probe = eqProbes(i)
      probe.clear()
      var j = 0
      while (j < extr.length) { probe.add(extr(j)(g)); j += 1 }
      if (set.contains(probe)) return true
      i += 1
    }
    false
  }

  private var cur: Group = _
  // split-local counter start: file-absolute index of the range's
  // first row (position deletes / DV / meta / lineage stay exact when
  // a delete-bearing large file splits into byte ranges)
  private var pos: Long = {
    val positional = p.deletes.nonEmpty || p.dv.nonEmpty ||
      p.emitOnlyDeleted || posIdx >= 0 || rowIdIdx >= 0 || lastUpdIdx >= 0
    (if (positional && p.start > 0L)
       LakeSource.splitStartRow(p.path, p.start, p.length)
     else 0L) - 1L
  }
  override def next(): Boolean = {
    cur = reader.read(); pos += 1
    if (p.emitOnlyDeleted) {
      // changelog delete markers: keep ONLY the rows at deleted
      // positions (the inverse of the normal merge-on-read filter)
      while (cur != null && !deletedAt(pos)) {
        cur = reader.read(); pos += 1
      }
    } else {
      while (cur != null &&
          (deletedAt(pos) ||
            (eqFilters.length > 0 && eqDeleted(cur)))) {
        cur = reader.read(); pos += 1
      }
    }
    cur != null
  }
  override def get(): InternalRow = {
    val arr = new Array[Any](extractors.length)
    var i = 0
    while (i < arr.length) {
      arr(i) =
        if (i == posIdx) pos
        else if (i == rowIdIdx) rowIdAt(cur, pos)
        else if (i == lastUpdIdx) lastUpdAt(cur)
        else extractors(i)(cur)
      i += 1
    }
    new GenericInternalRow(arr)
  }
  override def close(): Unit = reader.close()
}

/** Executor-wide cache of equality-delete key sets: batch files are
  * immutable once written (snapshot-id + uuid paths), so a set keyed
  * by (paths, key ids+types) can be shared across every data-file
  * partition of a scan — and across scans — instead of re-reading and
  * re-hashing the batch per partition (Iceberg caches its DeleteFilter
  * sets the same way). Size-bounded by a coarse clear: batches are
  * upsert-sized and compaction retires them, so the cache stays small
  * in steady state.
  */
private[sources] object EqBatchCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.HashSet[java.util.ArrayList[Any]]]()

  def get(b: LakeEqBatch): java.util.HashSet[java.util.ArrayList[Any]] = {
    val key = b.paths.mkString("|") + "#" +
      b.keyFields.fields.map(f =>
        s"${FieldIds.idOf(f)}:${f.dataType.simpleString}").mkString(",")
    val hit = cache.get(key)
    if (hit != null) return hit
    val set = new java.util.HashSet[java.util.ArrayList[Any]]()
    b.paths.foreach { path =>
      val r = ParquetReader.builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(path)).build()
      try {
        var g = r.read()
        while (g != null) {
          val tuple = new java.util.ArrayList[Any](b.keyFields.fields.length)
          b.keyFields.fields.foreach(kf =>
            tuple.add(LakeSource.eqKeyValue(g, s"k${FieldIds.idOf(kf)}",
              kf.dataType)))
          set.add(tuple)
          g = r.read()
        }
      } finally r.close()
    }
    if (cache.size > 64) cache.clear()
    cache.putIfAbsent(key, set)
    set
  }
}

private[graft] object LakeSource {

  /** Metadata column names: row identity as (data file, position),
    * plus the v3 row-lineage pair (same names as the materialized
    * parquet columns rewrites store, so SQL and storage agree).
    */
  val FileMetaCol = "_graft_file"
  val PosMetaCol = "_graft_pos"
  val RowIdMetaCol = "_graft_row_id"
  val LastUpdMetaCol = "_graft_last_updated"
  def isMetaCol(name: String): Boolean =
    name == FileMetaCol || name == PosMetaCol ||
      name == RowIdMetaCol || name == LastUpdMetaCol

  /** Changelog-mode columns (option("changelog", "true") on a stream
    * read): same names/semantics as `LakeTable.changelogBetween`.
    */
  val ChangeTypeCol = "_change_type"
  val ChangeOrdinalCol = "_change_ordinal"
  val ChangeSnapshotCol = "_change_snapshot_id"
  val changelogFields: Seq[StructField] = Seq(
    StructField(ChangeTypeCol, StringType, nullable = false),
    StructField(ChangeOrdinalCol, IntegerType, nullable = false),
    StructField(ChangeSnapshotCol, LongType, nullable = false))
  def isChangelogCol(name: String): Boolean =
    name == ChangeTypeCol || name == ChangeOrdinalCol ||
      name == ChangeSnapshotCol

  /** The changelog schema over `base`: every data column NULLABLE —
    * equality-delete markers carry only key columns, so a required
    * non-key column WILL be null in marker rows and the advertised
    * schema must say so (codegen trusts non-nullability).
    */
  def changelogSchema(base: StructType): StructType =
    StructType(base.fields.toSeq.map(_.copy(nullable = true)) ++
      changelogFields)

  /** Snapshot log truncated to an optional VERSION AS OF pin. */
  def visibleSnapshots(t: LakeTable,
      asOf: Option[Long]): Seq[graft.lake.SnapshotMeta] = asOf match {
    case Some(sid) =>
      require(t.metadata.snapshots.exists(_.id == sid),
        s"no snapshot $sid in ${t.location}")
      t.metadata.snapshots.filter(_.id <= sid)
    case None => t.metadata.snapshots
  }

  /** Identity-partition source types whose Hive dir-value strings can
    * be parsed back into exact internal values for HasPartitionKey.
    * Float/double/decimal/timestamp render through cast("string") whose
    * round-trip is not guaranteed bit-exact — those specs simply do not
    * report key-grouped partitioning.
    */
  def partitionKeyParseable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | BooleanType | DateType => true
    case _ => false
  }

  /** Hive dir value string → Catalyst internal value (identity
    * transform; `__HIVE_DEFAULT_PARTITION__` is a null source value).
    */
  def parsePartitionValue(dt: DataType, v: String): Any =
    if (v == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case IntegerType => v.toInt
      case LongType => v.toLong
      case StringType => UTF8String.fromString(v)
      case BooleanType => v.toBoolean
      case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
      case other => throw new IllegalArgumentException(
        s"unparseable partition value type $other")
    }

  /** INT96 parquet timestamp → epoch micros: 8 bytes little-endian
    * nanos-of-day + 4 bytes little-endian julian day.
    */
  def int96Micros(b: org.apache.parquet.io.api.Binary): Long = {
    val buf = b.toByteBuffer.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }

  /** Absolute row index (within the FILE) of the first row a
    * byte-range split emits — the exact starting value for the
    * position counters that drive MoR position deletes, deletion
    * vectors, `_graft_pos`, and inherited row lineage, so
    * delete-bearing large files can split instead of serializing into
    * one straggler task each (the compact-then-delete lifecycle makes
    * them the NORM at 100 TB). Parquet's midpoint rule (offset +
    * totalCompressedSize/2 ∈ [start, end)) assigns each row group to
    * exactly one covering range; rather than REPLICATE that rule — a
    * silent-drift hazard across parquet upgrades — this opens the
    * footer twice through parquet's own code: once unfiltered (every
    * row group, in file order) and once through the SAME range filter
    * the actual readers apply, then sums the row counts of the groups
    * strictly before the split's first surviving group. Two small
    * footer reads per split task, executor-side, zero planner IO.
    * A split whose range holds no row-group midpoint returns 0 — its
    * reader emits nothing, so the counter start is never observed.
    */
  def splitStartRow(path: String, start: Long, length: Long): Long = {
    if (start <= 0L) return 0L // leading split: nothing precedes it
    val conf = graft.lake.HadoopConfs.shared
    val hPath = new org.apache.hadoop.fs.Path(path)
    val in = HadoopInputFile.fromPath(hPath, conf)
    import org.apache.parquet.hadoop.ParquetFileReader
    val all = scala.util.Using.resource(ParquetFileReader.open(in)) {
      r => r.getRowGroups.asScala.toList.map(b =>
        (b.getStartingPos, b.getRowCount))
    }
    val mine = scala.util.Using.resource(new ParquetFileReader(in,
      org.apache.parquet.HadoopReadOptions.builder(conf, hPath)
        .withRange(start, start + length).build())) {
      r => r.getRowGroups.asScala.toList.map(_.getStartingPos)
    }
    mine.headOption match {
      case None => 0L
      case Some(firstPos) =>
        all.takeWhile(_._1 != firstPos).map(_._2).sum
    }
  }

  /** v1 source Filter → conservative min/max RangeFilter for stats
    * pruning (None when not convertible). In-lists — the shape
    * runtime/DPP filters arrive in — collapse to [min, max].
    */
  /** RangeFilters → one parquet `FilterPredicate`, for ROW-GROUP (and
    * record-level) skipping INSIDE files that survive the metadata
    * prune — at 100 TB a sorted 512 MB file holds dozens of row groups
    * and file-level pruning alone still decodes them all. Strictly
    * CONSERVATIVE: integral bounds ceil/floor exactly, string bounds
    * compare in parquet's unsigned-byte order (= UTF8String order),
    * and every unsupported shape (floats/doubles/decimals — binary
    * vs decimal rounding; dotted names — FilterApi would misparse
    * them as paths; null checks; non-primitive columns) contributes
    * NOTHING rather than a maybe-wrong bound. Sound alongside
    * record-level filtering because the predicate is a WEAKENING of
    * the residual filter Spark re-applies: any record parquet drops
    * fails the weak predicate, hence the exact one too. Callers must
    * only pass columns present in the REQUESTED read schema (parquet
    * record filtering assembles its filter columns).
    */
  def parquetPredicate(filters: Seq[graft.lake.RangeFilter],
      fileSchema: StructType, requested: String => Boolean)
      : Option[org.apache.parquet.filter2.predicate.FilterPredicate] = {
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.io.api.Binary
    def ceilL(b: BigDecimal): Option[Long] = {
      val v = b.setScale(0, BigDecimal.RoundingMode.CEILING)
      if (v < BigDecimal(Long.MinValue) || v > BigDecimal(Long.MaxValue))
        None
      else Some(v.toLong)
    }
    def floorL(b: BigDecimal): Option[Long] = {
      val v = b.setScale(0, BigDecimal.RoundingMode.FLOOR)
      if (v < BigDecimal(Long.MinValue) || v > BigDecimal(Long.MaxValue))
        None
      else Some(v.toLong)
    }
    def both(lo: Option[org.apache.parquet.filter2.predicate
          .FilterPredicate],
        hi: Option[org.apache.parquet.filter2.predicate.FilterPredicate])
        : Option[org.apache.parquet.filter2.predicate.FilterPredicate] =
      (lo, hi) match {
        case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
        case (a, b) => a.orElse(b)
      }
    // an exact IN-set beats the min/max envelope: the parquet
    // evaluator also consults dictionaries and column-index bloom
    // filters, so a point lookup skips row groups whose range covers
    // the key but whose dictionary lacks it. The cap is 10,000 (was
    // 100 through r13): a 1,000-key probe list — the normal shape of
    // a broadcast-join runtime filter — gets per-row-group dictionary
    // checks, not just the (usually vacuous) scattered-key envelope;
    // parquet evaluates large sets as hash probes per row group, so
    // cost stays O(|set|) per group. Past the cap the envelope still
    // applies. Any unparsable value falls back to the range envelope.
    def inSet[T <: Comparable[T]](vals: Seq[String],
        parse: String => T): Option[java.util.Set[T]] =
      if (vals.isEmpty || vals.size > 10000) None
      else try {
        val s = new java.util.HashSet[T]()
        vals.foreach(v => s.add(parse(v)))
        Some(s)
      } catch { case scala.util.control.NonFatal(_) => None }
    val preds = filters.flatMap { f =>
      if (f.column.contains(".") || !requested(f.column)) None
      else fileSchema.fields.find(_.name == f.column).flatMap { sf =>
        sf.dataType match {
          case LongType =>
            val c = FilterApi.longColumn(sf.name)
            inSet[java.lang.Long](f.eqSet,
              v => java.lang.Long.valueOf(v.toLong))
              .map(FilterApi.in(c, _))
              .orElse(both(
                f.loNum.flatMap(ceilL).map(v =>
                  FilterApi.gtEq(c, java.lang.Long.valueOf(v))),
                f.hiNum.flatMap(floorL).map(v =>
                  FilterApi.ltEq(c, java.lang.Long.valueOf(v)))))
          case TimestampType | TimestampNTZType =>
            val c = FilterApi.longColumn(sf.name)
            both(
              f.loNum.flatMap(ceilL).map(v =>
                FilterApi.gtEq(c, java.lang.Long.valueOf(v))),
              f.hiNum.flatMap(floorL).map(v =>
                FilterApi.ltEq(c, java.lang.Long.valueOf(v))))
          case IntegerType =>
            val c = FilterApi.intColumn(sf.name)
            inSet[java.lang.Integer](f.eqSet,
              v => java.lang.Integer.valueOf(v.toInt))
              .map(FilterApi.in(c, _))
              .orElse(both(
                f.loNum.flatMap(ceilL)
                  .filter(v => v >= Int.MinValue && v <= Int.MaxValue)
                  .map(v => FilterApi.gtEq(c,
                    java.lang.Integer.valueOf(v.toInt))),
                f.hiNum.flatMap(floorL)
                  .filter(v => v >= Int.MinValue && v <= Int.MaxValue)
                  .map(v => FilterApi.ltEq(c,
                    java.lang.Integer.valueOf(v.toInt)))))
          case StringType =>
            val c = FilterApi.binaryColumn(sf.name)
            inSet[Binary](f.eqSet, Binary.fromString)
              .map(FilterApi.in(c, _))
              .orElse(both(
                f.loStr.map(v => FilterApi.gtEq(c, Binary.fromString(v))),
                f.hiStr.map(v => FilterApi.ltEq(c, Binary.fromString(v)))))
          case _ => None
        }
      }
    }
    preds.reduceOption(FilterApi.and)
  }

  def filterToRanges(f: org.apache.spark.sql.sources.Filter)
      : Option[graft.lake.RangeFilter] = {
    import org.apache.spark.sql.sources._
    def num(v: Any): Option[BigDecimal] = v match {
      case d: java.lang.Double if d.isNaN || d.isInfinite => None
      case fl: java.lang.Float if fl.isNaN || fl.isInfinite => None
      case n: Number => Some(BigDecimal(n.toString))
      case t: java.sql.Timestamp =>
        // full microsecond precision: getTime carries millis, getNanos
        // the sub-second part (truncating would over-prune files)
        Some(BigDecimal(
          Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000))
      case _ => None
    }
    def str(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case _ => None
    }
    def range(col: String, lo: Option[Any], hi: Option[Any]) = {
      val (ln, hn) = (lo.flatMap(num), hi.flatMap(num))
      val (ls, hs) = (lo.flatMap(str), hi.flatMap(str))
      if (ln.isDefined || hn.isDefined || ls.isDefined || hs.isDefined)
        Some(graft.lake.RangeFilter(col, ln, hn, ls, hs))
      else None
    }
    f match {
      case EqualTo(c, v) => range(c, Some(v), Some(v))
      case EqualNullSafe(c, null) =>
        Some(graft.lake.RangeFilter(c, isNull = true))
      case EqualNullSafe(c, v) => range(c, Some(v), Some(v))
      case GreaterThan(c, v) => range(c, Some(v), None)
      case GreaterThanOrEqual(c, v) => range(c, Some(v), None)
      case LessThan(c, v) => range(c, None, Some(v))
      case LessThanOrEqual(c, v) => range(c, None, Some(v))
      case IsNull(c) => Some(graft.lake.RangeFilter(c, isNull = true))
      case IsNotNull(c) => Some(graft.lake.RangeFilter(c, notNull = true))
      case StringStartsWith(c, p) if p != null && p.nonEmpty =>
        // rows matching the prefix lie in [p, nextPrefix(p)): bound the
        // lexical range so min/max stats prune. The upper bound
        // increments the last incrementable code unit (chars at
        // Char.MaxValue drop off the end first); an un-incrementable
        // prefix gets only the lower bound — conservative, still prunes
        // files entirely below the prefix.
        val trimmed = p.reverse.dropWhile(_ == Char.MaxValue).reverse
        val hi =
          if (trimmed.isEmpty) None
          else Some(trimmed.init + (trimmed.last + 1).toChar)
        Some(graft.lake.RangeFilter(c, loStr = Some(p), hiStr = hi))
      case In(c, vs) if vs.nonEmpty =>
        // min/max envelope for range pruning, plus the exact value set
        // (canonical cast-to-string renderings) so bloom-equipped
        // files can drop unless they might hold SOME listed value;
        // eqSet stays empty unless every value canonicalizes —
        // probing must be all-or-nothing conservative
        val nums = vs.toSeq.map(num)
        val strs = vs.toSeq.map(str)
        if (nums.forall(_.isDefined)) {
          val canon = nums.flatten.flatMap(b =>
            scala.util.Try(b.toBigIntExact).toOption.flatten
              .map(_.toString))
          Some(graft.lake.RangeFilter(c,
            loNum = Some(nums.flatten.min), hiNum = Some(nums.flatten.max),
            eqSet = if (canon.size == vs.length) canon else Seq.empty))
        } else if (strs.forall(_.isDefined))
          Some(graft.lake.RangeFilter(c,
            loStr = Some(strs.flatten.min), hiStr = Some(strs.flatten.max),
            eqSet = strs.flatten))
        else None
      case _ => None
    }
  }

  /** v1 source Filter → Column, for SQL DELETE routing. */
  def filterToColumn(f: org.apache.spark.sql.sources.Filter)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => col(s"`$a`") === lit(v)
      case EqualNullSafe(a, v) => col(s"`$a`") <=> lit(v)
      case GreaterThan(a, v) => col(s"`$a`") > lit(v)
      case GreaterThanOrEqual(a, v) => col(s"`$a`") >= lit(v)
      case LessThan(a, v) => col(s"`$a`") < lit(v)
      case LessThanOrEqual(a, v) => col(s"`$a`") <= lit(v)
      case In(a, vs) => col(s"`$a`").isin(vs.toIndexedSeq.map(lit(_)): _*)
      case IsNull(a) => col(s"`$a`").isNull
      case IsNotNull(a) => col(s"`$a`").isNotNull
      case StringStartsWith(a, v) => col(s"`$a`").startsWith(v)
      case StringEndsWith(a, v) => col(s"`$a`").endsWith(v)
      case StringContains(a, v) => col(s"`$a`").contains(v)
      case And(l, r) => filterToColumn(l) && filterToColumn(r)
      case Or(l, r) => filterToColumn(l) || filterToColumn(r)
      case Not(c) => not(filterToColumn(c))
      case AlwaysTrue() => lit(true)
      case AlwaysFalse() => lit(false)
      case other => throw new UnsupportedOperationException(
        s"DELETE predicate not convertible: $other")
    }
  }

  def convertibleFilter(f: org.apache.spark.sql.sources.Filter): Boolean =
    try { filterToColumn(f); true }
    catch { case _: UnsupportedOperationException => false }

  /** Structural schema equality ignoring nullability and metadata. */
  def sameShape(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.fields.length == y.fields.length &&
        x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && sameShape(f.dataType, g.dataType)
        }
    case (ArrayType(x, _), ArrayType(y, _)) => sameShape(x, y)
    case (MapType(xk, xv, _), MapType(yk, yv, _)) =>
      sameShape(xk, yk) && sameShape(xv, yv)
    case (x, y) => x == y
  }

  /** Extractor for one target field out of a file-schema group level,
    * matched by FIELD ID (the same reconciliation contract as
    * `Reconcile.projection`): absent → null, promotions applied.
    */
  /** One key value from an equality-delete parquet record, reconciled
    * to the current key type: the batch was written under the schema
    * at delete time, so a later int→long / float→double promotion must
    * not unmatch it. Values come back as Catalyst internals (UTF8String
    * for strings) — the same representation `fieldExtractor` produces
    * for data rows, so tuple equality is exact.
    */
  /** The file's footer schema, None when unreadable (the data read
    * below then surfaces the real error with the file path).
    */
  def readFooterSchema(path: String)
      : Option[org.apache.parquet.schema.MessageType] =
    try {
      val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path),
          graft.lake.HadoopConfs.mutable()))
      try Some(fr.getFooter.getFileMetaData.getSchema) finally fr.close()
    } catch { case _: Exception => None }

  /** Positions of `dataPath`'s rows deleted by the live v2 positional
    * delete files — shared by both row-emitting readers (Group and
    * vectorized-decode). Null when there are no delete files.
    */
  def loadDeletedPositions(deletes: Seq[String], dataPath: String)
      : java.util.HashSet[java.lang.Long] =
    if (deletes.isEmpty) null
    else {
      val mine = LakeTable.normalizePath(dataPath)
      val set = new java.util.HashSet[java.lang.Long]()
      deletes.foreach { dp =>
        val r = ParquetReader.builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(dp)).build()
        try {
          var g = r.read()
          while (g != null) {
            if (LakeTable.normalizePath(g.getString("file_path", 0)) == mine)
              set.add(g.getLong("pos", 0))
            g = r.read()
          }
        } finally r.close()
      }
      set
    }

  def eqKeyValue(g: Group, name: String, dt: DataType): Any = {
    if (g.getFieldRepetitionCount(name) == 0) return null
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    // decimal keys: decode the unscaled value by PHYSICAL encoding
    // (Spark writes INT32 for p<=9, INT64 for p<=18, else binary
    // two's-complement) into a Decimal of the TARGET precision/scale —
    // the same representation the data-file extractor produces, so
    // tuple equality and hashing line up
    dt match {
      case d: DecimalType =>
        return g.getType.getType(name).asPrimitiveType()
          .getPrimitiveTypeName match {
          case INT32 => org.apache.spark.sql.types.Decimal(
            g.getInteger(name, 0).toLong, d.precision, d.scale)
          case INT64 => org.apache.spark.sql.types.Decimal(
            g.getLong(name, 0), d.precision, d.scale)
          case _ => org.apache.spark.sql.types.Decimal(
            BigDecimal(new java.math.BigInteger(
              g.getBinary(name, 0).getBytes), d.scale),
            d.precision, d.scale)
        }
      case _ => ()
    }
    val raw: Any = g.getType.getType(name).asPrimitiveType()
      .getPrimitiveTypeName match {
      case INT64 => g.getLong(name, 0)
      case INT32 => g.getInteger(name, 0)
      case BINARY => UTF8String.fromString(g.getString(name, 0))
      case DOUBLE => g.getDouble(name, 0)
      case FLOAT => g.getFloat(name, 0)
      case BOOLEAN => g.getBoolean(name, 0)
      case other => throw new UnsupportedOperationException(
        s"equality-delete key primitive $other")
    }
    dt match {
      case LongType => raw match { case i: Int => i.toLong; case v => v }
      case DoubleType => raw match { case f: Float => f.toDouble; case v => v }
      case _ => raw
    }
  }

  /** Planning-time externality test: a data file OUTSIDE the table's
    * own data directory was registered by reference (`add_files`) and
    * may spell columns differently or lack nullable table columns —
    * only those files pay the read-time footer reconciliation.
    * Engine-written files (always under `<table>/data/`) match their
    * registered schema by construction and skip the extra footer IO.
    */
  def externalTest(tableLocation: java.nio.file.Path): String => Boolean = {
    val prefix = LakeTable.normalizePath(
      tableLocation.resolve("data").toString) + "/"
    p => !LakeTable.normalizePath(p).startsWith(prefix)
  }

  /** Rewrite a REGISTERED file schema to the file's physical footer
    * spelling: fields are matched case-insensitively by name (recursing
    * through structs; LIST/MAP-annotated groups keep the registered
    * inner layout) and fields absent from the footer are DROPPED — the
    * by-id extractor then falls back to the default/null extractor, the
    * same null-fill contract as the Spark-native read path. Identity
    * for engine-written files. Field-id metadata rides along on the
    * renamed StructFields, so by-id matching is unaffected.
    */
  def reconcileToFooter(registered: StructType,
      footer: org.apache.parquet.schema.GroupType): StructType = {
    val byLower = footer.getFields.asScala
      .groupBy(_.getName.toLowerCase(java.util.Locale.ROOT))
      .map { case (k, vs) => k -> vs.head }
    StructType(registered.fields.flatMap { rf =>
      byLower.get(rf.name.toLowerCase(java.util.Locale.ROOT)).map { pf =>
        val dt = rf.dataType match {
          case st: StructType if !pf.isPrimitive &&
              pf.getLogicalTypeAnnotation == null =>
            reconcileToFooter(st, pf.asGroupType())
          case other => other
        }
        rf.copy(name = pf.getName, dataType = dt)
      }
    })
  }

  def fieldExtractor(tf: StructField,
      fileFields: Seq[StructField]): Group => Any =
    fileFields.find(ff => FieldIds.idOf(ff) == FieldIds.idOf(tf)) match {
      case None =>
        // written before the column existed → its INITIAL DEFAULT
        // (null when none recorded), mirroring Reconcile.fieldExpr
        val d = graft.schema.Defaults.internalValue(tf)
        _ => d
      case Some(ff) =>
        val name = ff.name
        val conv = converter(tf.dataType, ff.dataType)
        g => if (g.getFieldRepetitionCount(name) == 0) null else conv(g, name)
    }

  /** Like `fieldExtractor`, but resolves `tf`'s field ID through
    * struct NESTING in the file schema (equality-delete keys may be
    * struct-nested scalars). The chain is found by ID, so renames at
    * any depth stay readable; a null or missing struct anywhere on
    * the chain — e.g. the field was added after the file was
    * written — reads null, matching the read-reconciliation
    * null-fill.
    */
  def nestedFieldExtractor(tf: StructField,
      fileStruct: StructType): Group => Any = {
    def chain(st: StructType, id: Int): Option[List[StructField]] =
      st.fields.toSeq.flatMap { f =>
        if (FieldIds.hasId(f) && FieldIds.idOf(f) == id) Some(List(f))
        else f.dataType match {
          case s: StructType => chain(s, id).map(f :: _)
          case _ => None
        }
      }.headOption
    chain(fileStruct, FieldIds.idOf(tf)) match {
      case None =>
        // consistent with the reconciling fill: a pre-column file's
        // rows carry the column's initial default (null when none)
        val d = graft.schema.Defaults.internalValue(tf)
        _ => d
      case Some(fs) =>
        val outer = fs.init.map(_.name).toArray
        val leaf = fs.last.name
        val conv = converter(tf.dataType, fs.last.dataType)
        g => {
          var cur: Group = g
          var i = 0
          var ok = true
          while (ok && i < outer.length) {
            if (cur.getFieldRepetitionCount(outer(i)) == 0) ok = false
            else cur = cur.getGroup(outer(i), 0)
            i += 1
          }
          if (!ok || cur.getFieldRepetitionCount(leaf) == 0) null
          else conv(cur, leaf)
        }
    }
  }

  /** (group, fieldName) → Catalyst internal value for a target/file
    * type pair, recursively through structs, 3-level parquet lists and
    * key_value maps. Timestamps are INT64 micros (the engine's writers
    * always produce TIMESTAMP(MICROS); INT96 never occurs in lake
    * files).
    */
  def converter(target: DataType, file: DataType): (Group, String) => Any =
    (target, file) match {
      case (t: StructType, f: StructType) =>
        val exs = t.fields.map(tf => fieldExtractor(tf, f.fields.toSeq))
        (g, n) => {
          val sub = g.getGroup(n, 0)
          new GenericInternalRow(exs.map(_(sub)))
        }
      case (ArrayType(te, _), ArrayType(fe, _)) =>
        // 3-level list encoding: <name> (LIST) { repeated group list
        // { <element> } } — Spark's writer layout
        val elemConv = converter(te, fe)
        (g, n) => {
          val outer = g.getGroup(n, 0)
          val cnt = outer.getFieldRepetitionCount(0)
          val arr = new Array[Any](cnt)
          var i = 0
          while (i < cnt) {
            val rep = outer.getGroup(0, i)
            arr(i) =
              if (rep.getFieldRepetitionCount(0) == 0) null
              else elemConv(rep, rep.getType.getFieldName(0))
            i += 1
          }
          new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
        }
      case (MapType(tk, tv, _), MapType(fk, fv, _)) =>
        val kConv = converter(tk, fk)
        val vConv = converter(tv, fv)
        (g, n) => {
          val outer = g.getGroup(n, 0)
          val cnt = outer.getFieldRepetitionCount(0)
          val keys = new Array[Any](cnt)
          val values = new Array[Any](cnt)
          var i = 0
          while (i < cnt) {
            val kv = outer.getGroup(0, i)
            keys(i) = kConv(kv, "key")
            values(i) =
              if (kv.getFieldRepetitionCount("value") == 0) null
              else vConv(kv, "value")
            i += 1
          }
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, values)
        }
      case (BooleanType, BooleanType) => (g, n) => g.getBoolean(n, 0)
      case (IntegerType, IntegerType) => (g, n) => g.getInteger(n, 0)
      case (LongType, IntegerType) => (g, n) => g.getInteger(n, 0).toLong
      case (LongType, LongType) => (g, n) => g.getLong(n, 0)
      case (FloatType, FloatType) => (g, n) => g.getFloat(n, 0)
      case (DoubleType, FloatType) => (g, n) => g.getFloat(n, 0).toDouble
      case (DoubleType, DoubleType) => (g, n) => g.getDouble(n, 0)
      case (StringType, StringType) =>
        (g, n) => UTF8String.fromString(g.getString(n, 0))
      case (BinaryType, BinaryType) => (g, n) => g.getBinary(n, 0).getBytes
      case (TimestampType, TimestampType) |
           (TimestampNTZType, TimestampNTZType) |
           (TimestampType, TimestampNTZType) |
           (TimestampNTZType, TimestampType) => (g, n) => {
        // engine writers pin INT64 micros; INT96 can still appear in
        // files written before that pin — decode both
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
        if (g.getType.getType(n).asPrimitiveType().getPrimitiveTypeName ==
            PrimitiveTypeName.INT96) int96Micros(g.getInt96(n, 0))
        else g.getLong(n, 0)
      }
      case (DateType, DateType) => (g, n) => g.getInteger(n, 0)
      case (t: DecimalType, f: DecimalType)
          if t.scale == f.scale && t.precision >= f.precision =>
        // Spark's writer encodes decimals by precision: INT32 (p<=9),
        // INT64 (p<=18), else fixed/binary two's-complement unscaled.
        // The promotion rule (precision widen, same scale) means the
        // unscaled value carries over unchanged.
        (g, n) => {
          import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
          g.getType.getType(n).asPrimitiveType().getPrimitiveTypeName match {
            case PrimitiveTypeName.INT32 =>
              org.apache.spark.sql.types.Decimal(
                g.getInteger(n, 0).toLong, t.precision, t.scale)
            case PrimitiveTypeName.INT64 =>
              org.apache.spark.sql.types.Decimal(
                g.getLong(n, 0), t.precision, t.scale)
            case _ =>
              org.apache.spark.sql.types.Decimal(
                BigDecimal(new java.math.BigInteger(
                  g.getBinary(n, 0).getBytes), f.scale),
                t.precision, t.scale)
          }
        }
      case (t, f) => throw new UnsupportedOperationException(
        s"graft-lake reader: unsupported conversion $f -> $t")
    }
}
