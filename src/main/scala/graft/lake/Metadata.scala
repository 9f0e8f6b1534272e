package graft.lake

import org.apache.spark.sql.types._

import graft.schema._

/** Versioned table metadata — the engine's replacement for Iceberg's
  * metadata.json tree (which the reference delegates to PyIceberg+Glue,
  * `iceberg_helper.py:234-241, 384-385`). One JSON document holds every
  * schema version (with field IDs), every partition-spec version, and
  * the snapshot log; data files are plain parquet. O(files) metadata,
  * no Iceberg dependency (none exists in this environment — SURVEY.md §0).
  */
case class SpecField(sourceFieldId: Int, transform: String, name: String,
    specFieldId: Int)
case class PartitionSpecMeta(id: Int, fields: Seq[SpecField])
/** `sortedByIds`: field IDs the file's rows are sorted by (ascending,
  * nulls first — Spark's sortWithinPartitions default), recorded when a
  * `write.sort-order` clustered write produced the file. Lets the scan
  * report per-partition ordering (SupportsReportOrdering) so
  * storage-partitioned merge joins skip their sorts. Empty = unknown.
  */
/** `seq`: the file's data sequence number (Iceberg v2) — the snapshot
  * id under which its rows were (re)written. -1 = derive from the
  * containing snapshot (the common case; `LakeTable.liveFiles` stamps
  * it during replay). Stored explicitly only when a file outlives its
  * original snapshot (expire-squash carry), because equality-delete
  * applicability compares file seq < batch seq.
  */
case class DataFileMeta(path: String, schemaId: Int, specId: Int, rows: Long,
    partitionValues: Map[String, String],
    stats: Map[Int, ColStats] = Map.empty,
    bytes: Long = -1L,
    sortedByIds: Seq[Int] = Seq.empty,
    seq: Long = -1L)
/** `streamId`/`streamBatchId`: the Structured-Streaming source
  * (checkpoint) and micro-batch that produced this snapshot, when
  * ingested via StreamIngest — foreachBatch is at-least-once, so the
  * sink uses them to make replays idempotent (Iceberg's streaming-sink
  * model). Batch ids are scoped to a checkpoint, hence the pair: a new
  * checkpoint restarts at batch 0 and must not be deduped against an
  * older stream's ids.
  */
/** `removedPaths`: data files this snapshot logically removes from the
  * live set — written by copy-on-write row-level ops (operation
  * "overwrite", Iceberg's delete/replace-files model). Appends and
  * rewrites never set it.
  *
  * `deletePaths`/`deleteCounts`: merge-on-read position deletes
  * (operation "delete", Iceberg v2's delete-file model): `deletePaths`
  * are parquet files of (file_path, pos) rows marking deleted
  * positions; `deleteCounts` maps each affected data-file path to how
  * many of its positions this commit deletes (exact — double deletes
  * are excluded at write time), which keeps metadata-only COUNT(*)
  * correct without opening delete files.
  */
/** `timestampMs`: wall-clock commit time (epoch millis; -1 for
  * snapshots written before the field existed) — powers TIMESTAMP AS
  * OF time travel and age-based retention.
  */
/** `wapId`: the write-audit-publish id this snapshot was staged under
  * (Iceberg's `wap.id` summary property). Set on staged snapshots and
  * carried onto the published cherry-pick for lineage; None for plain
  * writes.
  */
case class SnapshotMeta(id: Long, files: Seq[DataFileMeta], schemaId: Int,
    operation: String = "append", streamBatchId: Option[Long] = None,
    streamId: Option[String] = None, removedPaths: Seq[String] = Seq.empty,
    deletePaths: Seq[String] = Seq.empty,
    deleteCounts: Map[String, Long] = Map.empty,
    timestampMs: Long = -1L,
    wapId: Option[String] = None,
    eqDeletes: Seq[EqDeleteMeta] = Seq.empty)

/** The live merge-on-read delete state for one data file: the delete
  * parquet files that may hold its deleted positions, and the exact
  * number of its deleted rows.
  */
case class DeleteSet(paths: Seq[String], rows: Long)

/** An equality-delete batch (Iceberg v2's second delete-file kind):
  * `paths` are parquet files of key tuples, `fieldIds` identify the
  * key columns (schema-evolution-proof — names are resolved per
  * reader), and `seq` is the committing snapshot's id. A batch deletes
  * every matching row of every data file whose sequence is LOWER than
  * `seq` — rows (re)written at or after the batch survive, which is
  * what makes blind streaming upserts correct without reading the
  * table at write time.
  */
case class EqDeleteMeta(paths: Seq[String], fieldIds: Seq[Int], seq: Long)
case class SchemaVersion(id: Int, schema: StructType)

/** A named snapshot pointer (Iceberg's refs): `kind` is "tag"
  * (immutable release marker) or "branch". A branch is a WRITABLE
  * head: `snapshotId` tracks its latest commit (a staged snapshot once
  * the branch has its own writes) and `baseSnapshotId` records the
  * main-history snapshot it forked from — branch reads overlay the
  * branch commits on the base state, and fast-forward publishes them
  * onto main when main hasn't moved past the base.
  */
case class RefMeta(snapshotId: Long, kind: String = "tag",
    baseSnapshotId: Option[Long] = None)

/** `staged`: snapshots written but not yet part of the main history
  * (Iceberg's write-audit-publish staging). Invisible to every normal
  * read/time-travel/CDC path until `publishStaged` cherry-picks them
  * onto the head; their data files count as referenced (not orphans)
  * while staged.
  */
case class TableMetadata(
    formatVersion: Int,
    database: String,
    table: String,
    schemas: Seq[SchemaVersion],
    currentSchemaId: Int,
    specs: Seq[PartitionSpecMeta],
    currentSpecId: Int,
    snapshots: Seq[SnapshotMeta],
    lastFieldId: Int,
    properties: Map[String, String] = Map.empty,
    refs: Map[String, RefMeta] = Map.empty,
    staged: Seq[SnapshotMeta] = Seq.empty) {
  def currentSchema: StructType =
    schemas.find(_.id == currentSchemaId).get.schema
  def currentSpec: PartitionSpecMeta =
    specs.find(_.id == currentSpecId).get
  def schemaById(id: Int): StructType = schemas.find(_.id == id).get.schema
  def allFiles: Seq[DataFileMeta] = snapshots.flatMap(_.files)
}

object MetadataIO {

  // ---- DataType <-> JSON ----------------------------------------------

  def typeToJson(dt: DataType): JValue = dt match {
    case st: StructType => JObject(Map(
      "kind" -> JString("struct"),
      "fields" -> JArray(st.fields.toSeq.map(fieldToJson))))
    case ArrayType(et, n) => JObject(Map(
      "kind" -> JString("array"),
      "elementType" -> typeToJson(et),
      "containsNull" -> JBool(n)))
    case MapType(kt, vt, n) => JObject(Map(
      "kind" -> JString("map"),
      "keyType" -> typeToJson(kt),
      "valueType" -> typeToJson(vt),
      "valueContainsNull" -> JBool(n)))
    case dt: DecimalType => JObject(Map(
      "kind" -> JString("decimal"),
      "precision" -> JNumber(dt.precision), "scale" -> JNumber(dt.scale)))
    case other => JString(other.typeName)
  }

  def fieldToJson(f: StructField): JValue = JObject(Map(
    "name" -> JString(f.name),
    "id" -> JNumber(FieldIds.idOf(f)),
    "required" -> JBool(!f.nullable),
    "type" -> typeToJson(f.dataType)))

  def typeFromJson(v: JValue): DataType = v match {
    case JString(s) => s match {
      case "timestamp_ntz" => TimestampNTZType
      case other => DataType.fromDDL(other)
    }
    case o: JObject =>
      val m = o.asObj
      m("kind").asStr match {
        case "struct" => StructType(m("fields").asArr.map(fieldFromJson))
        case "array" => ArrayType(typeFromJson(m("elementType")),
          m("containsNull").asBool)
        case "map" => MapType(typeFromJson(m("keyType")),
          typeFromJson(m("valueType")), m("valueContainsNull").asBool)
        case "decimal" => DecimalType(m("precision").asInt, m("scale").asInt)
        case k => throw new JsonException(s"unknown type kind $k")
      }
    case other => throw new JsonException(s"bad type json $other")
  }

  def fieldFromJson(v: JValue): StructField = {
    val m = v.asObj
    FieldIds.withId(
      StructField(m("name").asStr, typeFromJson(m("type")),
        nullable = !m("required").asBool),
      m("id").asInt)
  }

  // ---- SnapshotMeta <-> JSON ------------------------------------------

  private def snapshotToJson(sn: SnapshotMeta): JValue = JObject(Map(
    "snapshot-id" -> JNumber(sn.id),
    "schema-id" -> JNumber(sn.schemaId),
    "operation" -> JString(sn.operation)) ++
    (if (sn.timestampMs < 0) Map.empty[String, JValue]
     else Map("timestamp-ms" -> JNumber(sn.timestampMs))) ++
    sn.streamBatchId.map(b => "stream-batch-id" -> JNumber(b)).toMap ++
    sn.streamId.map(s => "stream-id" -> JString(s)).toMap ++
    sn.wapId.map(w => "wap-id" -> JString(w)).toMap ++
    (if (sn.eqDeletes.isEmpty) Map.empty[String, JValue]
     else Map("eq-deletes" -> JArray(sn.eqDeletes.map(eq => JObject(Map(
       "paths" -> JArray(eq.paths.map(JString(_))),
       "field-ids" -> JArray(eq.fieldIds.map(i => JNumber(i))),
       "seq" -> JNumber(eq.seq))))))) ++
    (if (sn.removedPaths.isEmpty) Map.empty[String, JValue]
     else Map("removed-files" ->
       JArray(sn.removedPaths.map(JString(_))))) ++
    (if (sn.deletePaths.isEmpty) Map.empty[String, JValue]
     else Map("delete-files" ->
       JArray(sn.deletePaths.map(JString(_))))) ++
    (if (sn.deleteCounts.isEmpty) Map.empty[String, JValue]
     else Map("delete-counts" -> JObject(sn.deleteCounts.map {
       case (p, n) => p -> JNumber(n)
     }))) ++ Map(
    "files" -> JArray(sn.files.map(df => JObject(Map(
      "path" -> JString(df.path),
      "schema-id" -> JNumber(df.schemaId),
      "spec-id" -> JNumber(df.specId),
      "rows" -> JNumber(df.rows),
      "bytes" -> JNumber(df.bytes)) ++
    (if (df.sortedByIds.isEmpty) Map.empty[String, JValue]
     else Map("sorted-by" -> JArray(df.sortedByIds.map(i => JNumber(i))))) ++
    (if (df.seq < 0) Map.empty[String, JValue]
     else Map("seq" -> JNumber(df.seq))) ++
    Map(
      "partition" -> JObject(df.partitionValues.map {
        case (k, v) => k -> JString(v)
      }),
      "stats" -> JObject(df.stats.map { case (id, cs) =>
        id.toString -> JObject(Map(
          "kind" -> JString(cs.kind),
          "min" -> JString(cs.min),
          "max" -> JString(cs.max)))
      })))))))

  private def snapshotFromJson(sn: JValue): SnapshotMeta = {
    val sm = sn.asObj
    SnapshotMeta(sm("snapshot-id").asLong,
      files = sm("files").asArr.map { df =>
        val dm = df.asObj
        DataFileMeta(dm("path").asStr, dm("schema-id").asInt,
          dm("spec-id").asInt, dm("rows").asLong,
          dm("partition").asObj.map { case (k, vv) => k -> vv.asStr },
          dm.get("stats").map(_.asObj.map { case (id, sv) =>
            val sm2 = sv.asObj
            id.toInt -> ColStats(sm2("kind").asStr,
              sm2("min").asStr, sm2("max").asStr)
          }).getOrElse(Map.empty),
          bytes = dm.get("bytes").map(_.asLong).getOrElse(-1L),
          sortedByIds = dm.get("sorted-by")
            .map(_.asArr.map(_.asInt)).getOrElse(Seq.empty),
          seq = dm.get("seq").map(_.asLong).getOrElse(-1L))
      },
      schemaId = sm("schema-id").asInt,
      operation = sm.get("operation").map(_.asStr).getOrElse("append"),
      streamBatchId = sm.get("stream-batch-id").map(_.asLong),
      streamId = sm.get("stream-id").map(_.asStr),
      removedPaths = sm.get("removed-files")
        .map(_.asArr.map(_.asStr)).getOrElse(Seq.empty),
      deletePaths = sm.get("delete-files")
        .map(_.asArr.map(_.asStr)).getOrElse(Seq.empty),
      deleteCounts = sm.get("delete-counts")
        .map(_.asObj.map { case (p, n) => p -> n.asLong })
        .getOrElse(Map.empty),
      timestampMs = sm.get("timestamp-ms").map(_.asLong).getOrElse(-1L),
      wapId = sm.get("wap-id").map(_.asStr),
      eqDeletes = sm.get("eq-deletes").map(_.asArr.map { eq =>
        val em = eq.asObj
        EqDeleteMeta(em("paths").asArr.map(_.asStr),
          em("field-ids").asArr.map(_.asInt),
          em("seq").asLong)
      }).getOrElse(Seq.empty))
  }

  // ---- TableMetadata <-> JSON -----------------------------------------

  def toJson(md: TableMetadata): JValue = JObject(Map(
    "format-version" -> JNumber(md.formatVersion),
    "database" -> JString(md.database),
    "table" -> JString(md.table),
    "current-schema-id" -> JNumber(md.currentSchemaId),
    "schemas" -> JArray(md.schemas.map(sv => JObject(Map(
      "schema-id" -> JNumber(sv.id),
      "fields" -> JArray(sv.schema.fields.toSeq.map(fieldToJson)))))),
    "current-spec-id" -> JNumber(md.currentSpecId),
    "partition-specs" -> JArray(md.specs.map(sp => JObject(Map(
      "spec-id" -> JNumber(sp.id),
      "fields" -> JArray(sp.fields.map(f => JObject(Map(
        "source-id" -> JNumber(f.sourceFieldId),
        "transform" -> JString(f.transform),
        "name" -> JString(f.name),
        "field-id" -> JNumber(f.specFieldId))))))))),
    "snapshots" -> JArray(md.snapshots.map(snapshotToJson)),
    "last-field-id" -> JNumber(md.lastFieldId),
    "properties" -> JObject(md.properties.map {
      case (k, v) => k -> JString(v)
    })) ++
    (if (md.staged.isEmpty) Map.empty[String, JValue]
     else Map("staged-snapshots" -> JArray(md.staged.map(snapshotToJson)))) ++
    (if (md.refs.isEmpty) Map.empty[String, JValue]
     else Map("refs" -> JObject(md.refs.map { case (n, r) =>
       n -> JObject(Map(
         "snapshot-id" -> JNumber(r.snapshotId),
         "kind" -> JString(r.kind)) ++
         r.baseSnapshotId.map(b =>
           "base-snapshot-id" -> (JNumber(b): JValue)).toMap)
     }))))

  def fromJson(v: JValue): TableMetadata = {
    val m = v.asObj
    TableMetadata(
      formatVersion = m("format-version").asInt,
      database = m("database").asStr,
      table = m("table").asStr,
      schemas = m("schemas").asArr.map { sv =>
        val sm = sv.asObj
        SchemaVersion(sm("schema-id").asInt,
          StructType(sm("fields").asArr.map(fieldFromJson)))
      },
      currentSchemaId = m("current-schema-id").asInt,
      specs = m("partition-specs").asArr.map { sp =>
        val sm = sp.asObj
        PartitionSpecMeta(sm("spec-id").asInt,
          sm("fields").asArr.map { f =>
            val fm = f.asObj
            SpecField(fm("source-id").asInt, fm("transform").asStr,
              fm("name").asStr, fm("field-id").asInt)
          })
      },
      currentSpecId = m("current-spec-id").asInt,
      snapshots = m("snapshots").asArr.map(snapshotFromJson),
      lastFieldId = m("last-field-id").asInt,
      properties = m.get("properties")
        .map(_.asObj.map { case (k, v) => k -> v.asStr })
        .getOrElse(Map.empty),
      refs = m.get("refs").map(_.asObj.map { case (n, rv) =>
        val rm = rv.asObj
        n -> RefMeta(rm("snapshot-id").asLong,
          rm.get("kind").map(_.asStr).getOrElse("tag"),
          rm.get("base-snapshot-id").map(_.asLong))
      }).getOrElse(Map.empty),
      staged = m.get("staged-snapshots")
        .map(_.asArr.map(snapshotFromJson)).getOrElse(Seq.empty))
  }
}
