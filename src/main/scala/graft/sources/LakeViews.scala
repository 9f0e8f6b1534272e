package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption,
  StandardOpenOption}

import org.apache.spark.sql.types.{DataType, StructType}

import graft.schema.{JArray, JNumber, JObject, JString, JValue, Json}

/** Persistent SQL views for the lake catalog (Iceberg's view spec,
  * scoped to what Spark's `ViewCatalog` carries): a view is a named
  * document under `<warehouse>/<db>/_views/<name>.json` holding a
  * VERSION LIST — `CREATE OR REPLACE` appends a version instead of
  * overwriting, so the definition history is auditable exactly like
  * table snapshots — plus the view-level properties. The stored text
  * is the defining SQL with its capture context (catalog + namespace
  * the names resolved against) and the analyzed schema, which is what
  * lets Spark re-resolve the view identically from any session.
  *
  * Writes are last-writer-wins via temp-file + atomic move (views are
  * definitions, not data — the table commit protocol's CAS rigor
  * buys nothing here); `CREATE` uses CREATE_NEW so two racing creates
  * surface instead of silently merging.
  */
object LakeViews {

  case class ViewVersion(id: Int, timestampMs: Long, sql: String,
      schemaJson: String, queryColumnNames: Seq[String],
      columnAliases: Seq[String], columnComments: Seq[String],
      currentCatalog: String, currentNamespace: Seq[String])

  case class ViewDoc(name: String, currentVersionId: Int,
      versions: Seq[ViewVersion], properties: Map[String, String]) {
    def current: ViewVersion = versions.find(_.id == currentVersionId)
      .getOrElse(throw new IllegalStateException(
        s"view $name: current-version-id $currentVersionId not in " +
          s"versions ${versions.map(_.id)}"))
  }

  def dir(warehouse: String, db: String): Path =
    Paths.get(warehouse, db, "_views")

  def path(warehouse: String, db: String, name: String): Path =
    dir(warehouse, db).resolve(s"$name.json")

  private def strings(v: Option[JValue]): Seq[String] =
    v.map(_.asArr.map(_.asStr)).getOrElse(Seq.empty)

  def toJson(d: ViewDoc): JValue = JObject(Map(
    "view-name" -> JString(d.name),
    "current-version-id" -> JNumber(d.currentVersionId),
    "versions" -> JArray(d.versions.map(v => JObject(Map(
      "version-id" -> JNumber(v.id),
      "timestamp-ms" -> JNumber(v.timestampMs),
      "sql" -> JString(v.sql),
      "schema-json" -> JString(v.schemaJson),
      "query-column-names" -> JArray(v.queryColumnNames.map(JString)),
      "column-aliases" -> JArray(v.columnAliases.map(JString)),
      "column-comments" -> JArray(v.columnComments.map(JString)),
      "current-catalog" -> JString(v.currentCatalog),
      "current-namespace" -> JArray(v.currentNamespace.map(JString)))))),
    "properties" -> JObject(d.properties.map {
      case (k, v) => k -> JString(v) })))

  def fromJson(j: JValue): ViewDoc = {
    val m = j.asObj
    ViewDoc(
      name = m("view-name").asStr,
      currentVersionId = m("current-version-id").asInt,
      versions = m("versions").asArr.map { vv =>
        val vm = vv.asObj
        ViewVersion(vm("version-id").asInt, vm("timestamp-ms").asLong,
          vm("sql").asStr, vm("schema-json").asStr,
          strings(vm.get("query-column-names")),
          strings(vm.get("column-aliases")),
          strings(vm.get("column-comments")),
          vm("current-catalog").asStr,
          strings(vm.get("current-namespace")))
      },
      properties = m.get("properties")
        .map(_.asObj.map { case (k, v) => k -> v.asStr })
        .getOrElse(Map.empty))
  }

  def read(p: Path): Option[ViewDoc] =
    if (!Files.exists(p)) None
    else Some(fromJson(Json.parse(Files.readString(p))))

  /** Overwrite (replace/alter/rename): temp + atomic move. */
  def write(p: Path, d: ViewDoc): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve(s".${p.getFileName}.tmp")
    Files.writeString(tmp, Json.write(toJson(d)))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create (CREATE_NEW — racing creates surface). */
  def create(p: Path, d: ViewDoc): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, Json.write(toJson(d)),
      StandardOpenOption.CREATE_NEW)
  }

  /** One row of a materialized view's refresh history — the
    * `.refreshes` metadata relation (mirroring `.snapshots` on
    * tables). `mode` is what the caller asked for (''/full/
    * incremental); `strategy` what the engine ran (recompute/append/
    * signed/recompute-touched/no-op); refusals log with
    * outcome=refused and the refusal reason, then rethrow.
    */
  case class RefreshEvent(tsMs: Long, mode: String, strategy: String,
      fromSnapshot: Long, toSnapshot: Long, groups: Long,
      durationMs: Long, outcome: String, reason: String)

  def refreshLogPath(warehouse: String, db: String, name: String): Path =
    dir(warehouse, db).resolve(s".$name.refreshes.jsonl")

  /** Append one event (O_APPEND — atomic for one-line writes; callers
    * hold the refresh lock anyway). */
  def appendRefresh(p: Path, e: RefreshEvent): Unit = {
    Files.createDirectories(p.getParent)
    val line = Json.write(JObject(Map(
      "ts-ms" -> JNumber(e.tsMs), "mode" -> JString(e.mode),
      "strategy" -> JString(e.strategy),
      "from-snapshot" -> JNumber(e.fromSnapshot),
      "to-snapshot" -> JNumber(e.toSnapshot),
      "groups" -> JNumber(e.groups),
      "duration-ms" -> JNumber(e.durationMs),
      "outcome" -> JString(e.outcome),
      "reason" -> JString(e.reason)))) + "\n"
    Files.write(p, line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def readRefreshes(p: Path): Seq[RefreshEvent] =
    if (!Files.exists(p)) Seq.empty
    else scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.readAllLines(p).iterator).asScala
      .filter(_.nonEmpty).map { line =>
        val m = Json.parse(line).asObj
        RefreshEvent(m("ts-ms").asLong, m("mode").asStr,
          m("strategy").asStr, m("from-snapshot").asLong,
          m("to-snapshot").asLong, m("groups").asLong,
          m("duration-ms").asLong, m("outcome").asStr,
          m("reason").asStr)
      }.toSeq

  /** Serialize materialized-view refreshes across threads AND
    * processes: an advisory `tryLock` on a sidecar lock file. Without
    * it, two concurrent incremental refreshers both read watermark
    * `w`, both aggregate the same delta, and whichever merge-upsert
    * lands second double-counts it (its `current` already contains the
    * first's merge) — the last-writer-wins watermark stamp then hides
    * the corruption. The loser here gets a NAMED conflict instead;
    * the caller must (re)read the view doc INSIDE the lock so a
    * just-finished refresh is seen as the no-op it is. A crashed
    * holder's lock is released by the OS with its process, so no
    * stale-claim sweep is needed (the reason this is a lock, not a
    * claim file).
    */
  def withRefreshLock[T](warehouse: String, db: String, name: String)(
      body: => T): T = {
    val lockPath = dir(warehouse, db).resolve(s".$name.refresh-lock")
    Files.createDirectories(lockPath.getParent)
    val ch = java.nio.channels.FileChannel.open(lockPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock =
        try ch.tryLock()
        catch {
          // same-JVM contention surfaces as an exception, not null
          case _: java.nio.channels.OverlappingFileLockException => null
        }
      if (lock == null)
        throw new java.util.ConcurrentModificationException(
          s"materialized view '$db.$name' is being refreshed by a " +
            "concurrent caller; retry after that refresh completes")
      try body finally lock.release()
    } finally ch.close()
  }
}

/** The [[org.apache.spark.sql.connector.catalog.View]] served back to
  * Spark — the document's CURRENT version.
  */
private[graft] class LakeView(fullName: String,
    doc: LakeViews.ViewDoc)
    extends org.apache.spark.sql.connector.catalog.View {
  private val v = doc.current
  override def name(): String = fullName
  override def query(): String = v.sql
  override def currentCatalog(): String = v.currentCatalog
  override def currentNamespace(): Array[String] =
    v.currentNamespace.toArray
  override def schema(): StructType =
    DataType.fromJson(v.schemaJson).asInstanceOf[StructType]
  override def queryColumnNames(): Array[String] =
    v.queryColumnNames.toArray
  override def columnAliases(): Array[String] = v.columnAliases.toArray
  override def columnComments(): Array[String] = v.columnComments.toArray
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    doc.properties.foreach { case (k, vv) => m.put(k, vv) }
    m
  }
}
