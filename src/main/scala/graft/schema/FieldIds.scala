package graft.schema

import org.apache.spark.sql.types._

/** Iceberg-style field-ID assignment and lookup. IDs are carried in
  * `StructField.metadata` under "graft.fieldId" and persist across
  * schema versions — storage resolves columns by ID, never by name, so
  * renames/reorders/drops stay readable (SURVEY.md §1.3).
  *
  * The reference obtains real IDs by round-tripping the schema through
  * a throwaway SQLite-catalog table (`iceberg_helper.py:187-195`); here
  * assignment is a pure DFS pre-order counter over named fields (root
  * columns, struct children at any depth, including structs nested in
  * array elements and map values) — same ordering Iceberg produces for
  * fresh tables, no scratch catalog needed (SURVEY.md §2.A A9).
  */
object FieldIds {
  val MetaKey = "graft.fieldId"

  def idOf(f: StructField): Int = {
    require(f.metadata.contains(MetaKey), s"field ${f.name} has no field ID")
    f.metadata.getLong(MetaKey).toInt
  }

  /** Whether the field carries an ID — false for synthetic columns
    * (e.g. the connector's _graft_file/_graft_pos metadata columns).
    */
  def hasId(f: StructField): Boolean = f.metadata.contains(MetaKey)

  def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(MetaKey, id.toLong).build())

  /** Assign fresh IDs to every named field, DFS pre-order, starting at
    * `startId`. Returns the annotated schema and the next unused ID.
    */
  def assign(schema: StructType, startId: Int = 1): (StructType, Int) = {
    var next = startId
    def walkStruct(st: StructType): StructType =
      StructType(st.fields.map { f =>
        val id = next
        next += 1
        withId(f.copy(dataType = walkType(f.dataType)), id)
      })
    def walkType(dt: DataType): DataType = dt match {
      case st: StructType => walkStruct(st)
      case ArrayType(et, n) => ArrayType(walkType(et), n)
      case MapType(kt, vt, n) => MapType(walkType(kt), walkType(vt), n)
      case other => other
    }
    (walkStruct(schema), next)
  }

  /** Annotate `target` (a freshly-built schema with no IDs) so that
    * fields whose dotted path exists in `current` keep their current
    * ID, and genuinely new fields get fresh IDs from `nextId` on.
    * This is the evolution contract: identity is by name at diff time,
    * by ID in storage (SURVEY.md §1.3).
    */
  def carryOver(current: StructType, target: StructType, nextId: Int): (StructType, Int) = {
    val currentFields: Map[String, StructField] = flatten(current).toMap
    val currentIds: Map[String, Int] =
      currentFields.map { case (path, f) => path -> idOf(f) }
    var next = nextId
    def walkStruct(st: StructType, prefix: String): StructType =
      StructType(st.fields.map { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val id = currentIds.getOrElse(path, { val i = next; next += 1; i })
        // default annotations ride the evolution like ids do: a target
        // rebuilt from the TableDef contract has no metadata, so they
        // would silently vanish on the next ALTER
        val withDef = currentFields.get(path)
          .map(Defaults.carryAnnotations(_, f)).getOrElse(f)
        withId(withDef.copy(dataType = walkType(f.dataType, path)), id)
      })
    def walkType(dt: DataType, path: String): DataType = dt match {
      case st: StructType => walkStruct(st, path)
      case ArrayType(et, n) => ArrayType(walkType(et, s"$path.element"), n)
      case MapType(kt, vt, n) =>
        MapType(walkType(kt, s"$path.key"), walkType(vt, s"$path.value"), n)
      case other => other
    }
    (walkStruct(target, ""), next)
  }

  /** Flatten to (dottedPath, field) over all named fields, DFS
    * pre-order. Array elements contribute an `element` segment and map
    * values a `value` segment when they are structs — the same
    * flattening the reference sees via pyiceberg `schema.column_names`
    * (e.g. `order_items.element.price`).
    */
  def flatten(schema: StructType): Seq[(String, StructField)] = {
    def walkDt(dt: DataType, prefix: String): Seq[(String, StructField)] = dt match {
      case s: StructType => walk(s, prefix)
      case ArrayType(et, _) => walkDt(et, s"$prefix.element")
      case MapType(kt, vt, _) =>
        walkDt(kt, s"$prefix.key") ++ walkDt(vt, s"$prefix.value")
      case _ => Seq.empty
    }
    def walk(st: StructType, prefix: String): Seq[(String, StructField)] =
      st.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        (path, f) +: walkDt(f.dataType, path)
      }
    walk(schema, "")
  }

  /** Highest assigned ID in a schema (0 if none). */
  def maxId(schema: StructType): Int =
    flatten(schema).map { case (_, f) => idOf(f) }.foldLeft(0)(math.max)
}
