package graft.schema

import org.apache.spark.sql.types.StructField

/** Declarative table definition — the engine's user-facing contract,
  * mirroring the reference's JSON schema (`lambda/schema.json:126-161`:
  * database_name / table_name / columns[] / partitions[] / properties{};
  * column defs recurse through struct_def / map_def / array_def,
  * `schema.json:54-124`).
  */
case class TableDef(
    databaseName: String,
    tableName: String,
    columns: Seq[ColumnDef],
    partitions: Seq[PartitionDef],
    properties: Map[String, String])

/** `initialDefault`: the value rows written BEFORE the column existed
  * read back (Iceberg v3's `initial-default`, engine extension key
  * `initial_default` — the reference's schema.json predates it).
  * Atomic types only; set when the column is ADDED and immutable
  * afterwards (a retroactive default would rewrite the history old
  * files already serve). Also the write-side fill for writers that
  * omit the column, until SET/DROP DEFAULT overrides it.
  *
  * Scope (r16): honored on top-level columns and struct-NESTED fields
  * at any struct depth. A default declared inside `array_def`/`map_def`
  * (at any depth below them) is REJECTED at parse (r17 — it was
  * silently dropped before): those defs bypass the field annotation,
  * and per-element fills are beyond the vectorized readers, so
  * accepting the key would promise a fill that never happens.
  */
case class ColumnDef(
    name: String,
    dataType: String,
    required: Boolean,
    structDef: Option[Seq[ColumnDef]] = None,
    mapDef: Option[MapDef] = None,
    arrayDef: Option[ColumnDef] = None,
    initialDefault: Option[String] = None)

case class MapDef(key: ColumnDef, value: ColumnDef)

/** transform ∈ {identity, hour, day, month, year} — reference
  * `iceberg_helper.py:398-425`; name defaults to `{column}_{transform}`.
  */
case class PartitionDef(column: String, transform: String, name: String)

object TableDef {

  /** Parse + structurally validate a table-definition JSON. The
    * reference ships a JSON-Schema validator that is dead code
    * (`lambda_helper.py:45-79` — never called from `process_event`);
    * here validation is real, with the type enum matching what the
    * type mapper actually accepts (`constants.py` — the reference's
    * schema.json enum disagrees with its own mapper; deliberate fix,
    * SURVEY.md §7.3-7.7).
    */
  def parse(json: String): Either[Seq[String], TableDef] = {
    val errs = Seq.newBuilder[String]
    val root =
      try Json.parse(json).asObj
      catch { case e: JsonException => return Left(Seq(s"invalid JSON: ${e.getMessage}")) }

    def str(m: Map[String, JValue], key: String): String = m.get(key) match {
      case Some(JString(s)) if s.nonEmpty => s
      case Some(_) => errs += s"'$key' must be a non-empty string"; ""
      case None => errs += s"missing required key '$key'"; ""
    }

    val db = str(root, "database_name")
    val tbl = str(root, "table_name")

    def parseColumn(v: JValue, path: String,
        interior: Boolean = false): ColumnDef = {
      val m = v.asObj
      val name = m.get("column_name") match {
        case Some(JString(s)) if s.nonEmpty => s
        case _ => errs += s"$path: missing 'column_name'"; "?"
      }
      val dt = m.get("data_type") match {
        case Some(JString(s)) if s.nonEmpty => s.toLowerCase
        case _ => errs += s"$path.$name: missing 'data_type'"; "string"
      }
      val required = m.get("required").exists(_.asBool)
      // struct interiors inherit: a default under array<struct<...>>
      // is still per-element
      val structDef = m.get("struct_def").map(_.asArr.zipWithIndex.map {
        case (c, i) => parseColumn(c, s"$path.$name[$i]", interior)
      })
      val mapDef = m.get("map_def").map { md =>
        val mm = md.asObj
        MapDef(
          parseColumn(mm.getOrElse("key",
            { errs += s"$path.$name: map_def missing 'key'"; JObject(Map.empty) }),
            s"$path.$name.key", interior = true),
          parseColumn(mm.getOrElse("value",
            { errs += s"$path.$name: map_def missing 'value'"; JObject(Map.empty) }),
            s"$path.$name.value", interior = true))
      }
      val arrayDef = m.get("array_def").map(
        parseColumn(_, s"$path.$name.element", interior = true))
      if (dt.startsWith("struct") && structDef.isEmpty)
        errs += s"$path.$name: struct type requires struct_def"
      if (dt.startsWith("map") && mapDef.isEmpty)
        errs += s"$path.$name: map type requires map_def"
      if ((dt.startsWith("array") || dt.startsWith("list")) && arrayDef.isEmpty)
        errs += s"$path.$name: array type requires array_def"
      if (!TypeMapper.knownType(dt))
        errs += s"$path.$name: unknown data_type '$dt' (falls back to string)"
      val initialDefault = m.get("initial_default") match {
        case Some(_) if interior =>
          // a per-ELEMENT fill: no field annotation carries it and no
          // reader fills it — reject at the contract boundary instead
          // of silently dropping the key (r17)
          errs += s"$path.$name: initial_default inside array_def/" +
            "map_def is not supported (defaults fill absent COLUMNS; " +
            "array/map elements of old rows are data, not absence)"
          None
        case Some(JString(s)) =>
          if (dt.startsWith("struct") || dt.startsWith("map") ||
              dt.startsWith("array") || dt.startsWith("list") ||
              dt == "variant") {
            errs += s"$path.$name: initial_default on a non-atomic type"
            None
          } else {
            // fail at the CONTRACT boundary, not in a reader later
            try Defaults.withDefault(
              StructField(name, TypeMapper.toSparkType(
                ColumnDef(name, dt, required)), nullable = !required), s)
            catch {
              case e: IllegalArgumentException =>
                errs += s"$path.$name: ${e.getMessage}"
            }
            Some(s)
          }
        case Some(_) =>
          errs += s"$path.$name: 'initial_default' must be a string"; None
        case None => None
      }
      ColumnDef(name, dt, required, structDef, mapDef, arrayDef,
        initialDefault)
    }

    val columns = root.get("columns") match {
      case Some(JArray(cs)) if cs.nonEmpty =>
        cs.zipWithIndex.map { case (c, i) => parseColumn(c, s"columns[$i]") }
      case Some(_) | None => errs += "missing non-empty 'columns' array"; Seq.empty
    }
    if (columns.map(_.name).distinct.size != columns.size)
      errs += "duplicate root column names"

    val partitions = root.get("partitions") match {
      case Some(JArray(ps)) => ps.zipWithIndex.map { case (p, i) =>
        val m = p.asObj
        val colName = m.get("column").map(_.asStr).getOrElse {
          errs += s"partitions[$i]: missing 'column'"; "?"
        }
        val transform = m.get("transform").map(_.asStr.toLowerCase).getOrElse("identity")
        if (!Seq("identity", "hour", "day", "month", "year").contains(transform) &&
            !transform.matches("""bucket\[\d+\]""") &&
            !transform.matches("""truncate\[\d+\]"""))
          errs += s"partitions[$i]: unknown transform '$transform'"
        val name = m.get("name").map(_.asStr)
          .getOrElse(s"${colName}_$transform"
            .replaceAll("""bucket\[(\d+)\]""", "bucket_$1")
            .replaceAll("""truncate\[(\d+)\]""", "truncate_$1"))
        if (!columns.exists(_.name == colName))
          errs += s"partitions[$i]: source column '$colName' not in columns"
        PartitionDef(colName, transform, name)
      }
      case None => Seq.empty
      case Some(_) => errs += "'partitions' must be an array"; Seq.empty
    }

    val properties = root.get("properties") match {
      case Some(JObject(m)) => m.map { case (k, v) => k -> v.asStr }
      case None => Map.empty[String, String]
      case Some(_) => errs += "'properties' must be an object"; Map.empty[String, String]
    }

    val es = errs.result()
    if (es.nonEmpty) Left(es)
    else Right(TableDef(db, tbl, columns, partitions, properties))
  }
}
