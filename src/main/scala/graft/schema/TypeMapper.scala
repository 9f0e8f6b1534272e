package graft.schema

import org.apache.spark.sql.types._

/** Config-type-string → Spark DataType mapping, reproducing the
  * reference's `map_config_type_to_iceberg_type`
  * (`lambda/constants.py:136-150`): prefix rules for array/list,
  * struct, map; set-membership for primitives; UNKNOWN → string
  * fallback (`constants.py:82`). Quirks preserved deliberately
  * (SURVEY.md §1.2): `decimal` is hard-coded DECIMAL(5,5)
  * (`constants.py:23-29`), `fixed` maps to binary, `uuid` to string.
  */
object TypeMapper {

  private val primitives: Map[String, DataType] = Map(
    "boolean" -> BooleanType, "bool" -> BooleanType,
    "integer" -> IntegerType, "int" -> IntegerType,
    "bigint" -> LongType, "long" -> LongType,
    "float" -> FloatType,
    "double" -> DoubleType,
    "date" -> DateType,
    // no-tz timestamp in table storage (closest to Iceberg TimestampType)
    "timestamp" -> TimestampNTZType,
    "timezone" -> TimestampType, // reference alias for tz-aware
    // micros-since-midnight — FINAL: Spark 4.1.2's TimeType exists in
    // the SQL surface but parquet writes refuse (UNSUPPORTED_TIME_TYPE),
    // so it cannot round-trip table storage (SchemaSpec pins this)
    "time" -> LongType,
    "string" -> StringType, "str" -> StringType,
    "uuid" -> StringType,
    "binary" -> BinaryType,
    "fixed" -> BinaryType,
    // engine extension past the reference's type universe (r15):
    // semi-structured schema-on-read JSON, Spark 4's VariantType —
    // feasibility-checked against the parquet write path (unlike TIME,
    // which the writer refuses; SchemaSpec pins both)
    "variant" -> VariantType,
    "decimal" -> DecimalType(5, 5)) // constants.py:23-29 hard-codes (5,5)

  // engine extension over the reference contract: `decimal(p,s)` with
  // explicit precision/scale (bare `decimal` keeps the (5,5) quirk)
  private val decimalRe = """decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  def knownType(s: String): Boolean = {
    val t = s.toLowerCase
    t.startsWith("array") || t.startsWith("list") || t.startsWith("struct") ||
      t.startsWith("map") || primitives.contains(t) ||
      decimalRe.pattern.matcher(t).matches()
  }

  /** Map a column definition (with its recursive struct/map/array defs)
    * to a Spark DataType. Mirrors `_get_nested_field`
    * (`iceberg_helper.py:127-178`): prefix match drives the nested
    * branch; unknown strings fall back to StringType.
    */
  def toSparkType(cd: ColumnDef): DataType = {
    val t = cd.dataType.toLowerCase
    if (t.startsWith("struct"))
      StructType(cd.structDef.getOrElse(Seq.empty).map(toStructField))
    else if (t.startsWith("array") || t.startsWith("list")) {
      val elem = cd.arrayDef.getOrElse(
        throw new IllegalArgumentException(s"${cd.name}: array without array_def"))
      // list elements inherit the list's own `required` flag
      // (iceberg_helper.py:173-175)
      ArrayType(toSparkType(elem), containsNull = !cd.required)
    } else if (t.startsWith("map")) {
      val md = cd.mapDef.getOrElse(
        throw new IllegalArgumentException(s"${cd.name}: map without map_def"))
      MapType(toSparkType(md.key), toSparkType(md.value),
        valueContainsNull = !md.value.required)
    } else t match {
      case decimalRe(p, s) => DecimalType(p.toInt, s.toInt)
      case _ => primitives.getOrElse(t, StringType)
    }
  }

  def toStructField(cd: ColumnDef): StructField = {
    val f = StructField(cd.name, toSparkType(cd), nullable = !cd.required)
    // initial_default (validated at TableDef.parse) rides as the same
    // metadata annotation the SQL ADD COLUMN ... DEFAULT surface writes
    cd.initialDefault.map(Defaults.withDefault(f, _)).getOrElse(f)
  }

  /** Inverse mapping: Spark DataType → column definition, used by the
    * SQL catalog DDL surface (CREATE/ALTER TABLE route through the
    * same TableDef contract as JSON definitions).
    */
  def toColumnDef(name: String, dt: DataType, nullable: Boolean): ColumnDef =
    dt match {
      case st: StructType => ColumnDef(name, "struct", required = !nullable,
        structDef = Some(st.fields.toSeq.map(f =>
          toColumnDef(f.name, f.dataType, f.nullable))))
      case ArrayType(et, n) => ColumnDef(name, "array", required = !nullable,
        arrayDef = Some(toColumnDef("element", et, n)))
      case MapType(kt, vt, n) => ColumnDef(name, "map", required = !nullable,
        mapDef = Some(MapDef(
          toColumnDef("key", kt, nullable = false),
          toColumnDef("value", vt, n))))
      case p =>
        val s = p match {
          case BooleanType => "boolean"
          case IntegerType => "int"
          case LongType => "long"
          case FloatType => "float"
          case DoubleType => "double"
          case DateType => "date"
          case TimestampNTZType => "timestamp"
          case TimestampType => "timezone"
          case StringType => "string"
          case BinaryType => "binary"
          case d: DecimalType => s"decimal(${d.precision},${d.scale})"
          case VariantType => "variant"
          case other => throw new IllegalArgumentException(
            s"catalog DDL: unsupported type ${other.simpleString} for '$name'")
        }
        ColumnDef(name, s, required = !nullable)
    }

  def toStructType(columns: Seq[ColumnDef]): StructType = {
    // dedup by name, last wins — reference builds a dict keyed by column
    // name (iceberg_helper.py:201-211)
    val deduped = columns.foldLeft(Vector.empty[ColumnDef]) { (acc, c) =>
      acc.filterNot(_.name == c.name) :+ c
    }
    StructType(deduped.map(toStructField))
  }
}
