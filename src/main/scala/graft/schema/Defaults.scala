package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Iceberg-v3-style INITIAL DEFAULT for added columns: a literal,
  * recorded in the field's metadata when the column is added, that
  * fills the column for rows written BEFORE it existed (files whose
  * schema version lacks the field id). Rows written after the add
  * keep their explicit values — including explicit NULLs — so the
  * semantics match `ALTER TABLE ... ADD COLUMN ... DEFAULT v` in
  * Iceberg v3 / SQL engines: history reads as if the column had
  * always been there with value v.
  *
  * The literal is stored as its plain string rendering and re-typed
  * by the field's own type on fill. Supported types are the atomic
  * ones whose string rendering round-trips exactly (int/long/float/
  * double/boolean/decimal/string); date/timestamp/complex defaults
  * are refused at DDL time rather than risking a lossy round-trip.
  */
object Defaults {
  val MetaKey = "graft.initialDefault"

  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | BooleanType |
         StringType => true
    case _: DecimalType => true
    case _ => false
  }

  def of(f: StructField): Option[String] =
    if (f.metadata.contains(MetaKey)) Some(f.metadata.getString(MetaKey))
    else None

  def withDefault(f: StructField, value: String): StructField = {
    require(supported(f.dataType),
      s"initial default unsupported for type ${f.dataType.simpleString} " +
        "(atomic int/long/float/double/boolean/decimal/string only)")
    val annotated = f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata).putString(MetaKey, value).build())
    // DDL-time round-trip validation: a literal that cannot produce
    // the field's value must fail HERE, not crash a reader later
    try internalValue(annotated) catch {
      case e: Exception => throw new IllegalArgumentException(
        s"default '$value' does not parse as ${f.dataType.simpleString}", e)
    }
    annotated
  }

  /** The default as Spark SQL literal text — what the engine
    * advertises as the column's write-default (`CURRENT_DEFAULT`
    * metadata) so `INSERT ... VALUES (..., DEFAULT)` resolves to the
    * declared literal instead of NULL.
    */
  def sqlText(f: StructField, value: String): String = f.dataType match {
    case StringType => "'" + value.replace("'", "''") + "'"
    case _ => value
  }

  /** The fill expression for a field ABSENT from a file's schema:
    * the default literal re-typed to the (cleaned) field type, or a
    * typed null when no default is recorded.
    */
  def fill(f: StructField, cleanType: DataType): Column = of(f) match {
    case Some(s) => lit(s).cast(cleanType)
    case None => lit(null).cast(cleanType)
  }

  /** The default as a Catalyst INTERNAL value (what the DSv2 record
    * reader emits), or null when no default is recorded.
    */
  def internalValue(f: StructField): Any = of(f) match {
    case None => null
    case Some(s) => f.dataType match {
      case IntegerType => s.toInt
      case LongType => s.toLong
      case FloatType => s.toFloat
      case DoubleType => s.toDouble
      case BooleanType => s.toBoolean
      case StringType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case dt: DecimalType => org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(s).setScale(dt.scale))
      case other => throw new IllegalStateException(
        s"initial default recorded for unsupported type $other")
    }
  }
}
