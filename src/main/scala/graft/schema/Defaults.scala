package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Iceberg-v3-style column defaults, two halves with different
  * mutability:
  *
  *  - INITIAL default (`MetaKey`, immutable, recorded when the column
  *    is added): fills the column for rows written BEFORE it existed
  *    (files whose schema version lacks the field id). Never changes
  *    afterwards — history must read the same forever.
  *  - WRITE default (`WriteKey`, mutable via `ALTER COLUMN ... SET /
  *    DROP DEFAULT`): the value a writer gets when it omits the
  *    column (SQL `INSERT ... DEFAULT`, aligned API appends). Falls
  *    back to the initial default when unset.
  *
  * Rows written after the add keep their explicit values — including
  * explicit NULLs. Literals are stored as their plain string rendering
  * and re-typed by the field's own type on fill; only atomic types
  * whose rendering round-trips exactly are supported (int/long/float/
  * double/boolean/decimal/string), validated at DDL time.
  */
object Defaults {
  val MetaKey = "graft.initialDefault"
  val WriteKey = "graft.writeDefault"
  /** Tombstone for `DROP DEFAULT`: distinguishes "dropped — omitted
    * writes are NULL" from "never set — fall back to the initial".
    */
  val DroppedKey = "graft.writeDefaultDropped"

  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | BooleanType |
         StringType => true
    case _: DecimalType => true
    case _ => false
  }

  /** The string literal parsed as the field's Catalyst INTERNAL value. */
  private def parse(s: String, dt: DataType): Any = dt match {
    case IntegerType => s.toInt
    case LongType => s.toLong
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case BooleanType => s.toBoolean
    case StringType =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case d: DecimalType => org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(s).setScale(d.scale))
    case other => throw new IllegalStateException(
      s"default recorded for unsupported type $other")
  }

  private def validate(value: String, f: StructField): Unit = {
    require(supported(f.dataType),
      s"default unsupported for type ${f.dataType.simpleString} " +
        "(atomic int/long/float/double/boolean/decimal/string only)")
    // DDL-time round-trip validation: a literal that cannot produce
    // the field's value must fail HERE, not crash a reader later
    try parse(value, f.dataType) catch {
      case e: Exception => throw new IllegalArgumentException(
        s"default '$value' does not parse as ${f.dataType.simpleString}", e)
    }
  }

  def of(f: StructField): Option[String] =
    if (f.metadata.contains(MetaKey)) Some(f.metadata.getString(MetaKey))
    else None

  /** The default a WRITER omitting the column gets — the mutable
    * write default, falling back to the initial one unless it was
    * explicitly dropped.
    */
  def writeOf(f: StructField): Option[String] =
    if (f.metadata.contains(WriteKey))
      Some(f.metadata.getString(WriteKey))
    else if (f.metadata.contains(DroppedKey)) None
    else of(f)

  def withDefault(f: StructField, value: String): StructField = {
    validate(value, f)
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(MetaKey, value).build())
  }

  /** Set (Some) or drop (None) the mutable write default. A drop
    * leaves a tombstone so omitted writes are NULL even when an
    * initial default exists.
    */
  def withWriteDefault(f: StructField, value: Option[String]): StructField = {
    value.foreach(validate(_, f))
    val b = new MetadataBuilder().withMetadata(f.metadata)
    value match {
      case Some(v) => b.putString(WriteKey, v).remove(DroppedKey)
      case None => b.remove(WriteKey).putBoolean(DroppedKey, true)
    }
    f.copy(metadata = b.build())
  }

  /** Carry BOTH default annotations from `from` onto `to` — evolution
    * rebuilds fields from the TableDef contract, which has no
    * metadata, so the annotations would silently vanish otherwise.
    */
  def carryAnnotations(from: StructField, to: StructField): StructField = {
    val b = new MetadataBuilder().withMetadata(to.metadata)
    if (from.metadata.contains(MetaKey))
      b.putString(MetaKey, from.metadata.getString(MetaKey))
    if (from.metadata.contains(WriteKey))
      b.putString(WriteKey, from.metadata.getString(WriteKey))
    if (from.metadata.contains(DroppedKey))
      b.putBoolean(DroppedKey, true)
    to.copy(metadata = b.build())
  }

  /** Read-side fill for a field ABSENT from a file's schema: the
    * INITIAL default (typed null when none recorded).
    */
  def fill(f: StructField, cleanType: DataType): Column = of(f) match {
    case Some(s) => lit(s).cast(cleanType)
    case None => lit(null).cast(cleanType)
  }

  /** Write-side fill for a column the writer omitted: the WRITE
    * default (typed null when none recorded).
    */
  def writeFill(f: StructField, cleanType: DataType): Column =
    writeOf(f) match {
      case Some(s) => lit(s).cast(cleanType)
      case None => lit(null).cast(cleanType)
    }

  /** The INITIAL default as a Catalyst internal value (what the DSv2
    * record reader emits for pre-column files), or null when none.
    */
  def internalValue(f: StructField): Any =
    of(f).map(parse(_, f.dataType)).orNull

  /** A default as Spark SQL literal text — what the engine advertises
    * via CURRENT_DEFAULT/EXISTS_DEFAULT metadata. Spark's lexer
    * escapes with BACKSLASH ('' is two adjacent literals that
    * concatenate), so quote/backslash escape accordingly.
    */
  def sqlText(f: StructField, value: String): String = f.dataType match {
    case StringType =>
      "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case _ => value
  }
}
