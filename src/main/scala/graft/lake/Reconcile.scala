package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.FieldIds

/** Read-time schema reconciliation — the central custom mechanism
  * (SURVEY.md §4.3, §7.2): every data file was written under some
  * historical schema version; on read, each file group is projected to
  * the *current* schema by matching fields on **field ID** (never
  * name), so renames/reorders/drops/adds/promotions made after a file
  * was written still resolve correctly:
  *
  *  - field present in file  → cast to current type (promotions
  *    int→long, float→double, decimal widen), aliased to current name
  *  - field absent from file → null literal of the current type
  *  - nested adds (e.g. a field added inside array<struct>) are
  *    synthesized per element with `transform`, per map value with
  *    `transform_values`
  *
  * Pure public DataFrame API — no Catalyst internals.
  */
object Reconcile {

  /** Strip field-ID metadata so a DataType can be used in cast targets
    * and null literals.
    */
  def clean(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, clean(f.dataType), f.nullable)))
    case ArrayType(et, n) => ArrayType(clean(et), n)
    case MapType(kt, vt, n) => MapType(clean(kt), clean(vt), n)
    case other => other
  }

  /** Projection of a file-group DataFrame (schema `fileSchema`, both
    * annotated with field IDs) onto `current`.
    */
  def projection(fileSchema: StructType, current: StructType): Seq[Column] =
    current.fields.toSeq.map { curF =>
      val fileF = fileSchema.fields.find(f => FieldIds.idOf(f) == FieldIds.idOf(curF))
      fieldExpr(curF, fileF.map(f => (col(quoted(f.name)), f))).as(curF.name)
    }

  private def quoted(name: String): String = s"`$name`"

  /** Expression producing `curF`'s value from the matched file field
    * (if any), recursively.
    */
  private def fieldExpr(curF: StructField,
      file: Option[(Column, StructField)]): Column = file match {
    // absent from the file = written before the column existed →
    // the column's INITIAL DEFAULT (typed null when none recorded)
    case None => graft.schema.Defaults.fill(curF, clean(curF.dataType))
    case Some((fc, ff)) => typeExpr(curF.dataType, ff.dataType, fc)
  }

  private def typeExpr(curT: DataType, fileT: DataType, fc: Column): Column =
    (curT, fileT) match {
      case (c: StructType, f: StructType) =>
        structExpr(c, f, fc)
      case (ArrayType(ce: StructType, _), ArrayType(fe: StructType, _)) =>
        transform(fc, x => structExpr(ce, fe, x))
      case (ArrayType(ce, _), ArrayType(fe, _)) if ce != fe =>
        transform(fc, x => x.cast(clean(ce)))
      case (MapType(_, cv: StructType, _), MapType(_, fv: StructType, _)) =>
        transform_values(fc, (_, v) => structExpr(cv, fv, v))
      case (MapType(ck, cv, _), MapType(fk, fv, _)) if ck != fk || cv != fv =>
        fc.cast(clean(curT))
      case (c, f) if clean(c) == clean(f) => fc
      case (c, _) => fc.cast(clean(c))
    }

  private def structExpr(cur: StructType, file: StructType, base: Column): Column = {
    val rebuilt = struct(cur.fields.toSeq.map { cf =>
      val ff = file.fields.find(f => FieldIds.idOf(f) == FieldIds.idOf(cf))
      (ff match {
        case None => graft.schema.Defaults.fill(cf, clean(cf.dataType))
        case Some(f) => typeExpr(cf.dataType, f.dataType, base.getField(f.name))
      }).as(cf.name)
    }: _*)
    // a NULL struct must stay NULL, not become a struct of NULLs
    when(base.isNull, lit(null).cast(clean(cur))).otherwise(rebuilt)
  }
}
