package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.roaringbitmap.longlong.Roaring64Bitmap

import graft.lake.{DeletionVectors, LakeTable}

/** Executor-side deletion-vector membership: resolves a scan row's
  * (file URI, row position) against the live vectors of the files in
  * its scan group. The refs ride in the expression as a compact
  * encoded string (normalized data path → container/offset/length);
  * bitmaps are NOT shipped with the plan — each executor seeks into
  * the container on shared storage (like a parquet footer read) and
  * caches the deserialized vector JVM-wide
  * ([[DeletionVectors.cached]]).
  *
  * Row paths repeat for every row of a file, so the lookup keeps a
  * per-thread (last path → bitmap) slot: one map probe per FILE
  * CHANGE, one `Roaring64Bitmap.contains` per row. Thread-local
  * because whole-stage codegen shares the reference object across an
  * executor's concurrent tasks.
  */
final class DvLookup(val refs: Map[String, (String, Long, Long)])
    extends Serializable {
  @transient private lazy val slot = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](2)
  }

  def deleted(path: UTF8String, pos: Long): Boolean = {
    val s = slot.get()
    val last = s(0).asInstanceOf[UTF8String]
    if (last == null || !last.equals(path)) {
      s(0) = path.clone()
      s(1) = refs.get(LakeTable.normalizePath(path.toString)) match {
        case Some((dvPath, off, len)) => DeletionVectors.cached(dvPath, off, len)
        case None => null
      }
    }
    val bm = s(1).asInstanceOf[Roaring64Bitmap]
    bm != null && bm.contains(pos)
  }
}

object DvLookup {
  // US/RS separators never occur in paths; no JSON machinery needed
  private val FieldSep = '\u001f'
  private val RowSep = '\u001e'

  def encode(refs: Map[String, (String, Long, Long)]): String =
    refs.toSeq.sortBy(_._1).map { case (data, (dv, off, len)) =>
      s"$data$FieldSep$dv$FieldSep$off$FieldSep$len"
    }.mkString(RowSep.toString)

  def decode(s: String): Map[String, (String, Long, Long)] =
    if (s.isEmpty) Map.empty
    else s.split(RowSep).map { row =>
      val f = row.split(FieldSep)
      f(0) -> ((f(1), f(2).toLong, f(3).toLong))
    }.toMap
}

/** Per-file long constants resolved from the row's file path — the
  * lineage read's `firstRowId` / data-sequence lookup. Same
  * thread-local last-path caching as [[DvLookup]]: one map probe per
  * FILE change, a field read per row.
  */
final class FileConstLookup(val refs: Map[String, Long])
    extends Serializable {
  @transient private lazy val slot = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](2)
  }

  /** The file's constant, or null when the path has none. */
  def valueFor(path: UTF8String): java.lang.Long = {
    val s = slot.get()
    val last = s(0).asInstanceOf[UTF8String]
    if (last == null || !last.equals(path)) {
      s(0) = path.clone()
      s(1) = refs.get(LakeTable.normalizePath(path.toString)) match {
        case Some(v) => java.lang.Long.valueOf(v)
        case None => null
      }
    }
    s(1).asInstanceOf[java.lang.Long]
  }
}

/** `graft_file_const(file_path, refs)` — the long constant registered
  * for the row's file, null when absent. `refs` must be a foldable
  * string literal ([[FileConst.encode]]).
  */
case class FileConst(path: Expression, refs: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(path, refs)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (path.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("path must be STRING")
    else if (refs.dataType != StringType || !refs.foldable)
      TypeCheckResult.TypeCheckFailure("refs must be a foldable STRING")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val lookup: FileConstLookup = {
    val v = refs.eval(null)
    new FileConstLookup(FileConst.decode(
      if (v == null) "" else v.asInstanceOf[UTF8String].toString))
  }

  override def eval(input: InternalRow): Any = {
    val p = path.eval(input)
    if (p == null) null
    else {
      val v = lookup.valueFor(p.asInstanceOf[UTF8String])
      if (v == null) null else v.longValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lookupRef = ctx.addReferenceObj("fileConstLookup", lookup,
      classOf[FileConstLookup].getName)
    val p = path.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code = code"""
      ${p.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!(${p.isNull})) {
        java.lang.Long $boxed = $lookupRef.valueFor(${p.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(path = newChildren(0), refs = newChildren(1))
}

object FileConst {
  private val FieldSep = '\u001f'
  private val RowSep = '\u001e'

  def encode(refs: Map[String, Long]): String =
    refs.toSeq.sortBy(_._1).map { case (p, v) => s"$p$FieldSep$v" }
      .mkString(RowSep.toString)

  def decode(s: String): Map[String, Long] =
    if (s.isEmpty) Map.empty
    else s.split(RowSep).map { row =>
      val f = row.split(FieldSep)
      f(0) -> f(1).toLong
    }.toMap
}

/** `graft_dv_deleted(file_path, row_index, refs)` — true iff the row's
  * position is set in its file's deletion vector. `refs` must be a
  * foldable string literal ([[DvLookup.encode]]); rows of files with
  * no vector in `refs` are never deleted. Null-intolerant on
  * path/pos (scan metadata columns are never null; a null yields
  * false, not null, so `!expr` filters stay total).
  */
case class DvDeleted(path: Expression, pos: Expression, refs: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(path, pos, refs)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (path.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("path must be STRING")
    else if (pos.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("pos must be BIGINT")
    else if (refs.dataType != StringType || !refs.foldable)
      TypeCheckResult.TypeCheckFailure("refs must be a foldable STRING")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val lookup: DvLookup = {
    val v = refs.eval(null)
    new DvLookup(DvLookup.decode(
      if (v == null) "" else v.asInstanceOf[UTF8String].toString))
  }

  override def eval(input: InternalRow): Any = {
    val p = path.eval(input)
    val q = pos.eval(input)
    p != null && q != null &&
      lookup.deleted(p.asInstanceOf[UTF8String], q.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lookupRef = ctx.addReferenceObj("dvLookup", lookup,
      classOf[DvLookup].getName)
    val p = path.genCode(ctx)
    val q = pos.genCode(ctx)
    ev.copy(
      code = code"""
        ${p.code}
        ${q.code}
        boolean ${ev.value} = !(${p.isNull}) && !(${q.isNull}) &&
          $lookupRef.deleted(${p.value}, ${q.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(path = newChildren(0), pos = newChildren(1), refs = newChildren(2))
}
