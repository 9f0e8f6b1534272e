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

/** How a per-file reference map rides from the driver to the
  * executors. Small maps serialize INLINE with the expression (their
  * bytes are smaller than a broadcast's bookkeeping); wide maps — a
  * delete touching thousands of files on a million-file table — go
  * through a torrent [[org.apache.spark.broadcast.Broadcast]], so the
  * task closure carries only the broadcast handle (O(1) bytes in
  * affected-file count) and each executor fetches the map once. The
  * DSv2 connector path needs neither: each input partition already
  * carries only its own file's refs, Iceberg's per-split model.
  */
sealed trait RefCarrier[T] extends Serializable {
  def value: T
}

final case class InlineRefs[T](value: T) extends RefCarrier[T]

final case class BcastRefs[T](
    bc: org.apache.spark.broadcast.Broadcast[T]) extends RefCarrier[T] {
  override def value: T = bc.value
}

object RefCarrier {
  /** Past this many entries the map broadcasts instead of riding the
    * expression tree — below it, inline bytes beat a broadcast's
    * block-manager round trip.
    */
  val InlineMax = 64

  def apply[T](spark: org.apache.spark.sql.SparkSession, size: Int,
      refs: T)(implicit tag: scala.reflect.ClassTag[T]): RefCarrier[T] =
    if (size <= InlineMax) InlineRefs(refs)
    else BcastRefs(spark.sparkContext.broadcast(refs))
}

/** Executor-side deletion-vector membership: resolves a scan row's
  * (file URI, row position) against the live vectors of the files in
  * its scan group. The refs (normalized data path →
  * container/offset/length) ride via a [[RefCarrier]]; bitmaps are
  * NOT shipped with the plan — each executor seeks into the container
  * on shared storage (like a parquet footer read) and caches the
  * deserialized vector JVM-wide ([[DeletionVectors.cached]]).
  *
  * Row paths repeat for every row of a file, so the lookup keeps a
  * per-thread (last path → bitmap) slot: one map probe per FILE
  * CHANGE, one `Roaring64Bitmap.contains` per row. Thread-local
  * because whole-stage codegen shares the reference object across an
  * executor's concurrent tasks.
  */
final class DvLookup(val carrier: RefCarrier[Map[String, (String, Long, Long)]])
    extends Serializable {
  @transient private lazy val refs = carrier.value
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

/** Per-file long constants resolved from the row's file path — the
  * lineage read's `firstRowId` / data-sequence lookup. Same
  * thread-local last-path caching as [[DvLookup]]: one map probe per
  * FILE change, a field read per row.
  */
final class FileConstLookup(val carrier: RefCarrier[Map[String, Long]])
    extends Serializable {
  @transient private lazy val refs = carrier.value
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

/** `fileconst(file_path)` — the long constant registered for the
  * row's file, null when absent. The refs carrier is a constructor
  * object, not an expression child: its serialized form is the tiny
  * broadcast handle for wide maps, the map itself only when small.
  */
case class FileConst(path: Expression, lookup: FileConstLookup)
    extends Expression {

  override def children: Seq[Expression] = Seq(path)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (path.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("path must be STRING")
    else TypeCheckResult.TypeCheckSuccess

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
    copy(path = newChildren(0))
}

/** `dvdeleted(file_path, row_index)` — true iff the row's position is
  * set in its file's deletion vector; rows of files with no vector in
  * the refs are never deleted. Null-intolerant on path/pos (scan
  * metadata columns are never null; a null yields false, not null, so
  * `!expr` filters stay total).
  */
case class DvDeleted(path: Expression, pos: Expression, lookup: DvLookup)
    extends Expression {

  override def children: Seq[Expression] = Seq(path, pos)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (path.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("path must be STRING")
    else if (pos.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("pos must be BIGINT")
    else TypeCheckResult.TypeCheckSuccess

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
    copy(path = newChildren(0), pos = newChildren(1))
}
