package graft.sources

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.{DataType, Decimal}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarBatch, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** A zero-copy "selection vector" over a decoded parquet
  * [[ColumnVector]]: logical row `i` reads the delegate's physical row
  * `map(i)`. This is how merge-on-read deletes stay COLUMNAR — the
  * batch keeps flowing into whole-stage codegen's vectorized form and
  * the deleted rows simply vanish from the index space, instead of the
  * whole scan demoting to row-at-a-time emission (the same structure
  * Iceberg's vectorized reads use for their delete filter). Children
  * wrap recursively so struct fields read through the same mapping;
  * array/map element data is reached through PHYSICAL offsets the
  * delegate returns, which need no mapping. `hasNull`/`numNulls`
  * delegate (conservative over-report for the surviving subset — safe:
  * consumers use them only to skip null checks when FALSE/zero).
  * Closing is a no-op: the delegate belongs to the parquet reader,
  * which recycles it per batch.
  */
private[sources] final class SelectedColumnVector(
    base: ColumnVector, map: Array[Int])
    extends ColumnVector(base.dataType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = base.hasNull
  override def numNulls(): Int = base.numNulls()
  override def isNullAt(i: Int): Boolean = base.isNullAt(map(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(map(i))
  override def getByte(i: Int): Byte = base.getByte(map(i))
  override def getShort(i: Int): Short = base.getShort(map(i))
  override def getInt(i: Int): Int = base.getInt(map(i))
  override def getLong(i: Int): Long = base.getLong(map(i))
  override def getFloat(i: Int): Float = base.getFloat(map(i))
  override def getDouble(i: Int): Double = base.getDouble(map(i))
  override def getArray(i: Int): ColumnarArray = base.getArray(map(i))
  override def getMap(i: Int): ColumnarMap = base.getMap(map(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    base.getDecimal(map(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String =
    base.getUTF8String(map(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(map(i))
  // struct reads call getChild per FIELD per ROW (ColumnarRow), and
  // VariantType reads call getChild(0)/getChild(1) per ROW (the final
  // ColumnVector.getVariant reads the value/metadata child binaries) —
  // cache the wrapped children instead of allocating one per access
  private lazy val childCache: Array[ColumnVector] =
    new Array(base.dataType match {
      case s: org.apache.spark.sql.types.StructType => s.size
      case org.apache.spark.sql.types.VariantType => 2
      case _ => 0
    })
  override def getChild(ordinal: Int): ColumnVector =
    if (ordinal < childCache.length) {
      var c = childCache(ordinal)
      if (c == null) {
        c = new SelectedColumnVector(base.getChild(ordinal), map)
        childCache(ordinal) = c
      }
      c
    } else new SelectedColumnVector(base.getChild(ordinal), map)
}

/** A decoded struct [[ColumnVector]] with nested-default constants
  * OVERLAID (r16): `inj` maps struct-ordinal paths below this column
  * to [[org.apache.spark.sql.execution.vectorized.ConstantColumnVector]]s
  * holding the absent field's initial default. Value reads delegate
  * untouched; `getChild` swaps an exact-path child for its constant
  * and re-wraps prefix-path children so deeper injections resolve.
  * Parent-null rows are safe for free: consumers check the struct's
  * own null bit before touching children (the same contract
  * [[SelectedColumnVector]] relies on), which matches the engine's
  * semantics — an absent field defaults only where its parent struct
  * exists. Composition order with the MoR selection map: the overlay
  * wraps the DECODED vector, the selection wraps the overlay (a
  * constant ignores the row index, so the remap is a no-op on it).
  */
private[sources] final class InjectedColumnVector(
    base: ColumnVector, inj: Seq[(Array[Int], ColumnVector)])
    extends ColumnVector(base.dataType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = base.hasNull
  override def numNulls(): Int = base.numNulls()
  override def isNullAt(i: Int): Boolean = base.isNullAt(i)
  override def getBoolean(i: Int): Boolean = base.getBoolean(i)
  override def getByte(i: Int): Byte = base.getByte(i)
  override def getShort(i: Int): Short = base.getShort(i)
  override def getInt(i: Int): Int = base.getInt(i)
  override def getLong(i: Int): Long = base.getLong(i)
  override def getFloat(i: Int): Float = base.getFloat(i)
  override def getDouble(i: Int): Double = base.getDouble(i)
  override def getArray(i: Int): ColumnarArray = base.getArray(i)
  override def getMap(i: Int): ColumnarMap = base.getMap(i)
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    base.getDecimal(i, precision, scale)
  override def getUTF8String(i: Int): UTF8String = base.getUTF8String(i)
  override def getBinary(i: Int): Array[Byte] = base.getBinary(i)
  private lazy val childCache: Array[ColumnVector] =
    new Array(base.dataType match {
      case s: org.apache.spark.sql.types.StructType => s.size
      case _ => 0
    })
  private def makeChild(ordinal: Int): ColumnVector =
    inj.find(p => p._1.length == 1 && p._1(0) == ordinal)
      .map(_._2)
      .getOrElse {
        val deeper = inj.collect {
          case (path, c) if path(0) == ordinal && path.length > 1 =>
            (path.drop(1), c)
        }
        if (deeper.nonEmpty)
          new InjectedColumnVector(base.getChild(ordinal), deeper)
        else base.getChild(ordinal)
      }
  override def getChild(ordinal: Int): ColumnVector =
    if (ordinal < childCache.length) {
      var c = childCache(ordinal)
      if (c == null) { c = makeChild(ordinal); childCache(ordinal) = c }
      c
    } else makeChild(ordinal)
}

/** Merge-on-read scans, fully COLUMNAR: Spark's vectorized parquet
  * decoder produces the batch, the delete state (position deletes,
  * deletion vectors, equality-delete key sets) filters it as a
  * selection map, and the surviving rows ship onward as a
  * [[ColumnarBatch]] over [[SelectedColumnVector]] wrappers — so a
  * table with live deletes keeps whole-stage codegen in its vectorized
  * form instead of demoting the WHOLE scan to row mode (Spark forbids
  * mixed modes per scan; before r14 one MoR file cost every clean
  * file in the scan its batch path). Decode plan and gates are shared
  * with [[BatchRowLakeReader]] ([[BatchRowLakeReader.plan]]): renames
  * and widenings by field ID, equality keys re-requested when the
  * projection pruned them (those extra columns feed the probes and are
  * then CLIPPED from the emitted batch — the output is exactly the
  * target width). Metadata/lineage-consuming scans and changelog
  * markers still emit rows. Position-consuming state (position
  * deletes, deletion vectors) probes the reader-GENERATED row-index
  * column (plan.rowIdxPos — file-absolute, exact under skipping and
  * byte-range splits), so pushed predicates skip row groups on
  * delete-bearing scans too (r15) and splits need no footer IO.
  */
private[sources] class MorVectorizedLakeReader(p: LakeFilePartition,
    plan: BatchRowLakeReader.Plan)
    extends PartitionReader[ColumnarBatch] {
  BatchRowLakeReader.opened.incrementAndGet()

  // localize the factory gate this reader depends on: foreign-encoded
  // (external) files and changelog-marker emission must never reach
  // the columnar MoR path — vectorizable() excludes them, and a future
  // change there must fail loudly HERE rather than silently push a
  // predicate on a foreign file
  require(!p.external && !p.emitOnlyDeleted,
    s"MorVectorizedLakeReader planned for an excluded partition shape " +
      s"(external=${p.external}, emitOnlyDeleted=${p.emitOnlyDeleted}, " +
      s"file ${p.path}) — LakeReaderFactory.vectorizable gate out of sync")

  // in-file predicate skipping engages regardless of delete shape:
  // position probes read the generated row-index column, which stays
  // file-absolute when parquet skips row groups or pages; ranges
  // rewrite to the file's physical names by field id as everywhere
  private val reader = LakeVectorize.openReader(p.path, plan.requested,
    pred =
      if (p.pushedRanges.isEmpty) None
      else LakeSource.parquetPredicate(
        LakeVectorize.renameRanges(p.pushedRanges, p.target, p.fileSchema),
        p.fileSchema, n => plan.requested.fieldNames.contains(n)),
    returnBatches = true, start = p.start, length = p.length)

  private val targetWidth = p.target.fields.length
  private val requestedWidth = plan.requested.fields.length
  // emitted batch = decoded batch as-is only when the request is a
  // positional identity with the target (no constants, no appended
  // probe/row-index columns to clip)
  private val passthrough = requestedWidth == targetWidth &&
    plan.srcIdx.zipWithIndex.forall { case (s, i) => s == i } &&
    plan.injections.isEmpty
  // constant vectors for absent atomic columns (r15: initial default
  // or null, per target ordinal) — ConstantColumnVector ignores the
  // row index, so the selection map needs no wrapper over them
  private val constCols: Array[ColumnVector] =
    plan.srcIdx.zipWithIndex.map { case (s, i) =>
      if (s >= 0) null
      else LakeVectorize.constantVector(
        graft.lake.Reconcile.clean(p.target.fields(i).dataType),
        plan.consts(i))
    }

  // nested-default overlays (r16): per requested column, the constant
  // vectors the decoded struct gains for absent-with-DEFAULT children
  private val injCols: Map[Int, Seq[(Array[Int], ColumnVector)]] =
    plan.injections.map { case (idx, is) =>
      idx -> is.map(j => (j.path, LakeVectorize.constantVector(j.dt,
        j.value)))
    }
  private def injWrap(sj: Int, c: ColumnVector): ColumnVector =
    injCols.get(sj) match {
      case Some(is) => new InjectedColumnVector(c, is)
      case None => c
    }

  private val deletedPos: java.util.HashSet[java.lang.Long] =
    LakeSource.loadDeletedPositions(p.deletes, p.path)
  private val deletedBm: org.roaringbitmap.longlong.Roaring64Bitmap =
    p.dv match {
      case Some((path, off, len)) =>
        graft.lake.DeletionVectors.cached(path, off, len)
      case None => null
    }
  private def deletedAt(at: Long): Boolean =
    (deletedBm != null && deletedBm.contains(at)) ||
      (deletedPos != null && deletedPos.contains(at))

  private val eqSets = p.eqBatches.map(EqBatchCache.get).toArray
  private val eqProbes: Array[java.util.ArrayList[Any]] =
    plan.eqAccess.map(ax => new java.util.ArrayList[Any](ax.length))

  private def eqDeleted(r: org.apache.spark.sql.catalyst.InternalRow)
      : Boolean = {
    var i = 0
    while (i < eqSets.length) {
      val access = plan.eqAccess(i)
      val probe = eqProbes(i)
      probe.clear()
      var j = 0
      while (j < access.length) {
        probe.add(BatchRowLakeReader.keyAt(r, access(j)))
        j += 1
      }
      if (eqSets(i).contains(probe)) return true
      i += 1
    }
    false
  }

  private var cur: ColumnarBatch = _

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      val b = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
      val n = b.numRows()
      // file-absolute positions, generated by the reader itself
      // (plan.rowIdxPos ≥ 0 whenever position deletes / DVs are live)
      val idxCol: ColumnVector =
        if (plan.rowIdxPos >= 0) b.column(plan.rowIdxPos) else null
      val map = new Array[Int](n)
      var keep = 0
      var i = 0
      while (i < n) {
        val dead = (idxCol != null && deletedAt(idxCol.getLong(i))) ||
          (eqSets.length > 0 && eqDeleted(b.getRow(i)))
        if (!dead) { map(keep) = i; keep += 1 }
        i += 1
      }
      if (keep > 0) {
        cur =
          if (keep == n && passthrough) b
          else {
            val cols = new Array[ColumnVector](targetWidth)
            var j = 0
            while (j < targetWidth) {
              val sj = plan.srcIdx(j)
              cols(j) =
                if (sj < 0) constCols(j)
                else if (keep == n) injWrap(sj, b.column(sj))
                else new SelectedColumnVector(
                  injWrap(sj, b.column(sj)), map)
              j += 1
            }
            new ColumnarBatch(cols, keep)
          }
        return true
      }
    }
    false
  }

  override def get(): ColumnarBatch = cur
  override def close(): Unit = reader.close()
}
