package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType,
  DoubleType, FloatType, IntegerType, LongType, ShortType, StringType,
  StructType}

import graft.lake.LakeTable

/** Incremental maintenance for materialized views — the classic
  * self-maintainable aggregate class: when the defining query is ONE
  * aggregate over ONE lake table (group-by on plain columns;
  * COUNT(*)/COUNT(col)/SUM/MIN/MAX over plain columns; no DISTINCT,
  * no FILTER, no joins), a refresh only needs the rows ADDED since
  * the recorded snapshot watermark: aggregate the delta, merge it
  * into the current per-group values, and blind-upsert the changed
  * groups — O(delta) source reads and O(changed groups) writes,
  * against the full recompute's O(source).
  *
  * Exactness rules (the oracle compares against a one-pass
  * recompute):
  *   - SUM over float/double is NOT incrementally exact (addition
  *     order changes the ulps) — such shapes stay full-refresh-only.
  *   - MIN/MAX merge with least/greatest — exact for appends; the
  *     refresh REFUSES if the delta range contains anything but plain
  *     appends (an upsert supersedes rows, a delete retracts them —
  *     neither is expressible as an additive delta).
  *   - the scan that seeds the materialization is PINNED to the
  *     watermark snapshot, so a commit racing the build can never be
  *     half-counted: it lands entirely in the next delta.
  */
private[graft] object MatViews {

  sealed trait AggSpec { def outName: String }
  case class GroupCol(outName: String, srcCol: String) extends AggSpec
  case class CountStar(outName: String) extends AggSpec
  case class CountCol(outName: String, srcCol: String) extends AggSpec
  case class SumCol(outName: String, srcCol: String) extends AggSpec
  case class MinCol(outName: String, srcCol: String) extends AggSpec
  case class MaxCol(outName: String, srcCol: String) extends AggSpec

  case class AggShape(srcDb: String, srcTable: String,
      specs: Seq[AggSpec]) {
    def groupCols: Seq[GroupCol] =
      specs.collect { case g: GroupCol => g }
  }

  /** Detect the self-maintainable shape in an ANALYZED plan; None →
    * the view stays full-refresh-only (always sound).
    */
  def detect(plan: LogicalPlan, warehouse: String): Option[AggShape] = {
    def unwrap(p: LogicalPlan): Option[(String, String)] = p match {
      case SubqueryAlias(_, c) => unwrap(c)
      case r: DataSourceV2Relation => r.table match {
        case t: LakeSparkTable
            if t.wh == warehouse && t.asOfSnapshot.isEmpty &&
              t.branchName.isEmpty =>
          Some((t.db, t.tbl))
        case _ => None
      }
      case _ => None
    }
    plan match {
      case Aggregate(groupings, outs, child, _) =>
        unwrap(child).flatMap { case (db, tbl) =>
          val groupAttrs = groupings.map {
            case a: AttributeReference => a
            case _ => return None
          }
          val specs = outs.map { out =>
            def asGroup(a: AttributeReference, name: String) =
              if (groupAttrs.exists(_.exprId == a.exprId))
                Some(GroupCol(name, a.name))
              else None
            out match {
              case a: AttributeReference => asGroup(a, a.name)
                .getOrElse(return None)
              case al @ Alias(a: AttributeReference, n) =>
                asGroup(a, n).getOrElse(return None)
              case al @ Alias(ae: AggregateExpression, n)
                  if !ae.isDistinct && ae.filter.isEmpty =>
                ae.aggregateFunction match {
                  case c: Count => c.children match {
                    case Seq(l: Literal) => CountStar(n)
                    case Seq(a: AttributeReference) => CountCol(n, a.name)
                    case _ => return None
                  }
                  case s: Sum => s.child match {
                    case a: AttributeReference
                        if exactSum(al.dataType) => SumCol(n, a.name)
                    case _ => return None
                  }
                  case m: Min => m.child match {
                    case a: AttributeReference => MinCol(n, a.name)
                    case _ => return None
                  }
                  case m: Max => m.child match {
                    case a: AttributeReference => MaxCol(n, a.name)
                    case _ => return None
                  }
                  case _ => return None
                }
              case _ => return None
            }
          }
          if (specs.collect { case g: GroupCol => g }.isEmpty) None
          else Some(AggShape(db, tbl, specs))
        }
      case _ => None
    }
  }

  /** SUM is incrementally exact only when addition is associative in
    * the output type — floats/doubles reorder ulps.
    */
  private def exactSum(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => false
    case _ => true
  }

  /** The aggregation rebuilt from the detected shape over `rows` —
    * identical output schema to the defining query (the caller
    * verifies, and falls back to the raw SQL on any mismatch).
    */
  def aggregate(rows: DataFrame, shape: AggShape): DataFrame = {
    val groups = shape.groupCols
    val aggCols: Seq[Column] = shape.specs.collect {
      case CountStar(n) => count(lit(1)).as(n)
      case CountCol(n, c) => count(col(s"`$c`")).as(n)
      case SumCol(n, c) => sum(col(s"`$c`")).as(n)
      case MinCol(n, c) => min(col(s"`$c`")).as(n)
      case MaxCol(n, c) => max(col(s"`$c`")).as(n)
    }
    rows.groupBy(groups.map(g => col(s"`${g.srcCol}`").as(g.outName)): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      // groupBy+agg emits groups first, then aggregates — restore the
      // defining query's declared column ORDER
      .select(shape.specs.map(s => col(s"`${s.outName}`")): _*)
  }

  /** Merge a delta aggregation into the current per-group values —
    * one row per TOUCHED group, ready for the blind upsert. Null
    * algebra: a group absent from `current` takes the delta verbatim;
    * a delta aggregate that is NULL (sum/min/max over all-null delta
    * cells) keeps the current value.
    */
  def merge(deltaAgg: DataFrame, current: DataFrame,
      shape: AggShape): DataFrame = {
    val keys = shape.groupCols.map(_.outName)
    val cur = current.select(current.columns.map(c =>
      col(s"`$c`").as(if (keys.contains(c)) c else s"_cur_$c")): _*)
    deltaAgg.join(cur, keys, "left").select(shape.specs.map {
      case g: GroupCol => col(s"`${g.outName}`")
      case s =>
        val d = col(s"`${s.outName}`")
        val c = col(s"`_cur_${s.outName}`")
        val mergedV = s match {
          case _: CountStar | _: CountCol => coalesce(c, lit(0L)) + d
          case _: SumCol =>
            when(d.isNull, c).otherwise(when(c.isNull, d).otherwise(c + d))
          case _: MinCol =>
            when(d.isNull, c).otherwise(when(c.isNull, d)
              .otherwise(least(c, d)))
          case _: MaxCol =>
            when(d.isNull, c).otherwise(when(c.isNull, d)
              .otherwise(greatest(c, d)))
          case _: GroupCol => d // unreachable
        }
        mergedV.as(s.outName)
    }: _*)
  }

  // ---- doc-property encoding ------------------------------------------

  def encode(shape: AggShape): Map[String, String] = Map(
    "graft.mat-view.incr" -> "true",
    "graft.mat-view.src-db" -> shape.srcDb,
    "graft.mat-view.src-table" -> shape.srcTable,
    "graft.mat-view.specs" -> shape.specs.map {
      case GroupCol(o, c) => s"group:$o:$c"
      case CountStar(o) => s"countstar:$o"
      case CountCol(o, c) => s"countcol:$o:$c"
      case SumCol(o, c) => s"sum:$o:$c"
      case MinCol(o, c) => s"min:$o:$c"
      case MaxCol(o, c) => s"max:$o:$c"
    }.mkString(","))

  def decode(props: Map[String, String]): Option[AggShape] =
    if (!props.get("graft.mat-view.incr").contains("true")) None
    else Some(AggShape(
      props("graft.mat-view.src-db"),
      props("graft.mat-view.src-table"),
      props("graft.mat-view.specs").split(",").toSeq.map { s =>
        s.split(":").toSeq match {
          case Seq("group", o, c) => GroupCol(o, c)
          case Seq("countstar", o) => CountStar(o)
          case Seq("countcol", o, c) => CountCol(o, c)
          case Seq("sum", o, c) => SumCol(o, c)
          case Seq("min", o, c) => MinCol(o, c)
          case Seq("max", o, c) => MaxCol(o, c)
          case other => throw new IllegalStateException(
            s"corrupt mat-view spec entry: $s")
        }
      }))

  /** The backing-table group-key columns that can carry per-file bloom
    * filters — set as `write.bloom-columns` at MV create so the
    * touched-group pruning below can drop backing files by exact key
    * probe, not just min/max envelope.
    */
  def bloomableKeys(shape: AggShape,
      viewSchema: StructType): Seq[String] =
    shape.groupCols.map(_.outName).filter(n =>
      viewSchema.fields.find(_.name == n)
        .exists(f => graft.lake.BloomFilters.eligible(f.dataType)))

  /** Stats filters over the backing table's group-key columns from the
    * delta's touched-key set: min/max envelope for range pruning plus
    * the exact value set (`eqSet`) for bloom probing where the
    * rendering is canonical (integrals and strings — the same rule the
    * DSv2 pushdown uses). A column with a NULL among the touched keys
    * contributes no filter (bounds imply NOT NULL for pruning);
    * unsupported types contribute none. Always CONSERVATIVE: these
    * only prune files, the merge join drops untouched groups anyway.
    */
  private[graft] def keyFilters(viewSchema: StructType,
      keyRows: Seq[org.apache.spark.sql.Row],
      groups: Seq[GroupCol]): Seq[graft.lake.RangeFilter] =
    groups.zipWithIndex.flatMap { case (g, i) =>
      val values = keyRows.map(_.get(i))
      val dt = viewSchema.fields.find(_.name == g.outName).map(_.dataType)
      if (values.isEmpty || values.exists(_ == null)) None
      else dt match {
        case Some(ByteType | ShortType | IntegerType | LongType) =>
          val nums = values.map(v => BigDecimal(v.toString))
          Some(graft.lake.RangeFilter(g.outName,
            loNum = Some(nums.min), hiNum = Some(nums.max),
            eqSet = values.map(_.toString).distinct))
        case Some(StringType) =>
          val strs = values.map(_.toString)
          Some(graft.lake.RangeFilter(g.outName,
            loStr = Some(strs.min), hiStr = Some(strs.max),
            eqSet = strs.distinct))
        case Some(_: DecimalType) =>
          val nums = values.map {
            case d: java.math.BigDecimal => BigDecimal(d)
            case v => BigDecimal(v.toString)
          }
          Some(graft.lake.RangeFilter(g.outName,
            loNum = Some(nums.min), hiNum = Some(nums.max)))
        case _ => None
      }
    }

  /** Past this many touched groups the key-set collect (and the
    * resulting filter envelope) stops paying for itself — fall back to
    * the full backing scan. Conf-overridable for tests.
    */
  private def keyLimit(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.matview.incr-key-limit")
      .map(_.toInt).getOrElse(1000)

  /** (files scanned after pruning, live files) of the last incremental
    * refresh's backing read — a test/tooling observable for the
    * touched-group pruning (specs pin that a small delta plans a
    * strict subset of the backing files).
    */
  @volatile private[graft] var lastBackingScan: Option[(Int, Int)] = None

  /** The incremental refresh itself: delta rows since the watermark →
    * delta aggregate → merge with current groups → blind upsert.
    * Returns the new watermark, or None when the source hasn't moved.
    * Refuses (by name) when the range holds anything but plain
    * appends — those deltas are not additive.
    *
    * The merge's `current` side reads ONLY the backing files that can
    * hold a TOUCHED group: the delta aggregate's key set (collected
    * below a threshold) prunes the backing scan through the same
    * stats/bloom machinery as any pushed IN — so a one-group delta
    * against a wide MV costs O(delta + touched groups), not O(MV).
    */
  def refreshIncremental(spark: SparkSession, warehouse: String,
      shape: AggShape, watermark: Long, matDb: String,
      matTable: String): Option[Long] = {
    val src = LakeTable.load(warehouse, shape.srcDb, shape.srcTable)
    val head = src.metadata.snapshots.map(_.id).foldLeft(0L)(math.max)
    if (head == watermark) return None
    val range = src.metadata.snapshots
      .filter(s => s.id > watermark && s.id <= head)
    val nonAppend = range.filterNot(s =>
      s.operation == "append" || LakeTable.isByteMove(s.operation))
    require(nonAppend.isEmpty,
      s"incremental refresh needs an append-only delta; snapshots " +
        nonAppend.map(s => s"${s.id}(${s.operation})").mkString(", ") +
        " are not additive — run a full refresh instead")
    val delta = src.changesBetween(spark, watermark, head)
    // the delta aggregate is consumed twice (key-set collect + merge
    // join) — pin it so the source delta is scanned once
    val deltaAgg = aggregate(delta, shape).localCheckpoint()
    val backing = LakeTable.load(warehouse, matDb, matTable)
    val limit = keyLimit(spark)
    val keyRows = deltaAgg
      .select(shape.groupCols.map(g => col(s"`${g.outName}`")): _*)
      .limit(limit + 1).collect().toSeq
    val filters =
      if (keyRows.size > limit) Seq.empty // wide delta: scan it all
      else keyFilters(backing.metadata.currentSchema, keyRows,
        shape.groupCols)
    lastBackingScan = Some((
      backing.plannedFiles(statsFilters = filters).size,
      backing.plannedFiles().size))
    val merged = merge(deltaAgg,
      backing.read(spark, statsFilters = filters), shape)
    // the merged frame may be empty (delta had rows but, e.g., only
    // byte-moves survived the range filter) — upsertMoR handles both
    backing.upsertMoR(spark, merged,
      keys = shape.groupCols.map(_.outName))
    Some(head)
  }
}
