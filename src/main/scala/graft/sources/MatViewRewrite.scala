package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.lake.LakeTable

/** Materialized-view QUERY REWRITING: an aggregate SELECT over a lake
  * table answers from a registered materialized view when (a) the
  * query's detected aggregate shape EXACTLY matches the view's
  * recorded shape (same source, same group keys, same aggregates in
  * order, same WHERE, same join dims — output aliases are free), and
  * (b) the view is FRESH — its authoritative watermark equals the
  * source head, every dim pin equals its dim's head, and a
  * tz-sensitive shape was bucketed under the current session zone.
  * Anything else — stale view, shape mismatch, HAVING views, approx
  * or DISTINCT shapes — falls back to the source scan untouched, so
  * the rewrite can never change a result, only its cost: O(groups)
  * backing read instead of O(source) scan + shuffle. That asymmetry
  * is the whole point at 100 TB — the classic Calcite/Materialize
  * aggregate-rewrite, scoped to shapes this engine can PROVE
  * equivalent from its own persisted metadata.
  *
  * Runs post-analysis (the plan is resolved; detection reuses the
  * exact machinery CREATE MATERIALIZED VIEW runs). Disable with
  * `spark.graft.matview.rewrite=false`.
  */
object MatViewRewrite {

  /** Last rewrite this JVM performed, for plan self-audits:
    * (viewDb, viewName). Cleared at the start of every apply(). */
  @volatile var lastRewrite: Option[(String, String)] = None

  def enabled(spark: SparkSession): Boolean =
    !spark.conf.getOption("spark.graft.matview.rewrite")
      .contains("false")

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    lastRewrite = None
    if (!enabled(spark)) return plan
    // fast bail: no aggregate over a lake relation, nothing to do
    val hasLakeAgg = plan.exists {
      case a: Aggregate => a.child.exists {
        case r: DataSourceV2Relation =>
          r.table.isInstanceOf[LakeSparkTable]
        case _ => false
      }
      case _ => false
    }
    if (!hasLakeAgg) return plan
    // transformUp, not resolveOperatorsUp: the latter no-ops on plans
    // already marked analyzed (the bridge path hands us exactly that)
    org.apache.spark.sql.catalyst.plans.logical.AnalysisHelper
      .allowInvokingTransformsInAnalyzer {
        plan.transformUp {
          case agg: Aggregate => rewriteAgg(spark, agg).getOrElse(agg)
        }
      }
  }

  private def warehouseOf(p: LogicalPlan): Option[String] =
    p.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[LakeSparkTable] =>
        r.table.asInstanceOf[LakeSparkTable].wh
    }

  /** Spec equality up to output NAMES: the user's aliases are theirs;
    * what must coincide is the kind, the argument SQL, and the order
    * (order fixes the positional column correspondence). */
  private def sameSpecs(a: Seq[MatViews.AggSpec],
      b: Seq[MatViews.AggSpec]): Boolean =
    a.size == b.size && a.zip(b).forall {
      case (MatViews.GroupCol(_, x), MatViews.GroupCol(_, y)) => x == y
      case (MatViews.CountStar(_), MatViews.CountStar(_)) => true
      case (MatViews.CountCol(_, x), MatViews.CountCol(_, y)) => x == y
      case (MatViews.SumCol(_, x), MatViews.SumCol(_, y)) => x == y
      case (MatViews.SumNCol(_, x), MatViews.SumNCol(_, y)) => x == y
      case (MatViews.MinCol(_, x), MatViews.MinCol(_, y)) => x == y
      case (MatViews.MaxCol(_, x), MatViews.MaxCol(_, y)) => x == y
      case (MatViews.CountDCol(_, x), MatViews.CountDCol(_, y)) => x == y
      case (MatViews.AvgCol(_, x, p1, s1), MatViews.AvgCol(_, y, p2, s2))
        => x == y && p1 == p2 && s1 == s2
      case _ => false
    }

  private def sameShape(user: MatViews.AggShape,
      mv: MatViews.AggShape): Boolean =
    user.srcDb == mv.srcDb && user.srcTable == mv.srcTable &&
      user.filterSql == mv.filterSql &&
      // HAVING views filter at read time over hidden columns — their
      // visible set diverges from storage; out of exact-match scope
      mv.havingSql.isEmpty && user.havingSql.isEmpty &&
      mv.visible.isEmpty &&
      user.dims.map(d => (d.db, d.table, d.condSql)) ==
        mv.dims.map(d => (d.db, d.table, d.condSql)) &&
      sameSpecs(user.specs, mv.specs)

  /** Fresh = the backing table's AUTHORITATIVE bookkeeping (watermark,
    * dim pins, tz — all advanced in the same transaction as the data)
    * matches the live heads. */
  private def fresh(spark: SparkSession, warehouse: String,
      mv: MatViews.AggShape, backing: LakeTable): Boolean = {
    val props = backing.metadata.properties
    val srcHead = LakeTable.load(warehouse, mv.srcDb, mv.srcTable)
      .metadata.snapshots.map(_.id).foldLeft(0L)(math.max)
    if (!props.get("graft.mat-view.watermark").contains(srcHead.toString))
      return false
    // a byte-moved dim (compaction/zorder past the pin) is still
    // row-identical to the pinned image — content-fresh for rewriting
    val dimsFresh = mv.dims.forall { d =>
      val t = LakeTable.load(warehouse, d.db, d.table)
      props.get(MatViews.dimPinKey(d))
        .exists(pin => MatViews.dimContentUnmoved(t, pin))
    }
    dimsFresh && (!mv.tzSensitive || props.get("graft.mat-view.tz")
      .contains(spark.sessionState.conf.sessionLocalTimeZone))
  }

  private def rewriteAgg(spark: SparkSession,
      agg: Aggregate): Option[LogicalPlan] = {
    val wh = warehouseOf(agg.child).getOrElse(return None)
    val userShape = MatViews.detect(agg, wh).getOrElse(return None)
    // scan the warehouse's view docs for a fresh exact-shape MV; the
    // scan is O(views) tiny JSON reads and only runs for queries that
    // already ARE lake aggregates
    val whPath = java.nio.file.Paths.get(wh)
    if (!Files.isDirectory(whPath)) return None
    val dbs = scala.util.Using.resource(Files.list(whPath)) { st =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator)
        .asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).filterNot(_.startsWith("_")).toList
    }
    val candidates = dbs.flatMap { db =>
      val vdir = LakeViews.dir(wh, db)
      if (!Files.isDirectory(vdir)) Nil
      else scala.util.Using.resource(Files.list(vdir)) { st =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator)
          .asScala.filter(_.getFileName.toString.endsWith(".json"))
          .flatMap(p => LakeViews.read(p)).toList
      }.filter(_.properties.get("graft.mat-view").contains("true"))
        .map(doc => (db, doc))
    }
    val hit = candidates.iterator.flatMap { case (db, doc) =>
      try {
        for {
          mvShape <- MatViews.decode(doc.properties)
          if sameShape(userShape, mvShape)
          matTable <- doc.properties.get("graft.mat-view.table")
          backing = LakeTable.load(wh, db, matTable)
          if fresh(spark, wh, mvShape, backing)
        } yield (db, doc.name, mvShape, backing)
      } catch { case scala.util.control.NonFatal(_) => None }
    }.take(1).toList.headOption
    hit.map { case (db, viewName, mvShape, backing) =>
      val visible = MatViews.visibleFrame(backing.read(spark), mvShape)
      val child = visible.queryExecution.analyzed
      // positional correspondence is guaranteed by sameSpecs (order
      // included); keep the user's names and exprIds so the parent
      // operators' references stay bound
      val out = agg.aggregateExpressions.map(_.toAttribute)
      if (out.map(_.dataType) != child.output.map(_.dataType))
        agg // type drift — refuse silently, the scan stays correct
      else {
        lastRewrite = Some((db, viewName))
        Project(out.zip(child.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId)
        }, child)
      }
    }
  }
}
