package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.{LakeCatalog, LakeViews}

/** SQL surface for the lake catalog's persistent views. Stock Spark
  * 4.1 routes every view statement to the SESSION catalog and throws
  * `MISSING_CATALOG_ABILITY.VIEWS` for a v2 catalog identifier, so —
  * exactly like the PARTITION FIELD DDL — the statements intercept in
  * [[GraftSqlParser]] and execute against the catalog plugin's
  * `ViewCatalog` API; `SELECT` resolution happens in
  * [[GraftViewSubstitution]] (the Iceberg-extensions play). Only
  * THREE-part view identifiers (catalog.db.view) intercept: 1/2-part
  * names keep meaning session-catalog / temp views.
  */
private[sql] object GraftViewCommands {

  /** The (catalog plugin, db, name) behind a 3-part identifier when
    * the catalog is a lake catalog; None otherwise.
    */
  def lakeViewTarget(spark: SparkSession, ident: Seq[String])
      : Option[(LakeCatalog, String, String)] = ident match {
    case Seq(cat, db, name) =>
      try spark.sessionState.catalogManager.catalog(cat) match {
        case lc: LakeCatalog => Some((lc, db, name))
        case _ => None
      } catch { case _: Exception => None }
    case _ => None
  }

  def viewCatalogOf(spark: SparkSession, ident: Seq[String])
      : (org.apache.spark.sql.connector.catalog.ViewCatalog, Array[String],
        String) =
    ident match {
      case Seq(cat, db, name) =>
        (spark.sessionState.catalogManager.catalog(cat) match {
          case vc: org.apache.spark.sql.connector.catalog.ViewCatalog => vc
          case other => throw new UnsupportedOperationException(
            s"catalog ${other.name} does not support views")
        }, Array(db), name)
      case _ => throw new IllegalArgumentException(
        s"expected catalog.db.view, got ${ident.mkString(".")}")
    }
}

case class GraftCreateViewCommand(ident: Seq[String], query: String,
    replace: Boolean, ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (vc, ns, name) = GraftViewCommands.viewCatalogOf(spark, ident)
    val id = org.apache.spark.sql.connector.catalog.Identifier.of(ns, name)
    if (ifNotExists && vc.viewExists(id)) return Seq.empty
    // analyze the defining query NOW: a typo'd view must fail at
    // CREATE, and the recorded schema is what readers see. The
    // substitution rule applies here too (idempotent when the session
    // also has it injected) so a view can be defined over other views
    // regardless of how the session was built
    val analyzed = GraftPlanBridge.ofRows(spark,
      GraftViewSubstitution(spark)(
        spark.sessionState.sqlParser.parsePlan(query)))
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      id, query, spark.sessionState.catalogManager.currentCatalog.name(),
      spark.sessionState.catalogManager.currentNamespace,
      analyzed.schema, analyzed.schema.fieldNames,
      Array.empty, Array.empty, new java.util.HashMap[String, String]())
    if (replace) vc.replaceView(info, true) else vc.createView(info)
    Seq.empty
  }
}

case class GraftDropViewCommand(ident: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (vc, ns, name) = GraftViewCommands.viewCatalogOf(spark, ident)
    val dropped = vc.dropView(
      org.apache.spark.sql.connector.catalog.Identifier.of(ns, name))
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(ns, name))
    Seq.empty
  }
}

case class GraftAlterViewPropsCommand(ident: Seq[String],
    set: Map[String, String], unset: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (vc, ns, name) = GraftViewCommands.viewCatalogOf(spark, ident)
    val changes: Seq[org.apache.spark.sql.connector.catalog.ViewChange] =
      set.toSeq.sortBy(_._1).map { case (k, v) =>
        org.apache.spark.sql.connector.catalog.ViewChange.setProperty(k, v)
      } ++ unset.map(
        org.apache.spark.sql.connector.catalog.ViewChange.removeProperty)
    vc.alterView(
      org.apache.spark.sql.connector.catalog.Identifier.of(ns, name),
      changes: _*)
    Seq.empty
  }
}

case class GraftRenameViewCommand(from: Seq[String], to: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (vc, ns, name) = GraftViewCommands.viewCatalogOf(spark, from)
    val toName = to match {
      case Seq(_, _, n) => n
      case Seq(n) => n // RENAME TO v2 — same namespace
      case other => throw new IllegalArgumentException(
        s"RENAME TO expects a view name, got ${other.mkString(".")}")
    }
    vc.renameView(
      org.apache.spark.sql.connector.catalog.Identifier.of(ns, name),
      org.apache.spark.sql.connector.catalog.Identifier.of(ns, toName))
    Seq.empty
  }
}

case class GraftShowViewsCommand(namespace: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions
      .Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "namespace", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "viewName", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "isTemporary", org.apache.spark.sql.types.BooleanType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val Seq(cat, db) = namespace
    val vc = spark.sessionState.catalogManager.catalog(cat) match {
      case v: org.apache.spark.sql.connector.catalog.ViewCatalog => v
      case other => throw new UnsupportedOperationException(
        s"catalog ${other.name} does not support views")
    }
    vc.listViews(db).toSeq.map(id => Row(db, id.name(), false))
  }
}

/** Resolve a `SELECT ... FROM <lakecat>.<db>.<view>` by substituting
  * the view's stored SQL as a subquery (re-parsed fresh, so new table
  * data and even table evolution flow through — Iceberg's
  * ResolveViews shape). Runs inside the analyzer's resolution fixed
  * point, so views over views expand transitively; a definition cycle
  * is detected by the expansion stack and refused by name.
  */
case class GraftViewSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation

  override def apply(plan: LogicalPlan): LogicalPlan =
    expand(plan, Seq.empty)

  /** Nested views expand EAGERLY (inside one rule application) with
    * the expansion path threaded through — a definition cycle fails
    * with the named chain instead of burning the analyzer's iteration
    * budget on ever-growing plans.
    */
  private def expand(plan: LogicalPlan,
      stack: Seq[String]): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        GraftViewCommands.lakeViewTarget(spark, u.multipartIdentifier)
          .flatMap { case (lc, db, name) =>
            LakeViews.read(LakeViews.path(lc.warehousePath, db, name))
              .map { doc =>
                val key = s"${lc.name()}.$db.$name"
                if (stack.contains(key))
                  throw new IllegalStateException(
                    s"recursive view definition: " +
                      (stack :+ key).mkString(" -> "))
                org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
                  name,
                  expand(spark.sessionState.sqlParser
                    .parsePlan(doc.current.sql), stack :+ key))
              }
          }.getOrElse(u)
    }
}
