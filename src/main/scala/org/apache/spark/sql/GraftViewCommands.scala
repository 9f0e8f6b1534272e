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
  * THREE-part view identifiers (catalog.db.view) intercept — 1/2-part
  * names keep meaning session-catalog / temp views — and each command
  * carries the DELEGATE's parse of the original statement as a
  * fallback: a 3-part name whose catalog is not a `ViewCatalog`
  * (e.g. `spark_catalog.default.v`) executes the stock plan instead
  * of breaking previously-valid SQL.
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

  /** The target's ViewCatalog, or None → the caller should run its
    * stock-plan fallback (unregistered catalog, or one that doesn't
    * support views — both were valid statements before interception).
    */
  def viewCatalogOf(spark: SparkSession, ident: Seq[String])
      : Option[(org.apache.spark.sql.connector.catalog.ViewCatalog,
        Array[String], String)] =
    ident match {
      case Seq(cat, db, name) =>
        (try Some(spark.sessionState.catalogManager.catalog(cat))
         catch { case _: Exception => None }) match {
          case Some(vc: org.apache.spark.sql.connector.catalog
              .ViewCatalog) => Some((vc, Array(db), name))
          case _ => None
        }
      case _ => None
    }

  def runFallback(spark: SparkSession,
      fallback: () => LogicalPlan): Seq[Row] = {
    GraftPlanBridge.ofRows(spark, fallback()).collect()
    Seq.empty
  }

}

case class GraftCreateViewCommand(ident: Seq[String], query: String,
    replace: Boolean, ifNotExists: Boolean,
    cols: Seq[(String, String)] = Seq.empty,
    props: Map[String, String] = Map.empty,
    fallback: () => LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (vc, ns, name) = GraftViewCommands.viewCatalogOf(spark, ident)
      .getOrElse(return GraftViewCommands.runFallback(spark, fallback))
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
    // an explicit column list renames the output POSITIONALLY (and may
    // attach per-column comments) — the recorded schema carries the
    // aliases, the stored query keeps its own names
    require(cols.isEmpty || cols.size == analyzed.schema.size,
      s"view column list has ${cols.size} name(s) but the query " +
        s"produces ${analyzed.schema.size} column(s)")
    // the graft.* property namespace is ENGINE bookkeeping (mat-view
    // markers and friends) — a user-set value would make a plain view
    // impersonate internal state
    require(!props.keys.exists(_.startsWith("graft.")),
      "view properties in the 'graft.' namespace are reserved for " +
        "the engine")
    val schema =
      if (cols.isEmpty) analyzed.schema
      else org.apache.spark.sql.types.StructType(
        analyzed.schema.fields.zip(cols).map { case (f, (a, _)) =>
          f.copy(name = a) })
    val jprops = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => jprops.put(k, v) }
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      id, query, spark.sessionState.catalogManager.currentCatalog.name(),
      spark.sessionState.catalogManager.currentNamespace,
      schema, analyzed.schema.fieldNames,
      cols.map(_._1).toArray, cols.map(_._2).toArray, jprops)
    if (replace) vc.replaceView(info, true) else vc.createView(info)
    Seq.empty
  }
}

/** `SHOW CREATE VIEW cat.db.name` — reconstructs a statement that
  * round-trips through this parser: column aliases + comments,
  * TBLPROPERTIES, and the stored defining SQL.
  */
case class GraftShowCreateViewCommand(ident: Seq[String],
    fallback: () => LogicalPlan) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions
      .Attribute] =
    Seq(AttributeReference("createview_stmt", StringType,
      nullable = false)())

  private def sq(s: String): String = s"'${s.replace("'", "''")}'"

  override def run(spark: SparkSession): Seq[Row] = {
    val (lc, db, name) = GraftViewCommands.lakeViewTarget(spark, ident)
      .getOrElse(
        return GraftPlanBridge.ofRows(spark, fallback()).collect().toSeq)
    val doc = LakeViews.read(LakeViews.path(lc.warehousePath, db, name))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array(db), name)))
    // a materialized view's stored version SQL is the INTERNAL
    // backing-table projection — emitting it as CREATE VIEW would
    // round-trip into a broken plain view over __mat_*; emit the real
    // MV definition instead
    if (doc.properties.get("graft.mat-view").contains("true"))
      doc.properties.get("graft.mat-view.sql").foreach { defSql =>
      return Seq(Row(
        s"CREATE MATERIALIZED VIEW ${ident.mkString(".")}\nAS $defSql"))
    }
    val v = doc.current
    val colsPart =
      if (v.columnAliases.isEmpty && v.columnComments.forall(_.isEmpty))
        ""
      else {
        val names =
          if (v.columnAliases.nonEmpty) v.columnAliases
          else org.apache.spark.sql.types.DataType.fromJson(v.schemaJson)
            .asInstanceOf[org.apache.spark.sql.types.StructType]
            .fieldNames.toSeq
        val comments = v.columnComments.padTo(names.size, "")
        " (" + names.zip(comments).map {
          case (n, "") => s"`$n`"
          case (n, c) => s"`$n` COMMENT ${sq(c)}"
        }.mkString(", ") + ")"
      }
    // internal bookkeeping (mat-view markers) is not user DDL — show
    // only the user-settable properties
    val userProps = doc.properties.filterNot(_._1.startsWith("graft."))
    val propsPart =
      if (userProps.isEmpty) ""
      else "\nTBLPROPERTIES (" + userProps.toSeq.sortBy(_._1).map {
        case (k, pv) => s"${sq(k)} = ${sq(pv)}" }.mkString(", ") + ")"
    Seq(Row(s"CREATE VIEW ${ident.mkString(".")}$colsPart$propsPart" +
      s"\nAS ${v.sql}"))
  }
}

/** `DESCRIBE [EXTENDED] cat.db.name` for lake VIEWS — anything that is
  * not a lake view (tables included) executes the stock plan
  * unchanged. Output mirrors stock DESCRIBE (col_name, data_type,
  * comment); EXTENDED appends a `# View Information` section.
  */
case class GraftDescribeViewCommand(ident: Seq[String],
    extended: Boolean, fallback: () => LogicalPlan)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions
      .Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("comment", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val target = GraftViewCommands.lakeViewTarget(spark, ident)
      .flatMap { case (lc, db, name) =>
        LakeViews.read(LakeViews.path(lc.warehousePath, db, name))
          .map(doc => (lc, db, name, doc))
      }.getOrElse(
        return GraftPlanBridge.ofRows(spark, fallback()).collect().toSeq)
    val (lc, db, name, doc) = target
    val v = doc.current
    val schema = org.apache.spark.sql.types.DataType.fromJson(v.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val comments = v.columnComments.padTo(schema.size, "")
    val colRows = schema.fields.zip(comments).map { case (f, c) =>
      Row(f.name, f.dataType.simpleString, if (c.isEmpty) null else c)
    }.toSeq
    if (!extended) colRows
    else colRows ++ Seq(
      Row("", "", null),
      Row("# View Information", "", null),
      Row("View Text", v.sql, null),
      Row("View Catalog", v.currentCatalog, null),
      Row("View Namespace", v.currentNamespace.mkString("."), null),
      Row("View Query Output Columns",
        v.queryColumnNames.mkString("[", ", ", "]"), null),
      Row("View Version", s"${doc.currentVersionId} of " +
        s"${doc.versions.size}", null)) ++
      matViewRows(lc, db, doc) ++
      doc.properties.toSeq.sortBy(_._1).map { case (k, pv) =>
        Row(s"View Property: $k", pv, null) }
  }

  /** Materialized-view section: the backing table, the AUTHORITATIVE
    * watermark and snapshot pins (table properties, stamped in the
    * same transaction as the data — the doc copies are advisory), the
    * recorded incremental shape, and the last refresh-history entry.
    */
  private def matViewRows(lc: graft.sources.LakeCatalog, db: String,
      doc: LakeViews.ViewDoc): Seq[Row] = {
    if (!doc.properties.get("graft.mat-view").contains("true"))
      return Seq.empty
    val mat = doc.properties("graft.mat-view.table")
    val backingProps =
      if (graft.lake.LakeTable.exists(lc.warehousePath, db, mat))
        graft.lake.LakeTable.load(lc.warehousePath, db, mat)
          .metadata.properties
      else Map.empty[String, String]
    val lastRefresh = LakeViews.readRefreshes(
      LakeViews.refreshLogPath(lc.warehousePath, db, doc.name))
      .lastOption
    Seq(
      Row("", "", null),
      Row("# Materialized View Information", "", null),
      Row("Backing Table", s"$db.$mat", null),
      Row("Incremental Shape",
        graft.sources.MatViewDdl.describeShape(doc.properties), null),
      Row("Watermark (authoritative)", backingProps
        .getOrElse("graft.mat-view.watermark", "-"), null)) ++
      backingProps.toSeq.sortBy(_._1)
        .filter(_._1.startsWith("graft.mat-view.dim-watermark."))
        .map { case (k, pv) => Row("Dim Pin: " +
          k.stripPrefix("graft.mat-view.dim-watermark."), pv, null) } ++
      lastRefresh.map(e => Row("Last Refresh",
        s"${e.mode}/${e.strategy} (${e.fromSnapshot}, " +
          s"${e.toSnapshot}] ${e.outcome} ${e.durationMs}ms",
        null)).toSeq
  }
}

case class GraftDropViewCommand(ident: Seq[String], ifExists: Boolean,
    fallback: () => LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (vc, ns, name) = GraftViewCommands.viewCatalogOf(spark, ident)
      .getOrElse(return GraftViewCommands.runFallback(spark, fallback))
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
    set: Map[String, String], unset: Seq[String],
    fallback: () => LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (vc, ns, name) = GraftViewCommands.viewCatalogOf(spark, ident)
      .getOrElse(return GraftViewCommands.runFallback(spark, fallback))
    // same namespace reservation as CREATE: graft.* is engine state
    require(!(set.keys ++ unset).exists(_.startsWith("graft.")),
      "view properties in the 'graft.' namespace are reserved for " +
        "the engine")
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

case class GraftRenameViewCommand(from: Seq[String], to: Seq[String],
    fallback: () => LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (vc, ns, name) = GraftViewCommands.viewCatalogOf(spark, from)
      .getOrElse(return GraftViewCommands.runFallback(spark, fallback))
    // the target keeps ITS namespace (cross-db rename is supported by
    // the catalog); a different target CATALOG is a move this command
    // cannot express — refuse rather than silently renaming in-place
    val (toNs, toName) = to match {
      case Seq(cat, db, n) =>
        require(cat == from.head,
          s"RENAME TO cannot move a view across catalogs " +
            s"(${from.head} -> $cat)")
        (Array(db), n)
      case Seq(db, n) => (Array(db), n)
      case Seq(n) => (ns, n)
      case other => throw new IllegalArgumentException(
        s"RENAME TO expects a view name, got ${other.mkString(".")}")
    }
    vc.renameView(
      org.apache.spark.sql.connector.catalog.Identifier.of(ns, name),
      org.apache.spark.sql.connector.catalog.Identifier.of(toNs, toName))
    Seq.empty
  }
}

/** `CREATE MATERIALIZED VIEW [IF NOT EXISTS] cat.db.name AS query` —
  * the SQL spelling of `CALL system.create_mat_view` (both run
  * [[graft.sources.MatViewDdl]]). No stock-plan fallback: the
  * statement does not exist in vanilla Spark, so a non-lake target is
  * a named error, never silently something else.
  */
case class GraftCreateMatViewCommand(ident: Seq[String], query: String,
    ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (lc, db, name) = GraftViewCommands.lakeViewTarget(spark, ident)
      .getOrElse(throw new UnsupportedOperationException(
        "CREATE MATERIALIZED VIEW needs a lake-catalog " +
          s"catalog.db.name target, got '${ident.mkString(".")}'"))
    if (ifNotExists && graft.sources.MatViewDdl.isMatView(
        lc.warehousePath, db, name))
      return Seq.empty
    // IF NOT EXISTS must not swallow a PLAIN view of the same name —
    // "nothing happened" would leave the user believing an MV exists;
    // create() below refuses it by name instead
    graft.sources.MatViewDdl.create(spark, lc.warehousePath, lc.name(),
      db, name, query)
    Seq.empty
  }
}

/** `DROP MATERIALIZED VIEW [IF EXISTS] cat.db.name` — refuses plain
  * views (those are `DROP VIEW`'s job); the catalog's dropView removes
  * the hidden backing table with the view document.
  */
case class GraftDropMatViewCommand(ident: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (lc, db, name) = GraftViewCommands.lakeViewTarget(spark, ident)
      .getOrElse(throw new UnsupportedOperationException(
        "DROP MATERIALIZED VIEW needs a lake-catalog " +
          s"catalog.db.name target, got '${ident.mkString(".")}'"))
    val doc = LakeViews.read(LakeViews.path(lc.warehousePath, db, name))
    if (doc.isEmpty) {
      if (ifExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array(db), name))
    }
    require(doc.get.properties.get("graft.mat-view").contains("true"),
      s"view '$db.$name' is not a materialized view — use DROP VIEW")
    lc.dropView(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array(db), name))
    Seq.empty
  }
}

/** `REFRESH MATERIALIZED VIEW cat.db.name [FULL | INCREMENTAL]` — the
  * SQL spelling of `CALL system.refresh_mat_view`; returns the same
  * one-row result (the output schema follows the mode, which is known
  * at parse time).
  */
case class GraftRefreshMatViewCommand(ident: Seq[String], mode: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions
      .Attribute] =
    if (mode == "incremental")
      Seq(AttributeReference("from_snapshot", LongType,
        nullable = false)(),
        AttributeReference("to_snapshot", LongType, nullable = false)())
    else
      Seq(AttributeReference("snapshot_id", LongType, nullable = false)(),
        AttributeReference("rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (lc, db, name) = GraftViewCommands.lakeViewTarget(spark, ident)
      .getOrElse(throw new UnsupportedOperationException(
        "REFRESH MATERIALIZED VIEW needs a lake-catalog " +
          s"catalog.db.name target, got '${ident.mkString(".")}'"))
    graft.sources.MatViewDdl.refresh(spark, lc.warehousePath, db, name,
      mode) match {
      case graft.sources.MatViewDdl.IncrementalRefresh(from, to) =>
        Seq(Row(from, to))
      case graft.sources.MatViewDdl.FullRefresh(sid, rows) =>
        Seq(Row(sid, rows))
    }
  }
}

case class GraftShowViewsCommand(namespace: Seq[String],
    fallback: () => LogicalPlan) extends LeafRunnableCommand {
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
    val vc = (try Some(spark.sessionState.catalogManager.catalog(cat))
      catch { case _: Exception => None }) match {
      case Some(v: org.apache.spark.sql.connector.catalog.ViewCatalog) => v
      case _ =>
        return GraftPlanBridge.ofRows(spark, fallback()).collect().toSeq
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
object GraftViewSubstitution {
  /** `spark.sql` as an extensions-enabled session would run it: the
    * graft parser over the session's delegate, then the view
    * substitution, then analysis. The one bridge for sessions built
    * WITHOUT the extensions (driver mains, procedure internals,
    * specs) — every caller shares this instead of re-assembling the
    * parser/rule pair.
    */
  def sql(spark: SparkSession, q: String): DataFrame =
    sql(spark, q, rewrite = false)

  /** With `rewrite = true`, also applies the materialized-view
    * aggregate rewrite ([[graft.sources.MatViewRewrite]]) after
    * analysis — matching what an extensions session does for every
    * query. The default stays OFF for this bridge: its internal
    * callers (CREATE MATERIALIZED VIEW's shape detection, full-refresh
    * recomputes, oracle self-audits) must evaluate against the raw
    * sources, never against a view that happens to match.
    */
  def sql(spark: SparkSession, q: String, rewrite: Boolean): DataFrame = {
    val parser = new GraftSqlParser(GraftPlanBridge.sessionParser(spark))
    val df = GraftPlanBridge.ofRows(spark,
      GraftViewSubstitution(spark)(parser.parsePlan(q)))
    if (!rewrite) df
    else {
      val analyzed = df.queryExecution.analyzed
      val rewritten = graft.sources.MatViewRewrite(spark, analyzed)
      if (rewritten eq analyzed) df
      else GraftPlanBridge.ofRows(spark, rewritten)
    }
  }
}

case class GraftViewSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith

  override def apply(plan: LogicalPlan): LogicalPlan =
    expand(plan, Seq.empty)

  /** resolveOperatorsUp, but ALSO through CTE definitions (which live
    * in `UnresolvedWith.cteRelations`, not in `children` — the
    * analyzer inlines them later) and expression subqueries — a view
    * reference inside either must behave exactly like one in the main
    * query body.
    */
  private def everywhere(plan: LogicalPlan)(
      pf: PartialFunction[LogicalPlan, LogicalPlan]): LogicalPlan =
    plan.resolveOperatorsUpWithSubqueriesAndPruning(
      org.apache.spark.sql.catalyst.trees.AlwaysProcess.fn) {
      case w: UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, sa, o) =>
          (n, everywhere(sa)(pf).asInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias],
            o)
        })
      case p if pf.isDefinedAt(p) => pf(p)
    }

  /** Nested views expand EAGERLY (inside one rule application) with
    * the expansion path threaded through — a definition cycle fails
    * with the named chain instead of burning the analyzer's iteration
    * budget on ever-growing plans.
    */
  private def expand(plan: LogicalPlan,
      stack: Seq[String]): LogicalPlan =
    everywhere(plan) {
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
                val v = doc.current
                val parsed = spark.sessionState.sqlParser
                  .parsePlan(v.sql)
                val expanded = expand(qualify(parsed, v.currentCatalog,
                  v.currentNamespace), stack :+ key)
                // a declared column list renames the query's output
                // positionally (`CREATE VIEW v (a, b) AS ...`) — same
                // node the parser uses for `SELECT * FROM (q) t(a, b)`
                val aliased =
                  if (v.columnAliases.isEmpty) expanded
                  else org.apache.spark.sql.catalyst.analysis
                    .UnresolvedSubqueryColumnAliases(
                      v.columnAliases, expanded)
                // the multi-part alias keeps qualified column
                // references (`d.big.id`) resolvable, like a table
                org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
                  Seq(lc.name(), db, name), aliased)
              }
          }.getOrElse(u)
    }

  /** Apply the view's CAPTURE CONTEXT (the catalog + namespace its
    * names resolved against at CREATE): 1/2-part relation names in
    * the stored SQL complete to that context, so the view reads the
    * same tables from ANY session regardless of the reader's current
    * catalog. Names bound by a CTE in the same definition are left
    * alone — they are not tables.
    */
  private def qualify(plan: LogicalPlan, cat: String,
      ns: Seq[String]): LogicalPlan = {
    if (cat == null || cat.isEmpty) return plan
    def cteNames(p: LogicalPlan): Set[String] = p.collect {
      case w: UnresolvedWith =>
        w.cteRelations.map(_._1.toLowerCase(java.util.Locale.ROOT))
          .toSet ++
          w.cteRelations.map(t => cteNames(t._2))
            .foldLeft(Set.empty[String])(_ ++ _)
    }.foldLeft(Set.empty[String])(_ ++ _)
    val bound = cteNames(plan)
    everywhere(plan) {
      case u: UnresolvedRelation if u.multipartIdentifier.length < 3 &&
          !(u.multipartIdentifier.length == 1 && bound.contains(
            u.multipartIdentifier.head
              .toLowerCase(java.util.Locale.ROOT))) =>
        val parts = u.multipartIdentifier match {
          case Seq(n) => (cat +: ns) :+ n
          case Seq(d, n) => Seq(cat, d, n)
          case other => other
        }
        u.copy(multipartIdentifier = parts)
    }
  }
}
