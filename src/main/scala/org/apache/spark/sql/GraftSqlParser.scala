package org.apache.spark.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** `ALTER TABLE ... ADD/DROP PARTITION FIELD` — Iceberg's partition-
  * spec-evolution DDL, which vanilla Spark cannot parse (Iceberg ships
  * it as a SQL-extensions parser too). Executes against the graft lake
  * catalog via the engine's own spec-evolution commit (reference
  * semantics: `iceberg_helper.py:364-378`). Lives in the spark
  * namespace for the same bytecode-public seams GraftPlanBridge uses
  * (sessionState catalogManager resolution).
  *
  * For DROP, exactly one of (`column`, `transform`) or `asName` names
  * the field (drop-by-transform vs drop-by-name).
  */
case class GraftAlterPartitionFieldCommand(table: Seq[String], add: Boolean,
    column: Option[String], transform: String, asName: Option[String])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cm = spark.sessionState.catalogManager
    val (cat, db, tbl) = table match {
      case Seq(c, d, t) => (cm.catalog(c), d, t)
      case Seq(d, t) => (cm.currentCatalog, d, t)
      case _ => throw new IllegalArgumentException(
        s"ALTER TABLE ... PARTITION FIELD: expected [catalog.]db.table, " +
          s"got ${table.mkString(".")}")
    }
    val lake = cat match {
      case lc: graft.sources.LakeCatalog =>
        graft.lake.LakeTable.load(lc.warehousePath, db, tbl)
      case other => throw new UnsupportedOperationException(
        s"catalog ${other.name} is not a graft lake catalog")
    }
    if (add) lake.addPartitionField(column.get, transform, asName)
    else column match {
      case Some(c) => lake.dropPartitionField(c, transform)
      case None => lake.dropPartitionField(asName.get)
    }
    Seq.empty
  }
}

object GraftSqlParser {
  // AS-name: a bare identifier OR a backtick-quoted one (any content,
  // incl. spaces/dots — doubled backticks escape a literal backtick)
  private val AddRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)(?:\s+AS\s+(`(?:[^`]|``)+`|\w+))?\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""".r

  private val TimeRe = """(?i)^(year|month|day|hour)s?\s*\(\s*([^)]+)\s*\)$""".r
  private val BucketRe = """(?i)^bucket\s*\(\s*(\d+)\s*,\s*([^)]+)\s*\)$""".r
  private val TruncRe =
    """(?i)^truncate\s*\(\s*(\d+)\s*,\s*([^)]+)\s*\)$""".r

  private def clean(c: String): String = {
    val t = c.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1).replace("``", "`")
    else t
  }

  // view DDL (see GraftViewCommands for why these intercept). The
  // identifier group is deliberately conservative — dotted bare/
  // backticked parts — so arbitrary SQL can't false-match
  private val Ident = """((?:`(?:[^`]|``)+`|\w+)(?:\.(?:`(?:[^`]|``)+`|\w+)){0,3})"""
  // optional column-alias list `(a COMMENT 'x', b)` and TBLPROPERTIES
  // before AS; both groups are non-greedy — a comment containing the
  // literal sequence `) AS ` would mis-split (conservative, like every
  // regex statement here: such SQL falls back to a parse error, never
  // silent misbehavior)
  private[sql] val CreateViewRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      Ident + """(?:\s*\((.*?)\))?(?:\s+TBLPROPERTIES\s*\((.*?)\))?""" +
      """\s+AS\s+(.+?)\s*;?\s*$""").r
  private[sql] val DropViewRe =
    ("""(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?""" + Ident +
      """\s*;?\s*$""").r
  // ALTER VIEW and ALTER MATERIALIZED VIEW share one surface: an MV
  // IS a view document, so property edits and renames route the same
  // (the refresh stamp re-reads the doc under the lock, so edits are
  // never clobbered by a concurrent refresh)
  private[sql] val AlterViewSetPropsRe =
    ("""(?is)^\s*ALTER\s+(?:MATERIALIZED\s+)?VIEW\s+""" + Ident +
      """\s+SET\s+TBLPROPERTIES\s*\((.+?)\)\s*;?\s*$""").r
  private[sql] val AlterViewUnsetPropsRe =
    ("""(?is)^\s*ALTER\s+(?:MATERIALIZED\s+)?VIEW\s+""" + Ident +
      """\s+UNSET\s+TBLPROPERTIES\s*\((.+?)\)\s*;?\s*$""").r
  private[sql] val AlterViewRenameRe =
    ("""(?is)^\s*ALTER\s+(?:MATERIALIZED\s+)?VIEW\s+""" + Ident +
      """\s+RENAME\s+TO\s+""" +
      Ident + """\s*;?\s*$""").r
  private[sql] val ShowViewsRe =
    ("""(?is)^\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+""" + Ident +
      """\s*;?\s*$""").r

  private[sql] val ShowCreateViewRe =
    ("""(?is)^\s*SHOW\s+CREATE\s+VIEW\s+""" + Ident + """\s*;?\s*$""").r
  // DESCRIBE intercepts ONLY when the target resolves to a lake view
  // at run time — tables (and anything else) execute the stock plan
  private[sql] val DescribeRe =
    ("""(?is)^\s*(?:DESCRIBE|DESC)\s+(EXTENDED\s+)?""" + Ident +
      """\s*;?\s*$""").r

  private val ColEntryRe =
    """(?is)^\s*(`(?:[^`]|``)+`|\w+)(?:\s+COMMENT\s+('(?:[^']|'')*'))?\s*$""".r

  /** `a COMMENT 'doc', b` → Seq((alias, comment)) — the CREATE VIEW
    * column list; a malformed entry names itself.
    */
  private[sql] def parseColList(s: String): Seq[(String, String)] =
    splitQuoted(s).map {
      case ColEntryRe(name, cmt) =>
        (clean(name), Option(cmt).map(unquote).getOrElse(""))
      case ent => throw new IllegalArgumentException(
        s"view column entry '$ent' is not `name [COMMENT 'text']`")
    }

  // materialized-view DDL: stock Spark has NO materialized views (the
  // statements are parse errors there), so these carry no stock-plan
  // fallback — a non-lake target fails by name instead
  private[sql] val CreateMatViewRe =
    ("""(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      Ident + """\s+AS\s+(.+?)\s*;?\s*$""").r
  private[sql] val DropMatViewRe =
    ("""(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?""" +
      Ident + """\s*;?\s*$""").r
  private[sql] val RefreshMatViewRe =
    ("""(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+""" + Ident +
      """(?:\s+(FULL|INCREMENTAL))?\s*;?\s*$""").r

  // CHECK constraints (Delta/ANSI-style): intercepted like the
  // PARTITION FIELD DDL and routed to the lake table
  private[sql] val AddConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*""" +
      """\((.+)\)\s*;?\s*$""").r
  private[sql] val DropConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+CONSTRAINT\s+(IF\s+EXISTS\s+)?""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""").r

  // session transactions: stock Spark parses none of these (BEGIN
  // alone stays un-intercepted — SQL-scripting compound blocks start
  // with it, so the transaction spelling requires the keyword)
  private[sql] val BeginTxnRe =
    """(?is)^\s*(?:BEGIN|START)\s+(?:TRANSACTION|WORK)\s*;?\s*$""".r
  private[sql] val CommitTxnRe =
    """(?is)^\s*COMMIT(?:\s+(?:TRANSACTION|WORK))?\s*;?\s*$""".r
  private[sql] val RollbackTxnRe =
    """(?is)^\s*ROLLBACK(?:\s+(?:TRANSACTION|WORK))?\s*;?\s*$""".r

  /** Strip one layer of '…'/"…" quoting and unescape the doubled
    * inner quote (`'it''s'` → `it's`).
    */
  private[sql] def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("''", "'")
    else if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t
  }

  /** Split on commas that sit OUTSIDE quoted strings — a property
    * value like 'a, b' must stay one element.
    */
  private[sql] def splitQuoted(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer(new StringBuilder)
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        out.last.append(c)
        // a doubled quote is an escape, not a close
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) {
            out.last.append(quote); i += 1
          } else quote = 0
        }
      } else c match {
        case '\'' | '"' => quote = c; out.last.append(c)
        case ',' => out += new StringBuilder
        case other => out.last.append(other)
      }
      i += 1
    }
    out.map(_.toString.trim).filter(_.nonEmpty).toSeq
  }

  /** `'k'='v', 'k2'='v, with commas'` — the TBLPROPERTIES list shape;
    * a malformed entry names itself instead of a MatchError.
    */
  private[sql] def parseProps(s: String): Map[String, String] =
    splitQuoted(s).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => unquote(k) -> unquote(v)
        case _ => throw new IllegalArgumentException(
          s"TBLPROPERTIES entry '$kv' is not 'key'='value'")
      }
    }.toMap

  /** SQL transform syntax → (engine transform name, source column).
    * `day(ts)`/`days(ts)` → day; `bucket(16, id)` → bucket[16];
    * `truncate(4, s)` → truncate[4]; a bare column → identity. An
    * UNKNOWN `fn(col)` form fails loudly — falling through to identity
    * on the literal text (`zorder(ts)` as a column name) would commit
    * a spec no read can ever prune on.
    */
  private[sql] def parseTransform(raw: String): (String, String) =
    raw.trim match {
      case TimeRe(t, c) => (t.toLowerCase(java.util.Locale.ROOT), clean(c))
      case BucketRe(n, c) => (s"bucket[$n]", clean(c))
      case TruncRe(w, c) => (s"truncate[$w]", clean(c))
      case bare =>
        require(!bare.contains("("),
          s"unsupported partition transform '$bare' — supported: " +
            "identity (bare column), year/month/day/hour(col), " +
            "bucket(n, col), truncate(w, col)")
        ("identity", clean(bare))
    }
}

/** Delegating session parser: intercepts the two PARTITION FIELD
  * statements, hands everything else to Spark's parser unchanged.
  * Registered by `graft.functions.GraftExtensions` (injectParser).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case AddRe(tbl, spec, name) =>
      val (transform, col) = parseTransform(spec)
      GraftAlterPartitionFieldCommand(
        delegate.parseMultipartIdentifier(tbl), add = true,
        Some(col), transform, Option(name).map(clean))
    case DropRe(tbl, spec) =>
      val trimmed = spec.trim
      if (trimmed.contains("(")) {
        val (transform, col) = parseTransform(trimmed)
        GraftAlterPartitionFieldCommand(
          delegate.parseMultipartIdentifier(tbl), add = false,
          Some(col), transform, None)
      } else
        GraftAlterPartitionFieldCommand(
          delegate.parseMultipartIdentifier(tbl), add = false,
          None, "", Some(clean(trimmed)))
    // ---- materialized-view DDL (3-part lake identifiers; these
    // statements do not exist in stock Spark) -------------------------
    case CreateMatViewRe(ifNotExists, ident, query) if is3Part(ident) =>
      GraftCreateMatViewCommand(delegate.parseMultipartIdentifier(ident),
        query.trim, ifNotExists = ifNotExists != null)
    case DropMatViewRe(ifExists, ident) if is3Part(ident) =>
      GraftDropMatViewCommand(delegate.parseMultipartIdentifier(ident),
        ifExists = ifExists != null)
    case RefreshMatViewRe(ident, mode) if is3Part(ident) =>
      GraftRefreshMatViewCommand(delegate.parseMultipartIdentifier(ident),
        mode = Option(mode).map(_.toLowerCase(java.util.Locale.ROOT))
          .getOrElse(""))
    case AddConstraintRe(tbl, name, cond) =>
      GraftConstraintCommand(delegate.parseMultipartIdentifier(tbl),
        add = true, name = name, condition = cond.trim,
        ifExists = false)
    case DropConstraintRe(tbl, ifExists, name) =>
      GraftConstraintCommand(delegate.parseMultipartIdentifier(tbl),
        add = false, name = name, condition = "",
        ifExists = ifExists != null)
    case BeginTxnRe() => GraftBeginTxnCommand()
    case CommitTxnRe() => GraftCommitTxnCommand()
    case RollbackTxnRe() => GraftRollbackTxnCommand()
    // ---- persistent view DDL (3-part identifiers only: 1/2-part
    // names keep meaning session-catalog / temp views, which Spark
    // handles natively) ----------------------------------------------
    case CreateViewRe(orReplace, ifNotExists, ident, colList, props,
        query) if is3Part(ident) =>
      GraftCreateViewCommand(delegate.parseMultipartIdentifier(ident),
        query.trim, replace = orReplace != null,
        ifNotExists = ifNotExists != null,
        cols = Option(colList).map(parseColList).getOrElse(Seq.empty),
        props = Option(props).map(parseProps).getOrElse(Map.empty),
        fallback = () => delegate.parsePlan(sqlText))
    case ShowCreateViewRe(ident) if is3Part(ident) =>
      GraftShowCreateViewCommand(delegate.parseMultipartIdentifier(ident),
        fallback = () => delegate.parsePlan(sqlText))
    case DescribeRe(extended, ident) if is3Part(ident) =>
      GraftDescribeViewCommand(delegate.parseMultipartIdentifier(ident),
        extended = extended != null,
        fallback = () => delegate.parsePlan(sqlText))
    case DropViewRe(ifExists, ident) if is3Part(ident) =>
      GraftDropViewCommand(delegate.parseMultipartIdentifier(ident),
        ifExists = ifExists != null,
        fallback = () => delegate.parsePlan(sqlText))
    case AlterViewSetPropsRe(ident, props) if is3Part(ident) =>
      GraftAlterViewPropsCommand(
        delegate.parseMultipartIdentifier(ident),
        parseProps(props), Seq.empty,
        fallback = () => delegate.parsePlan(sqlText))
    case AlterViewUnsetPropsRe(ident, keys) if is3Part(ident) =>
      GraftAlterViewPropsCommand(
        delegate.parseMultipartIdentifier(ident), Map.empty,
        splitQuoted(keys).map(k => clean(unquote(k))),
        fallback = () => delegate.parsePlan(sqlText))
    case AlterViewRenameRe(ident, to) if is3Part(ident) =>
      GraftRenameViewCommand(delegate.parseMultipartIdentifier(ident),
        delegate.parseMultipartIdentifier(to),
        fallback = () => delegate.parsePlan(sqlText))
    case ShowViewsRe(ns) if ns != null &&
        delegate.parseMultipartIdentifier(ns).length == 2 =>
      GraftShowViewsCommand(delegate.parseMultipartIdentifier(ns),
        fallback = () => delegate.parsePlan(sqlText))
    case _ => delegate.parsePlan(sqlText)
  }

  private def is3Part(ident: String): Boolean =
    try delegate.parseMultipartIdentifier(ident).length == 3
    catch { case _: Exception => false }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
