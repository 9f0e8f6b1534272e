package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL surface for session transactions over lake tables:
  * `BEGIN TRANSACTION` / `COMMIT` / `ROLLBACK` (stock Spark parses
  * none of these — interception in [[GraftSqlParser]] shadows
  * nothing). Every statement between BEGIN and COMMIT that touches a
  * lake table stages against the transaction's buffered handles —
  * reads see the staged writes, nothing publishes until COMMIT, and
  * COMMIT flips every staged table atomically (the
  * [[graft.lake.LakeTxn]] cross-table protocol when several tables
  * staged). Semantics, scoping, and failure contract live on
  * [[graft.lake.SqlTxn]].
  */
case class GraftBeginTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("status", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    graft.lake.SqlTxn.begin()
    Seq(Row("transaction started"))
  }
}

case class GraftCommitTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("status", StringType, nullable = false)(),
      AttributeReference("tables", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row("committed", graft.lake.SqlTxn.commit()))
}

case class GraftRollbackTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("status", StringType, nullable = false)(),
      AttributeReference("tables", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row("rolled back", graft.lake.SqlTxn.rollback()))
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` /
  * `ALTER TABLE t DROP CONSTRAINT [IF EXISTS] name` — CHECK
  * constraints on lake tables, resolved like the PARTITION FIELD DDL
  * (semantics on [[graft.lake.LakeTable.addConstraint]]).
  */
case class GraftConstraintCommand(table: Seq[String], add: Boolean,
    name: String, condition: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cm = spark.sessionState.catalogManager
    val (cat, db, tbl) = table match {
      case Seq(c, d, t) => (cm.catalog(c), d, t)
      case Seq(d, t) => (cm.currentCatalog, d, t)
      case _ => throw new IllegalArgumentException(
        s"ALTER TABLE ... CONSTRAINT: expected [catalog.]db.table, " +
          s"got ${table.mkString(".")}")
    }
    // constraint DDL validates + publishes in its own transaction —
    // it cannot nest inside an open SQL transaction's buffered handle
    require(graft.lake.SqlTxn.active.isEmpty,
      "constraint DDL does not participate in SQL transactions — " +
        "COMMIT or ROLLBACK first")
    val lake = cat match {
      case lc: graft.sources.LakeCatalog =>
        graft.lake.LakeTable.load(lc.warehousePath, db, tbl)
      case other => throw new UnsupportedOperationException(
        s"catalog ${other.name} is not a graft lake catalog")
    }
    if (add) lake.addConstraint(spark, name, condition)
    else lake.dropConstraint(name, ifExists = ifExists)
    Seq.empty
  }
}
