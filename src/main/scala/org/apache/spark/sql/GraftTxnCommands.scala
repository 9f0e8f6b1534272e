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
