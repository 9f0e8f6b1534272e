package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows`, which is `private[sql]` (Scala-level
  * only — public in bytecode): the one hook needed to hand a custom
  * LogicalPlan to a session. Standard community-connector technique;
  * uses only the public Spark jar.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ catalyst Expression (same bytecode-public seam the
    * classic DataFrame API uses internally).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** The session's SQL parser (sessionState is Scala-private; public in
    * bytecode) — lets engine code wrap it in [[GraftSqlParser]] for the
    * extension DDL without requiring session-extension registration.
    */
  def sessionParser(spark: SparkSession)
      : org.apache.spark.sql.catalyst.parser.ParserInterface =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser

  /** Verbatim single-part column reference. `Expressions.column` PARSES
    * its argument as a multipart identifier, so a schema-sourced name
    * like "a.b" or "order date" would mis-resolve or throw; this is the
    * non-parsing constructor (Scala-private in the Spark jar, public in
    * bytecode — same seam class as above).
    */
  def fieldRef(name: String)
      : org.apache.spark.sql.connector.expressions.NamedReference =
    org.apache.spark.sql.connector.expressions.FieldReference.column(name)
}
