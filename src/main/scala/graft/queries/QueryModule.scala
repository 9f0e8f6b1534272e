package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of declared queries plus their DuckDB oracle SQL
  * (SURVEY.md §2.B contract). Keys must be globally unique; every
  * oracleSql key must have a matching queries key (enforced in
  * graft.SparkEntry).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
