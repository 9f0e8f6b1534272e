package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each module under graft.queries contributes (queries, oracleSql)
  * pairs; keys are unique across modules (asserted at load).
  */
object SparkEntry {
  private def modules: Seq[QueryModule] =
    Seq(Relational, Grouping, Windows, SetOps, ScalarFuncs, Pipeline,
      PipelineSketches, Streaming, LakeQueries, RowOpsQueries, Analytics,
      LakeReadQueries, TrainingOps, CurationOps)

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    require(all.size == all.map(_._1).distinct.size, "duplicate query keys")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] = {
    val all = modules.flatMap(_.oracleSql).toMap
    val orphans = all.keySet -- queries.keySet
    require(orphans.isEmpty, s"oracleSql without query: $orphans")
    all
  }
}
