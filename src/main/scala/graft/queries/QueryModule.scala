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

object QueryModule {
  /** A cloned session with few shuffle partitions for the fixed-size
    * lifecycle queries (lake DDL round-trips, streaming micro-feeds).
    * Their inputs are tiny or single-digit-MB, so the session-wide
    * partition count (sized for the big scans) only adds per-task and
    * per-state-store overhead — state stores in particular cost files
    * on disk per (partition × micro-batch). newSession() shares the
    * SparkContext and is cheap; conf changes stay isolated, which also
    * keeps Verify's concurrent query threads from seeing them.
    */
  def microSession(s: SparkSession, partitions: Int = 4): SparkSession = {
    val ns = s.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    ns.conf.set("spark.sql.session.timeZone",
      s.conf.get("spark.sql.session.timeZone", "UTC"))
    // Lifecycle fixtures run MANY distinct tiny statements (DDL + DML +
    // micro-batches): per-statement planning dominates, not row count.
    // AQE re-planning buys nothing at <= 4 partitions, and whole-stage
    // codegen costs a Janino compile per novel plan — measured ~10-25%
    // off the lifecycle family at sf0.1 with both disabled (profiled
    // via graft.ProfileLifecycle: ~85 ms/job, all single-task jobs).
    // These stay session-local; the big-scan sessions keep both on.
    ns.conf.set("spark.sql.adaptive.enabled",
      sys.props.getOrElse("graft.micro.aqe", "false"))
    ns.conf.set("spark.sql.codegen.wholeStage",
      sys.props.getOrElse("graft.micro.codegen", "false"))
    // limit-collects (the engine's bounded metadata probes cap at
    // ~1000 rows) otherwise run 2+ incremental jobs per collect
    // (initial=1, scale-up 4): at ≤ 4 partitions one job always
    // covers everything
    ns.conf.set("spark.sql.limit.initialNumPartitions", "32")
    ns
  }

  /** Combinator form of microSession for queries-map entries.
    * Streaming micro-feeds use 1 partition (state stores cost files
    * per partition per micro-batch); batch lifecycle round-trips use 4.
    */
  def micro(partitions: Int)(
      f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(microSession(s, partitions), dir)
}
