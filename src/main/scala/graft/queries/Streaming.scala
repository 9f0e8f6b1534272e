package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables.dec

/** Streaming-window inventory (SURVEY.md §2.B): tumbling, sliding and
  * session windows over the events table. Declared here as their exact
  * batch equivalents (same `window`/`session_window` operators Spark
  * uses under Structured Streaming); graft.StreamingSpec runs the same
  * aggregations through readStream + watermark and asserts equality
  * with these batch results.
  *
  * Scale posture: windowed aggregation is a partial+final hash agg on
  * (window, key) — one shuffle; in streaming mode the watermark bounds
  * state so per-key state never grows unboundedly.
  */
object Streaming extends QueryModule {
  private val D = DecimalType(18, 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    "q_stream_sliding" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    "q_stream_session" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .select(col("user_id"), col("first_ts"), col("last_ts"), col("n_events"))
        .orderBy("user_id", "first_ts")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        | time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS window_end,
        | event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    // A 1h window sliding every 30min assigns each event to exactly two
    // windows: the 30-min bucket of ts and the one 30min earlier.
    "q_stream_sliding" ->
      """WITH assigned AS (
        |  SELECT unnest([
        |      time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
        |      time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes'
        |    ]) AS window_start,
        |    event_type, value
        |  FROM events)
        |SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
        | event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM assigned
        |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    // Gaps-and-islands formulation of 30-minute-gap session windows.
    "q_stream_session" ->
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN CAST(ts AS TIMESTAMP)
        |           - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
        |         > INTERVAL '30 minutes'
        |         OR lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts, count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, first_ts""".stripMargin,
  )
}
