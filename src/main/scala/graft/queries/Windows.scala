package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables.dec

/** Window-function inventory (SURVEY.md §2.B): top-k per group,
  * ranking family, lag/lead, ROWS and RANGE frames, ntile.
  *
  * Determinism: every window ORDER BY includes a unique tiebreak column
  * except where rank/dense_rank semantics are the point (those are
  * tie-stable by definition). Frame sums run over DECIMAL(18,4) so the
  * result is exact.
  *
  * Scale: each window = one shuffle on its partition keys; top-k per
  * group uses row_number + filter, which Spark executes with a
  * WindowGroupLimit pushdown (rank-limit optimization) so per-group
  * state stays bounded at 100 TB.
  */
object Windows extends QueryModule {
  private val D = DecimalType(18, 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_per_group" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice").as("totalprice"), col("rk"))
        .orderBy("o_custkey", "rk")
    }),

    "q_win_rank" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val wTies = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      val wUnique = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.select(col("o_orderpriority"), col("o_orderkey"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"),
          row_number().over(wUnique).as("rn"))
        .orderBy("o_orderpriority", "rn")
    }),

    "q_win_lag_lead" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      e.select(col("user_id"), col("event_id"), col("ts"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("user_id", "ts", "event_id")
    }),

    "q_win_frame_rows" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      e.select(col("user_id"), col("event_id"), col("ts"),
          sum(dec(col("value"))).over(w).cast("double").as("moving_sum"))
        .orderBy("user_id", "ts", "event_id")
    }),

    "q_win_frame_range" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_sum"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_first_last" -> ((s, dir) => {
      // first_value / last_value / nth_value over an explicit full-frame
      // window (the default frame would stop at CURRENT ROW for last)
      val o = Tables(s, dir, "orders")
      val wFull = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      o.select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(wFull).as("first_order"),
          last(col("o_orderkey")).over(wFull).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_ntile" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      c.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("acctbal"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_custkey")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_topk_per_group" ->
      """SELECT * FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice AS totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q_win_rank" ->
      """SELECT o_orderpriority, o_orderkey,
        | rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
        | dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk,
        | row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders ORDER BY o_orderpriority, rn""".stripMargin,

    "q_win_lag_lead" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q_win_frame_rows" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
        |   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    "q_win_frame_range" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderkey
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_order,
        | last_value(o_orderkey) OVER w AS last_order,
        | nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal,
        | ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
