package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables.dec

/** Core relational inventory (SURVEY.md §2.B): scan/projection, filter
  * pushdown, the flagship pricing summary (TPC-H Q1 shape), distinct
  * aggregation, and the full join family. Every query ends in a
  * total-order ORDER BY on a unique key tuple. Money math runs in
  * DECIMAL(18,4) internally (exact, order-independent) but every
  * OUTPUT column is DOUBLE/BIGINT/STRING: the driver compares via
  * pandas, where a Spark-parquet decimal loads as decimal.Decimal
  * while DuckDB's .df() yields float64 — same values, different
  * dtype, hash mismatch (CORRECTNESS_r01). decimal→double is
  * correctly rounded in both engines, so the doubles are
  * bit-identical.
  *
  * Scale posture (100 TB): filters/projections push into the Parquet
  * scan (verified via explain: PushedFilters/ReadSchema); aggregations
  * are partial+final hash aggregates (map-side combine); `part` and
  * other dims are broadcast so the fact table never shuffles for those
  * joins; fact-fact joins (lineitem⋈orders) shuffle once on the join
  * key and AQE handles skew.
  */
object Relational extends QueryModule {
  private val D = DecimalType(18, 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"),
          (dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
            .cast(D).cast("double").as("net_price"))
        .orderBy("l_orderkey", "l_linenumber", "qty", "net_price")
    }),

    "q_filter_pred" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_returnflag").isin("A", "R") &&
          col("l_quantity") < 24 &&
          col("l_partkey").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        // (l_orderkey, l_linenumber) is NOT unique in the testdata —
        // sort on the full output row for a total order
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    }),

    "q_pricing_summary" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum((dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
            .cast(D)).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_agg_distinct" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("distinct_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    "q_join_inner" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_name"),
          col("o_totalprice").as("totalprice"))
        .orderBy("o_orderkey")
    }),

    "q_join_broadcast" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
        .groupBy("p_brand")
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy("p_brand")
    }),

    "q_join_sortmerge" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"), "inner")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    "q_join_outer" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
        .groupBy(col("o_orderkey"))
        .agg(count(col("l_linenumber")).as("n_lines"))
        .orderBy("o_orderkey")
    }),

    "q_join_semi" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_join_anti" -> ((s, dir) => {
      // customers with no completed ('F') order — the status filter
      // keeps the result non-degenerate at every scale factor
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_join_theta_range" -> ((s, dir) => {
      // Self range join bounded by an equi key (user_id): Catalyst plans
      // the equality as a hash/sort-merge join and applies the time-range
      // predicate as a post-join filter, so there is no cartesian blowup
      // at scale — per-user pair counts stay bounded by the 10-minute
      // window. Column names are disjoint to avoid Dataset self-join
      // ambiguity tagging.
      val e = Tables(s, dir, "events")
      val a = e.select(col("user_id").as("u"), col("ts").as("ts1"))
      val b = e.select(col("user_id").as("u2"), col("ts").as("ts2"))
      a.join(b, col("u") === col("u2") &&
          col("ts2") > col("ts1") &&
          col("ts2") <= col("ts1") + expr("INTERVAL 10 MINUTES"))
        .groupBy(col("u"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("u")
    }),

    "q_join_asof" -> ((s, dir) => {
      // As-of join: each 'view' event -> latest 'click' of the same user
      // with click.ts <= view.ts. Spark-first emulation: union both
      // streams, one window pass per user (single shuffle, linear state)
      // carrying the last click forward — no range-join explosion.
      // (user_id, ts) is unique in the data, so the match is unique.
      val e = Tables(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("c_id"),
          lit(null).cast("long").as("v_id"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          lit(null).cast("long").as("c_id"), col("event_id").as("v_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts"), col("c_id").asc_nulls_last)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      clicks.unionByName(views)
        .withColumn("match_c_id", last(col("c_id"), ignoreNulls = true).over(w))
        .withColumn("match_c_ts",
          last(when(col("c_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
        .filter(col("v_id").isNotNull)
        .select(col("user_id"), col("v_id"), col("ts").as("v_ts"),
          col("match_c_id"), col("match_c_ts"))
        .orderBy("user_id", "v_ts", "v_id")
    }),

    "q_subquery_scalar" -> ((s, dir) => {
      // scalar subquery — Catalyst decorrelates to a broadcast of the
      // single aggregated value; decimal avg pinned as sum/count
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_totalprice AS totalprice
          |FROM orders_v
          |WHERE o_totalprice > (
          |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |           / count(*) * 1.5
          |  FROM orders_v)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    "q_sort_limit" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("totalprice"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber,
        | l_quantity AS qty,
        | CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, qty, net_price""".stripMargin,

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_returnflag IN ('A','R') AND l_quantity < 24 AND l_partkey IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus""".stripMargin,

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS distinct_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice AS totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT p_brand,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_sortmerge" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_outer" ->
      """SELECT o_orderkey, count(l_linenumber) AS n_lines
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice AS totalprice
        |FROM orders ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice AS totalprice
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |           / count(*) * 1.5
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_theta_range" ->
      """SELECT e1.user_id AS u, count(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND CAST(e2.ts AS TIMESTAMP) > CAST(e1.ts AS TIMESTAMP)
        | AND CAST(e2.ts AS TIMESTAMP) <= CAST(e1.ts AS TIMESTAMP) + INTERVAL '10 minutes'
        |GROUP BY u ORDER BY u""".stripMargin,

    "q_join_asof" ->
      """SELECT v.user_id, v.event_id AS v_id, CAST(v.ts AS TIMESTAMP) AS v_ts,
        |  c.event_id AS match_c_id, CAST(c.ts AS TIMESTAMP) AS match_c_ts
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND CAST(v.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        |ORDER BY v.user_id, v_ts, v_id""".stripMargin,
  )
}
