package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables.dec

/** Grouping-set aggregations (SURVEY.md §2.B): rollup, cube, explicit
  * GROUPING SETS, and the HLL approximate distinct (no oracle — the
  * estimate is engine-specific).
  *
  * Determinism: rollup/cube emit NULL grouping keys, and Spark sorts
  * NULLS FIRST on ASC while DuckDB defaults NULLS LAST — both sides pin
  * NULLS FIRST explicitly. grouping_id() bit order (first col = MSB)
  * matches DuckDB's GROUPING(), verified empirically.
  *
  * Scale: rollup/cube are partial+final hash aggregates over one
  * shuffle (Expand feeds the same exchange); nation is broadcast.
  */
object Grouping extends QueryModule {
  private val D = DecimalType(18, 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_rollup" -> ((s, dir) => {
      // SQL form: sorting the DataFrame-API rollup of a join output trips
      // Spark 4.1's DetectAmbiguousSelfJoin (the Expand duplicates the
      // join's attributes); the SQL path builds the identical plan
      // without Dataset-level ambiguity tagging.
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables(s, dir, "nation").createOrReplaceTempView("nation_v")
      s.sql(
        """SELECT n_name, c_mktsegment,
          |  grouping_id(n_name, c_mktsegment) AS gid,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
          |  count(*) AS n_cust
          |FROM customer_v JOIN nation_v ON c_nationkey = n_nationkey
          |GROUP BY ROLLUP(n_name, c_mktsegment)
          |ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
          |""".stripMargin)
    }),

    "q_agg_cube" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping_id().as("gid"),
          count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    "q_agg_groupingsets" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_mktsegment, c_nationkey,
          |  grouping_id(c_mktsegment, c_nationkey) AS gid,
          |  count(*) AS n_cust,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
          |FROM customer_v
          |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
          |ORDER BY gid, c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST
          |""".stripMargin)
    }),

    "q_agg_salted" -> ((s, dir) => {
      // Two-phase salted aggregation — the skew pattern for hot keys at
      // 100 TB: phase 1 aggregates on (key, salt) spreading a hot key
      // over 16 reducers, phase 2 merges partials per key. Results are
      // identical to a plain GROUP BY (the oracle), which is the point.
      val li = Tables(s, dir, "lineitem")
      val salted = li
        .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(sum(dec(col("l_quantity"))).as("part_qty"),
          count(lit(1)).as("part_n"))
      salted.groupBy("l_returnflag")
        .agg(sum(col("part_qty")).cast("double").as("sum_qty"),
          sum(col("part_n")).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "q_agg_median" -> ((s, dir) => {
      // exact interpolated percentiles over doubles — both engines sort
      // the same doubles and average the same two middles
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000000)).as("p50_approx"),
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          count(lit(1)).as("n"))
        .drop("p50_approx") // approx variant exercised, not oracle-compared
        .orderBy("l_returnflag")
    }),

    "q_agg_pivot" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
        .withColumnRenamed("P", "n_p")
        .orderBy("o_orderpriority")
    }),

    "q_agg_approx_distinct" -> ((s, dir) => {
      // The one declared key with no DuckDB oracle (HLL estimates are
      // engine-specific), so it SELF-audits: compute the exact
      // countDistinct in the same aggregation and fail loudly if the
      // estimate drifts outside 4× the configured relative standard
      // deviation (default rsd 0.05; 4σ ≈ 1-in-16k false-failure odds
      // per group). Without this, nothing checks the estimate at all —
      // a broken HLL sketch would return garbage with a green row.
      val rsd = 0.05
      val est = Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), rsd).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type")
      auditApproxDistinct(est, rsd)
      est.drop("exact_users")
    }),

    "q_agg_approx_quantile" -> ((s, dir) => {
      // approx_percentile with a BOUNDED accuracy knob (the t-digest /
      // GK-sketch family every warehouse ships) — like the HLL key,
      // the estimate is engine-specific so there is no DuckDB oracle;
      // it SELF-audits against the exact interpolated percentile
      // computed in the same aggregation. accuracy=1000 bounds the
      // rank error at n/1000 per group; the audit allows 4× that rank
      // slack converted to a value bound via the exact p±slack
      // percentiles, failing loudly on a broken sketch.
      val acc = 1000
      val li = Tables(s, dir, "lineitem")
      // the PRODUCTION aggregation is sketch-only over the full
      // fixture — bounded memory at any scale
      val est = li.groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc))
            .as("approx_p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(acc))
            .as("approx_p95"),
          count(lit(1)).as("n"))
      // the AUDIT runs on a deterministic ~5% sample: Spark's exact
      // percentile buffers every value of a group in executor memory,
      // so auditing the full fixture is itself the OOM-shaped path at
      // scale — the sample bounds the buffer while a broken sketch
      // still fails loudly (approx and exact compare on the SAME
      // sampled rows). The band is 4× the sketch's 1/acc rank error
      // PLUS a 2% absolute floor: on a tiny sampled group (~100 rows
      // at the smoke sf) 4/acc is narrower than ONE element, where
      // interpolation granularity and partial-sketch merging — not
      // sketch breakage — dominate; a garbage sketch still lands far
      // outside 2%.
      val slack = 4.0 / acc + 0.02
      val audit = li.filter(col("l_orderkey") % 20 === 0)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc))
            .as("approx_p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(acc))
            .as("approx_p95"),
          expr(s"percentile(l_extendedprice, ${0.5 - slack})").as("lo50"),
          expr(s"percentile(l_extendedprice, ${0.5 + slack})").as("hi50"),
          expr(s"percentile(l_extendedprice, ${0.95 - slack})").as("lo95"),
          expr(s"percentile(l_extendedprice, " +
            s"${math.min(1.0, 0.95 + slack)})").as("hi95"))
      val off = audit.filter(
        col("approx_p50") < col("lo50") ||
          col("approx_p50") > col("hi50") ||
          col("approx_p95") < col("lo95") ||
          col("approx_p95") > col("hi95")).collect()
      require(off.isEmpty,
        "q_agg_approx_quantile: approx_percentile outside the " +
          s"±$slack quantile band of the exact percentile " +
          s"on the audit sample: ${off.mkString(", ")}")
      est.select("l_returnflag", "approx_p50", "approx_p95", "n")
        .orderBy("l_returnflag")
    }),
  )

  /** Fails loudly if any group's `approx_users` differs from
    * `exact_users` by more than `4 × rsd` relatively. The collect is
    * O(groups) — 5 rows here, driver-side by design.
    */
  private[graft] def auditApproxDistinct(est: DataFrame, rsd: Double): Unit = {
    val offBounds = est.filter(
      abs(col("approx_users") - col("exact_users")) >
        col("exact_users") * lit(4 * rsd)).collect()
    require(offBounds.isEmpty,
      s"q_agg_approx_distinct: HLL estimate outside ${4 * rsd * 100}% of " +
        s"exact countDistinct: ${offBounds.mkString(", ")}")
  }

  def oracleSql: Map[String, String] = Map(
    "q_agg_rollup" ->
      """SELECT n_name, c_mktsegment,
        | GROUPING(n_name, c_mktsegment) AS gid,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
        | count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | GROUPING(o_orderstatus, o_orderpriority) AS gid,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_groupingsets" ->
      """SELECT c_mktsegment, c_nationkey,
        | GROUPING(c_mktsegment, c_nationkey) AS gid,
        | count(*) AS n_cust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin,
    "q_agg_median" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_quantity, 0.9) AS p90_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_pivot" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_agg_salted" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // q_agg_approx_distinct: no oracle — HLL estimate is engine-specific.
  )
}
