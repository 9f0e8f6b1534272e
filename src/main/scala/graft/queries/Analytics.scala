package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.dec

/** Round-2 analytics inventory: distribution windows (cume_dist /
  * percent_rank), HAVING, exact correlation/stddev from decimal power
  * sums, ordered string aggregation, correlated scalar subquery,
  * deterministic stratified sampling, text chunking for
  * context-window pipelines, and ln-free TF-IDF.
  *
  * Cross-engine determinism notes:
  *  - cume_dist/percent_rank are rank-count ratios — single correctly
  *    rounded double divisions, identical in Spark and DuckDB.
  *  - corr/stddev run on exact DECIMAL power sums (Σx, Σx², Σxy) and a
  *    closed-form double pass written with the same association order on
  *    both sides. DuckDB's wide-decimal→double cast is NOT correctly
  *    rounded (off by 1 ulp vs Spark/BigDecimal — verified empirically),
  *    so the final statistics are quantized through a narrow decimal
  *    whose scaled integer fits in 2^53: that cast path (exact int →
  *    one correctly-rounded division) is bit-deterministic in both
  *    engines. No engine's streaming `corr()` is used — those depend on
  *    accumulation order.
  *  - TF-IDF uses a rational idf (N/df, no log): every op stays in
  *    correctly-rounded double territory. Transcendentals (ln/exp) are
  *    the only cross-engine hazard and are avoided by design.
  *  - sampling uses an explicit affine hash mod 1000 — engine-portable,
  *    unlike TABLESAMPLE/rand(seed).
  *
  * Scale posture: chunking/tf-idf are narrow maps + one shuffle per
  * aggregation level; sampling pushes the filter to the scan; the
  * correlated subquery decorrelates to one aggregate + broadcast.
  */
object Analytics extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_asof_exec" -> ((s, dir) => {
      // the custom AsOfJoinExec operator (graft.plans) — same semantics
      // as q_join_asof's window emulation, verified against the same
      // DuckDB ASOF JOIN oracle; physical shape is a sort-merge pass
      val e = Tables(s, dir, "events")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"),
          col("event_id").as("v_id"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      graft.plans.AsOf.join(views, clicks, Seq("user_id"), Seq("c_user"),
          "v_ts", "c_ts")
        .select(col("user_id"), col("v_id"), col("v_ts"),
          col("c_id").as("match_c_id"), col("c_ts").as("match_c_ts"))
        .orderBy("user_id", "v_ts", "v_id")
    }),

    "q_unpivot" -> ((s, dir) => {
      // melt wide columns to (metric, val) rows via stack() — the
      // codegen'd generator form of UNPIVOT; narrow, no shuffle
      Tables(s, dir, "part")
        .selectExpr("p_partkey",
          """stack(2,
            |  'retailprice', p_retailprice,
            |  'size', CAST(p_size AS DOUBLE)) AS (metric, val)""".stripMargin)
        .orderBy("p_partkey", "metric")
    }),

    "q_join_full" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      val su = Tables(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      c.join(su, c("c_custkey") === su("s_suppkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("s_suppkey")).as("k"),
          col("c_name"), col("s_name"))
        .orderBy("k")
    }),

    "q_win_cume" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      c.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("acctbal"),
          cume_dist().over(w).as("cd"),
          percent_rank().over(w).as("pr"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    "q_having" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey")
    }),

    "q_stats_corr" -> ((s, dir) => {
      // exact decimal power sums, then one closed-form double pass —
      // identical association order as the oracle SQL below
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_corr_v")
      s.sql(
        """SELECT l_returnflag, n_rows,
          |  CAST(CAST((n * sxy - sx * sy) /
          |       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
          |    AS DECIMAL(12,9)) AS DOUBLE) AS corr_qty_price,
          |  CAST(CAST(sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))
          |    AS DECIMAL(15,6)) AS DOUBLE) AS stddev_qty
          |FROM (
          |  SELECT l_returnflag, count(*) AS n_rows,
          |    CAST(count(*) AS DOUBLE) AS n,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4)) *
          |             CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |             CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syy,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4)) *
          |             CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
          |  FROM lineitem_corr_v GROUP BY l_returnflag)
          |ORDER BY l_returnflag""".stripMargin)
    }),

    "q_string_agg" -> ((s, dir) => {
      // collect_list order is nondeterministic → array_sort pins it;
      // the oracle pins the same order via string_agg(... ORDER BY)
      Tables(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"),
          concat_ws(",", array_sort(collect_list(col("s_name")))).as("names"))
        .orderBy("s_nationkey")
    }),

    "q_subquery_corr" -> ((s, dir) => {
      // correlated scalar subquery; Catalyst decorrelates it into one
      // per-custkey aggregate joined back (no per-row re-scan)
      Tables(s, dir, "orders").createOrReplaceTempView("orders_corr_v")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
          |FROM orders_corr_v o
          |WHERE o_totalprice > (
          |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |           / count(*) * 1.2
          |  FROM orders_corr_v o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    "q_sample_strat" -> ((s, dir) => {
      // per-stratum rates via a portable affine hash on user_id —
      // deterministic across engines and cluster sizes (no rand())
      val e = Tables(s, dir, "events")
      val bucket = (col("user_id") * lit(48271L) + lit(11L)) % 1000
      val rate = when(col("event_type") === "click", 50)
        .when(col("event_type") === "view", 20).otherwise(100)
      e.filter(bucket < rate)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_sampled"),
          countDistinct(col("user_id")).as("n_users"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    "q_text_chunk" -> ((s, dir) => {
      // fixed-size character chunks with overlap (150-char window,
      // 120 stride) — the context-window prep for an LLM pipeline;
      // narrow generate+substring, no shuffle until the final sort
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("sequence(1L, CAST(length(text) AS BIGINT), 120L)"))
            .as("chunk_start"), col("text"))
        .select(col("doc_id"), col("chunk_start"),
          expr("substring(text, CAST(chunk_start AS INT), 150)").as("chunk"))
        .withColumn("chunk_len", length(col("chunk")))
        .orderBy("doc_id", "chunk_start")
    }),

    "q_tfidf" -> ((s, dir) => {
      // ln-free TF-IDF (rational idf = N/df): top-5 terms per doc.
      // tokenize → (doc,term) counts → doc lengths → doc frequency →
      // score in one reassociation-free double expression.
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 3)
      // Single-chain plan: dfc and dlen come from windows over the tf
      // relation instead of self-joins, so the (doc,term) shuffle runs
      // once and the doc-partitioned window for dlen is REUSED by the
      // ranking window (same partition keys → sort only, no exchange).
      // Three exchanges total: (doc,term) agg → term window → doc
      // window; the old join formulation needed a localCheckpoint plus
      // three shuffle joins to express the same thing.
      // tf is consumed THREE ways (join probe, document-frequency
      // rollup, n_docs) and each consumer prunes a different column
      // set, so the three (doc,term) aggregate subtrees do NOT
      // canonicalize equal and nothing reuses — the r17 before-plan
      // ran 3 documents scans + 3 tokenize passes for one logical pass
      // (plans/r17/q_tfidf_before.txt nodes 1/7/22). localCheckpoint
      // materializes the vocabulary-scale tf relation once; every
      // consumer reads the checkpoint (scan+explode+agg run once).
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      // n_docs = docs contributing at least one token (len > 3) —
      // EXACTLY the distinct doc_ids of tf, so derive it from the
      // checkpointed tf instead of a narrow documents scan with an
      // interpreted HOF re-tokenize per row.
      val n = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
      // Document frequency via groupBy (partial agg collapses each
      // term per-task before the shuffle) + a broadcast join back: a
      // window count over partitionBy(term) would ship every
      // (doc,term) row of a hot term to one reducer with zero map-side
      // combine — a straggler at corpus scale. The df relation is
      // vocab-sized, so broadcasting it keeps the big branch's
      // partitioning intact for the doc-keyed windows below.
      val dfc = broadcast(
        tf.groupBy("term").agg(count(lit(1)).as("dfc")))
      val scored = tf
        .join(dfc, "term")
        .withColumn("dlen", sum(col("cnt")).over(Window.partitionBy("doc_id")))
        .crossJoin(n)
        .withColumn("score",
          col("cnt").cast("double") / col("dlen").cast("double") *
            col("n_docs").cast("double") / col("dfc").cast("double"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("doc_id", "term", "score", "rk")
        .orderBy("doc_id", "rk")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_join_asof_exec" ->
      """SELECT v.user_id, v.event_id AS v_id, CAST(v.ts AS TIMESTAMP) AS v_ts,
        |  c.event_id AS match_c_id, CAST(c.ts AS TIMESTAMP) AS match_c_ts
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND CAST(v.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        |ORDER BY v.user_id, v_ts, v_id""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(c_custkey, s_suppkey) AS k, c_name, s_name
        |FROM customer FULL OUTER JOIN supplier ON c_custkey = s_suppkey
        |ORDER BY k""".stripMargin,

    "q_win_cume" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal,
        |  cume_dist() OVER (PARTITION BY c_mktsegment
        |                    ORDER BY c_acctbal, c_custkey) AS cd,
        |  percent_rank() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS pr
        |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 12 ORDER BY o_custkey""".stripMargin,

    "q_stats_corr" ->
      """SELECT l_returnflag, n_rows,
        |  CAST(CAST((n * sxy - sx * sy) /
        |       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |    AS DECIMAL(12,9)) AS DOUBLE) AS corr_qty_price,
        |  CAST(CAST(sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))
        |    AS DECIMAL(15,6)) AS DOUBLE) AS stddev_qty
        |FROM (
        |  SELECT l_returnflag, count(*) AS n_rows,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) *
        |             CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) *
        |             CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) *
        |             CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "q_string_agg" ->
      """SELECT s_nationkey, count(*) AS n_supp,
        |  string_agg(s_name, ',' ORDER BY s_name) AS names
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q_subquery_corr" ->
      """SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |           / count(*) * 1.2
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_sample_strat" ->
      """SELECT event_type, count(*) AS n_sampled,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE (user_id * 48271 + 11) % 1000 <
        |  CASE event_type WHEN 'click' THEN 50 WHEN 'view' THEN 20 ELSE 100 END
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_text_chunk" ->
      """SELECT doc_id, t.g AS chunk_start,
        |  substr(text, CAST(t.g AS INT), 150) AS chunk,
        |  length(substr(text, CAST(t.g AS INT), 150)) AS chunk_len
        |FROM documents,
        |  UNNEST(generate_series(1, CAST(length(text) AS BIGINT), 120)) AS t(g)
        |ORDER BY doc_id, chunk_start""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |    UNNEST(string_split(lower(text), ' ')) AS t(term)
        |  WHERE length(t.term) > 3),
        |tf AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY 1),
        |dfq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
        |nq AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    CAST(tf.cnt AS DOUBLE) / CAST(dl.dlen AS DOUBLE)
        |      * CAST(nq.n_docs AS DOUBLE) / CAST(dfq.dfc AS DOUBLE) AS score
        |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN nq)
        |SELECT doc_id, term, score, rk FROM (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, term) AS rk
        |  FROM scored) WHERE rk <= 5
        |ORDER BY doc_id, rk""".stripMargin,
  )
}
