package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables.dec

/** Scalar-function inventory (SURVEY.md §2.B): string, date, math,
  * array, map and JSON functions. All per-row (no shuffle except the
  * terminal sort); everything stays inside whole-stage codegen.
  *
  * Oracle notes (SURVEY.md §7.8): POSIX-safe regex only; DuckDB lists
  * are 1-indexed (Spark slice/element_at are too); map oracles are
  * written against the *output* semantics because DuckDB's map
  * subscript returns a list; math sticks to exact ops (decimal round,
  * IEEE sqrt/pow) — no libm-dependent exp/ln.
  */
object ScalarFuncs extends QueryModule {
  private val D = DecimalType(18, 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_funcs" -> ((s, dir) => {
      Tables(s, dir, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 8).as("prefix8"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"),
          lpad(col("p_brand"), 12, "#").as("brand_pad"),
          trim(col("p_type")).as("type_trim"),
          col("p_name").like("%widget%").as("is_widget"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), " ", "_").as("snake"))
        .orderBy("p_partkey")
    }),

    "q_date_funcs" -> ((s, dir) => {
      Tables(s, dir, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to_98"),
          last_day(col("o_orderdate")).as("eom"))
        .orderBy("o_orderkey")
    }),

    "q_math_funcs" -> ((s, dir) => {
      Tables(s, dir, "part").select(
          col("p_partkey"),
          col("p_retailprice").as("price"),
          round(dec(col("p_retailprice")), 1).cast("double").as("price_r1"),
          abs(dec(col("p_retailprice")) - lit(1000).cast(D)).cast("double").as("abs_diff"),
          ceil(dec(col("p_retailprice"))).cast("long").as("price_ceil"),
          floor(dec(col("p_retailprice"))).cast("long").as("price_floor"),
          (col("p_size") % 7).as("size_mod7"),
          signum(col("p_retailprice") - 1000.0).cast("int").as("sign_v"),
          pow(lit(2.0), (col("p_size") % 5).cast("double")).as("pow2"),
          sqrt(col("p_size").cast("double")).as("size_sqrt"))
        .orderBy("p_partkey")
    }),

    "q_array_funcs" -> ((s, dir) => {
      Tables(s, dir, "embeddings").select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_val"),
          // slice exercised, but emitted as a scalar: a raw list column
          // breaks the driver's pandas row-sort (ndarray is unhashable)
          element_at(slice(col("embedding"), 1, 3), 3).as("head3_last"),
          array_max(col("embedding")).as("max_val"),
          array_min(col("embedding")).as("min_val"),
          size(filter(col("embedding"), x => x > lit(0.1f))).as("n_big"))
        .orderBy("vec_id")
    }),

    "q_array_explode" -> ((s, dir) => {
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "val")))
        .filter(col("val") > 0.1f)
        .groupBy("vec_id")
        .agg(count(lit(1)).as("n_big"), min(col("pos0") + 1).as("first_pos"))
        .orderBy("vec_id")
    }),

    "q_map_funcs" -> ((s, dir) => {
      val n = Tables(s, dir, "nation").select(col("n_nationkey"),
        map(lit("name"), col("n_name"),
            lit("region"), col("n_regionkey").cast("string")).as("m"))
      n.select(col("n_nationkey"),
          element_at(col("m"), "name").as("name_val"),
          element_at(col("m"), "region").as("region_val"),
          // joined to one string: raw list output breaks the driver compare
          array_join(sort_array(map_keys(col("m"))), ",").as("keys_sorted"),
          size(col("m")).as("m_size"))
        .orderBy("n_nationkey")
    }),

    "q_cond_funcs" -> ((s, dir) => {
      // conditional scalar functions: CASE, coalesce, nullif, nvl2-ish,
      // greatest/least — all codegen'd, all null-propagation-sensitive
      Tables(s, dir, "customer").select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 1000, "low")
            .otherwise("high").as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")),
            lit("(machinery)")).as("seg_or_default"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
          least(col("c_nationkey"), lit(10)).as("nation_cap"),
          (col("c_acctbal") > 0).and(col("c_nationkey") < 20).as("flag"))
        .orderBy("c_custkey")
    }),

    "q_bitwise_funcs" -> ((s, dir) => {
      // bitwise inventory: and/or/xor, shifts, popcount — per-row,
      // codegen'd. DuckDB's ^ is POWER, so the oracle spells xor(a,b)
      Tables(s, dir, "nation").select(
          col("n_nationkey"),
          (col("n_nationkey").bitwiseAND(lit(12))).as("band"),
          (col("n_nationkey").bitwiseOR(lit(5))).as("bor"),
          (col("n_nationkey").bitwiseXOR(lit(9))).as("bxor"),
          shiftleft(col("n_nationkey"), 2).as("shl2"),
          shiftright(col("n_nationkey"), 1).as("shr1"),
          bit_count(col("n_nationkey")).as("pop"))
        .orderBy("n_nationkey")
    }),

    "q_hash_funcs" -> ((s, dir) => {
      // cryptographic digests — the content-addressing primitives the
      // dedup pipeline's exact paths build on; both engines emit
      // lowercase hex
      Tables(s, dir, "customer").select(
          col("c_custkey"),
          md5(col("c_name").cast("binary")).as("name_md5"),
          sha2(col("c_name").cast("binary"), 256).as("name_sha256"),
          length(md5(col("c_name").cast("binary"))).as("md5_len"))
        .orderBy("c_custkey")
    }),

    "q_json_funcs" -> ((s, dir) => {
      Tables(s, dir, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_struct"),
          (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod10"))
        .orderBy("event_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_bitwise_funcs" ->
      """SELECT n_nationkey,
        |  n_nationkey & 12 AS band,
        |  n_nationkey | 5 AS bor,
        |  xor(n_nationkey, 9) AS bxor,
        |  n_nationkey << 2 AS shl2,
        |  n_nationkey >> 1 AS shr1,
        |  bit_count(n_nationkey) AS pop
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_hash_funcs" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  sha256(c_name) AS name_sha256,
        |  CAST(length(md5(c_name)) AS INT) AS md5_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_str_funcs" ->
      """SELECT p_partkey,
        | upper(p_name) AS uname,
        | substr(p_name, 1, 8) AS prefix8,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | lpad(p_brand, 12, '#') AS brand_pad,
        | trim(p_type) AS type_trim,
        | (p_name LIKE '%widget%') AS is_widget,
        | regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        | regexp_replace(p_name, ' ', '_', 'g') AS snake
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
        | last_day(CAST(o_orderdate AS DATE)) AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT p_partkey,
        | p_retailprice AS price,
        | CAST(round(CAST(p_retailprice AS DECIMAL(18,4)), 1) AS DOUBLE) AS price_r1,
        | CAST(abs(CAST(p_retailprice AS DECIMAL(18,4)) - 1000) AS DOUBLE) AS abs_diff,
        | CAST(ceil(CAST(p_retailprice AS DECIMAL(18,4))) AS BIGINT) AS price_ceil,
        | CAST(floor(CAST(p_retailprice AS DECIMAL(18,4))) AS BIGINT) AS price_floor,
        | CAST(p_size % 7 AS INTEGER) AS size_mod7,
        | CAST(sign(p_retailprice - 1000.0) AS INTEGER) AS sign_v,
        | pow(2.0, CAST(p_size % 5 AS DOUBLE)) AS pow2,
        | sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS INTEGER) AS dim,
        | embedding[1] AS first_val,
        | embedding[1:3][3] AS head3_last,
        | list_max(embedding) AS max_val,
        | list_min(embedding) AS min_val,
        | CAST(len(list_filter(embedding, x -> x > 0.1)) AS INTEGER) AS n_big
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_array_explode" ->
      """SELECT vec_id, count(*) AS n_big, CAST(min(pos) AS INTEGER) AS first_pos
        |FROM (SELECT vec_id, unnest(embedding) AS val,
        |        generate_subscripts(embedding, 1) AS pos FROM embeddings) t
        |WHERE val > 0.1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_map_funcs" ->
      """SELECT n_nationkey,
        | n_name AS name_val,
        | CAST(n_regionkey AS VARCHAR) AS region_val,
        | 'name,region' AS keys_sorted,
        | 2 AS m_size
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_cond_funcs" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |      WHEN c_acctbal < 1000 THEN 'low'
        |      ELSE 'high' END AS bal_band,
        | coalesce(nullif(c_mktsegment, 'MACHINERY'), '(machinery)') AS seg_or_default,
        | greatest(c_acctbal, 0.0) AS bal_floor,
        | CAST(least(c_nationkey, 10) AS INTEGER) AS nation_cap,
        | (c_acctbal > 0 AND c_nationkey < 20) AS flag
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_bitwise_funcs" ->
      """SELECT n_nationkey,
        |  n_nationkey & 12 AS band,
        |  n_nationkey | 5 AS bor,
        |  xor(n_nationkey, 9) AS bxor,
        |  n_nationkey << 2 AS shl2,
        |  n_nationkey >> 1 AS shr1,
        |  bit_count(n_nationkey) AS pop
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_hash_funcs" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  sha256(c_name) AS name_sha256,
        |  CAST(length(md5(c_name)) AS INT) AS md5_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
        | CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS INTEGER) AS k_mod10
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
