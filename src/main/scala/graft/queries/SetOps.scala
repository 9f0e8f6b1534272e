package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables.dec

/** Set-operation inventory (SURVEY.md §2.B): UNION ALL, UNION DISTINCT,
  * INTERSECT, EXCEPT. Spark's intersect/except use distinct (set)
  * semantics — same as SQL INTERSECT/EXCEPT.
  *
  * Scale: distinct set ops shuffle once on the full row; UNION ALL is
  * shuffle-free (pure concatenation of scans).
  */
object SetOps extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union_all" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"),
          col("l_extendedprice").as("amount"), lit("L").as("src"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("okey"),
          col("o_totalprice").as("amount"), lit("O").as("src"))
      li.unionByName(o).orderBy("okey", "src", "amount")
    }),

    "q_union_distinct" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(su).distinct().orderBy("nationkey")
    }),

    "q_except_all" -> ((s, dir) => {
      // bag semantics: multiplicities subtract (orders custkeys minus
      // one occurrence per customer row)
      val o = Tables(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val c = Tables(s, dir, "customer").select(col("c_custkey").as("custkey"))
      o.exceptAll(c).groupBy("custkey").agg(count(lit(1)).as("n"))
        .orderBy("custkey")
    }),

    "q_intersect_all" -> ((s, dir) => {
      // bag intersection: min(multiplicity) per key across both inputs
      val li = Tables(s, dir, "lineitem").select(col("l_suppkey").as("suppkey"))
      val su = Tables(s, dir, "supplier").select(col("s_suppkey").as("suppkey"))
      li.intersectAll(su).groupBy("suppkey").agg(count(lit(1)).as("n"))
        .orderBy("suppkey")
    }),

    "q_intersect" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val c = Tables(s, dir, "customer").select(col("c_custkey").as("custkey"))
      o.intersect(c).orderBy("custkey")
    }),

    "q_except" -> ((s, dir) => {
      // parts never shipped in bulk (quantity > 45) — the filter keeps
      // the difference non-empty at every scale factor
      val p = Tables(s, dir, "part").select(col("p_partkey").as("partkey"))
      val li = Tables(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_partkey").as("partkey"))
      p.except(li).orderBy("partkey")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_union_all" ->
      """SELECT l_orderkey AS okey, l_extendedprice AS amount, 'L' AS src FROM lineitem
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'O' FROM orders
        |ORDER BY okey, src, amount""".stripMargin,

    "q_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_except_all" ->
      """SELECT custkey, count(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey FROM customer
        |) GROUP BY custkey ORDER BY custkey""".stripMargin,

    "q_intersect_all" ->
      """SELECT suppkey, count(*) AS n FROM (
        |  SELECT l_suppkey AS suppkey FROM lineitem
        |  INTERSECT ALL
        |  SELECT s_suppkey FROM supplier
        |) GROUP BY suppkey ORDER BY suppkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey FROM customer
        |ORDER BY custkey""".stripMargin,

    "q_except" ->
      """SELECT p_partkey AS partkey FROM part
        |EXCEPT
        |SELECT l_partkey FROM lineitem WHERE l_quantity > 45
        |ORDER BY partkey""".stripMargin,
  )
}
