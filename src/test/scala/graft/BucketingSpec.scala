package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-shuffled storage: two tables bucketed by the same
  * key join without any Exchange — the co-located-join technique for
  * repeated fact-fact joins at 100 TB (shuffle once at write time,
  * never again at read time).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join with no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    // stale managed-table dirs from a previous run would fail saveAsTable
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/orders_b"))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/lineitem_b"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    // force the merge join: at this toy scale the planner would rather
    // broadcast (which disables bucketed scans); at fact-fact scale the
    // merge path is the one that matters
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    // and it still computes the right thing
    val n = joined.count()
    val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(n == expected)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
