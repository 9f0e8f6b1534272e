package graft

import org.apache.spark.sql.functions._

/** Dev scratch: phase-level timing for the slow fixed-overhead queries.
  * Not part of the driver contract; delete when done.
  */
object Profile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    println("ingest_append_read phases:")
    import graft.gen.{DataGen, OrdersFixtures}
    import graft.lake.{Engine, LakeTable}
    val wh = java.nio.file.Files.createTempDirectory("graft-prof").toString
    t("ddl v1")(Engine.processTableDefJson(wh, OrdersFixtures.ordersV1Json))
    val t1 = t("load v1")(LakeTable.load(wh, "customer_order", "orders"))
    val df1 = t("gen v1")(DataGen.toDf(spark, DataGen.ordersV1(20, seed = 1L), t1.currentSchema))
    t("append v1")(t1.append(df1))
    t("ddl v2")(Engine.processTableDefJson(wh, OrdersFixtures.ordersV2Json))
    val t2 = t("load v2")(LakeTable.load(wh, "customer_order", "orders"))
    val df2 = t("gen v2")(DataGen.toDf(spark, DataGen.ordersV2(15, seed = 2L), t2.currentSchema))
    t("append v2")(t2.append(df2))
    t("read+collect")(t2.read(spark).select(col("order_id")).count())

    println("append breakdown (v2 table, 15 rows):")
    val df3 = DataGen.toDf(spark, DataGen.ordersV2(15, seed = 3L), t2.currentSchema)
    val aligned = t("align")(graft.lake.Align(df3, t2.currentSchema))
    val tmpOut = java.nio.file.Files.createTempDirectory("graft-prof-w")
    t("plain write")(aligned.write.mode("overwrite").parquet(tmpOut.toString + "/a"))
    t("plain write again")(aligned.write.mode("overwrite").parquet(tmpOut.toString + "/b"))
    t("write w/ partitionBy")(aligned.withColumn("_p_m", month(col("order_time")))
      .repartition(col("_p_m")).write.mode("overwrite").partitionBy("_p_m").parquet(tmpOut.toString + "/c"))
    t("append v2 again")(t2.append(df3))
    t("append v2 3rd")(t2.append(df3))

    println("q_stream_join end-to-end:")
    t("q_stream_join")(SparkEntry.queries("q_stream_join")(spark, args.headOption.getOrElse("/root/testdata/sf0.01")).count())
    println("lake_delete phases: (sf0.1)")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wh2 = java.nio.file.Files.createTempDirectory("graft-profdel").toString
    t("ddl")(Engine.processTableDefJson(wh2,
      """{"database_name":"rowops","table_name":"orders_cow","columns":[
        |{"column_name":"o_orderkey","data_type":"long"},
        |{"column_name":"o_orderstatus","data_type":"string"},
        |{"column_name":"o_totalprice","data_type":"double"},
        |{"column_name":"o_orderpriority","data_type":"string"}],
        |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin))
    val td = t("load")(LakeTable.load(wh2, "rowops", "orders_cow"))
    t("append orders")(td.append(graft.queries.Tables(spark, dir, "orders").select(
      "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")))
    t("delete")(td.delete(spark,
      col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0,
      prune = Map("status" -> Set("F"))))
    t("read+agg")(td.read(spark).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders")).collect())
    spark.stop()
  }
}
