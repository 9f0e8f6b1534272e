package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does a lifecycle fixture write's wall go?
  * tools/run.sh graft.WriteProbe /root/testdata/sf0.1 */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = graft.queries.QueryModule.microSession(spark, 4)
    spark.range(100).selectExpr("sum(id)").collect()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-34s ${(System.nanoTime()-t0)/1e6}%8.1f ms"); r
    }
    val src = graft.queries.Tables(s, dir, "orders").select(
      "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    for (round <- 1 to 3) {
      println(s"=== round $round")
      t("count(src)") { src.count() }
      t("noop(src)") { src.write.format("noop").mode("overwrite").save() }
      val d1 = java.nio.file.Files.createTempDirectory("wp1").toString
      t("plain write") { src.write.mode("overwrite").parquet(d1) }
      val d2 = java.nio.file.Files.createTempDirectory("wp2").toString
      t("repart(status)+write") {
        src.withColumn("_p", col("o_orderstatus"))
          .repartition(col("_p"))
          .write.mode("overwrite").partitionBy("_p").parquet(d2) }
      val d3 = java.nio.file.Files.createTempDirectory("wp3").toString
      t("coalesce(1) write") {
        src.coalesce(1).write.mode("overwrite").parquet(d3) }
      // lake append for comparison
      val wh = java.nio.file.Files.createTempDirectory("wp-lake").toString
      graft.lake.Engine.processTableDefJson(wh,
        """{"database_name":"w","table_name":"t","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"},
          |{"column_name":"o_orderpriority","data_type":"string"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      t("lake append (partitioned)") {
        graft.lake.LakeTable.load(wh, "w", "t").append(src) }
      val wh2 = java.nio.file.Files.createTempDirectory("wp-lake2").toString
      graft.lake.Engine.processTableDefJson(wh2,
        """{"database_name":"w","table_name":"t","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"},
          |{"column_name":"o_orderpriority","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      t("lake append (unpartitioned)") {
        graft.lake.LakeTable.load(wh2, "w", "t").append(src) }
    }
    spark.stop()
  }
}
