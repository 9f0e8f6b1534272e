package graft

/** Dev tool: time one query end-to-end and optionally dump the
  * executed (post-AQE) plan's scan/reuse nodes.
  * Usage: tools/run.sh graft.TimeQ <sfDir> <query>...  [SHOW_EXEC=1]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.props.getOrElse("graft.timeq.master", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.props.getOrElse("graft.timeq.parts", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (q <- args.drop(1).toSeq) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, args(0))
      df.count()
      println(s"$q ${(System.nanoTime() - t0) / 1e9}")
      if (sys.env.contains("SHOW_EXEC"))
        println(df.queryExecution.executedPlan.toString.split("\n")
          .filter(l => l.contains("Scan parquet") || l.contains("ReusedExchange")
            || l.contains("Exchange")).mkString("\n"))
    }
    spark.stop()
  }
}
