package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: statement-level timing of the lake_sql_dml lifecycle —
  * where does the fixed overhead live? Usage:
  * tools/run.sh graft.ProfileLifecycle /root/testdata/sf0.1
  */
object ProfileLifecycle {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      })

    def step[T](name: String)(f: => T): T = {
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f" +
        f"  jobs=${jobs.get - j0}%2d stages=${stages.get - s0}%2d tasks=${tasks.get - k0}%3d")
      r
    }

    for (round <- 1 to 2) {
      println(s"=== round $round")
      val s = graft.queries.QueryModule.microSession(spark, 4)
      val wh = step("freshWarehouse") {
        val p = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft-lake-prof")
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.delete(f))
        java.nio.file.Files.createDirectories(p)
        p.toString }
      s.conf.set("spark.sql.catalog.gprof", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gprof.warehouse", wh)
      step("DROP IF EXISTS") { s.sql("DROP TABLE IF EXISTS gprof.rq.n") }
      step("CREATE") { s.sql(
        "CREATE TABLE gprof.rq.n (n_nationkey INT, n_name STRING, n_regionkey INT)") }
      step("register view") {
        graft.queries.Tables(s, dir, "nation").createOrReplaceTempView("nv") }
      step("INSERT") { s.sql(
        "INSERT INTO gprof.rq.n SELECT n_nationkey, n_name, n_regionkey FROM nv") }
      step("UPDATE") { s.sql(
        "UPDATE gprof.rq.n SET n_name = concat(n_name, '_EU') WHERE n_regionkey = 3") }
      step("MERGE") { s.sql(
        """MERGE INTO gprof.rq.n t
          |USING (SELECT n_nationkey, n_regionkey FROM nv WHERE n_regionkey = 1) s
          |ON t.n_nationkey = s.n_nationkey
          |WHEN MATCHED THEN UPDATE SET t.n_regionkey = s.n_regionkey + 100
          |WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
          |  VALUES (s.n_nationkey, 'NEW', s.n_regionkey)""".stripMargin) }
      step("DELETE") { s.sql("DELETE FROM gprof.rq.n WHERE n_regionkey = 0") }
      step("final read") { s.sql(
        "SELECT * FROM gprof.rq.n ORDER BY n_nationkey").count() }
    }
    spark.stop()
  }
}
