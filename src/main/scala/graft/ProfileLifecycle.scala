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
    val traceJobs = new java.util.concurrent.atomic.AtomicBoolean(
      sys.props.contains("graft.prof.trace"))
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
          jobStart.put(j.jobId, System.nanoTime())
          if (traceJobs.get) println(s"    [job ${j.jobId}] " +
            j.stageInfos.map(_.name).mkString(" | "))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (traceJobs.get) {
            val t0 = Option(jobStart.get(j.jobId)).getOrElse(0L)
            println(f"    [job ${j.jobId} end] ${(System.nanoTime()-t0)/1e9}%.3f")
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

    // Mode "append": where does a tiny append's wall time go? 10 warm
    // sequential appends with load/align/write/commit sub-timings.
    if (args.drop(1).headOption.contains("append")) {
      import org.apache.spark.sql.functions.col
      import graft.lake.{Engine, LakeTable}
      val s = graft.queries.QueryModule.microSession(spark, 4)
      val wh = java.nio.file.Files.createTempDirectory("graft-prof-app")
        .toString
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"t","columns":[
          |{"column_name":"k","data_type":"long"},
          |{"column_name":"v","data_type":"long"}],
          |"partitions":[]}""".stripMargin)
      import s.implicits._
      val df = (0 until 100).map(i => (i.toLong, i * 2L)).toDF("k", "v")
      for (i <- 1 to 10) {
        val t0 = System.nanoTime()
        val t = LakeTable.load(wh, "d", "t")
        val t1 = System.nanoTime()
        t.append(df)
        val t2 = System.nanoTime()
        println(f"append $i%2d: load ${(t1 - t0) / 1e6}%6.1f ms  " +
          f"append ${(t2 - t1) / 1e6}%6.1f ms")
      }
      // and a read back
      val t0 = System.nanoTime()
      val n = LakeTable.load(wh, "d", "t").read(s).count()
      println(f"read: ${(System.nanoTime() - t0) / 1e6}%6.1f ms ($n rows)")
      spark.stop(); return
    }

    // Mode "key <name>": run ONE SparkEntry key twice with job/task
    // counting per run (coarse — whole-key totals only).
    if (args.drop(1).headOption.contains("key")) {
      val name = args(2)
      for (round <- 1 to 3)
        step(s"$name r$round") {
          SparkEntry.queries(name)(spark, dir).count()
        }
      spark.stop(); return
    }

    // Mode "stxn": statement-level breakdown of stream_txn_sink's
    // shape — fixture appends, stream drain, replay audit, reconcile.
    if (args.drop(1).headOption.contains("stxn")) {
      import org.apache.spark.sql.functions.{col, count, lit, coalesce}
      import graft.lake.{Engine, LakeTable, LakeTxn}
      for (round <- 1 to 2) {
        println(s"=== stxn round $round")
        val s = graft.queries.QueryModule.microSession(spark, 1)
        val wh = java.nio.file.Files.createTempDirectory(
          s"graft-prof-stxn$round").toString
        step("tabledefs") {
          for (t <- Seq("src", "raw"))
            Engine.processTableDefJson(wh,
              s"""{"database_name":"st","table_name":"$t","columns":[
                 |{"column_name":"n_nationkey","data_type":"int"},
                 |{"column_name":"n_name","data_type":"string"},
                 |{"column_name":"n_regionkey","data_type":"int"}],
                 |"partitions":[]}""".stripMargin)
          Engine.processTableDefJson(wh,
            """{"database_name":"st","table_name":"agg","columns":[
              |{"column_name":"n_regionkey","data_type":"int"},
              |{"column_name":"n","data_type":"long"}],
              |"partitions":[]}""".stripMargin)
        }
        val nation = step("nation df") {
          graft.queries.Tables(s, dir, "nation")
            .select("n_nationkey", "n_name", "n_regionkey") }
        step("3 src appends") {
          for (m <- 0 to 2)
            LakeTable.load(wh, "st", "src")
              .append(nation.filter(col("n_nationkey") % 3 === m)) }
        def publish(batch: org.apache.spark.sql.DataFrame,
            id: Long): Boolean = {
          val done = LakeTable.load(wh, "st", "raw").metadata.properties
            .get("graft.stream.last-batch").exists(_.toLong >= id)
          if (done) false
          else {
            val rows = batch.select(col("n_nationkey"), col("n_name"),
              col("n_regionkey"))
            val delta = rows.groupBy("n_regionkey")
              .agg(count(lit(1)).as("n"))
            val cur = LakeTable.load(wh, "st", "agg").read(s)
              .withColumnRenamed("n", "cn")
            val merged = delta.join(cur, Seq("n_regionkey"), "left")
              .select(col("n_regionkey"),
                (col("n") + coalesce(col("cn"), lit(0L))).as("n"))
              .localCheckpoint()
            LakeTxn.transaction(wh) { ctx =>
              val raw = ctx.table("st", "raw")
              raw.append(rows)
              raw.updateProperties(
                Map("graft.stream.last-batch" -> id.toString))
              ctx.table("st", "agg").upsertMoR(s, merged,
                keys = Seq("n_regionkey"))
            }
            true
          }
        }
        val lastRef = new java.util.concurrent.atomic.AtomicReference[
          (org.apache.spark.sql.DataFrame, Long)](null)
        step("stream drain") {
          val q = s.readStream.format("graft-lake")
            .option("warehouse", wh).option("database", "st")
            .option("table", "src")
            .option("maxSnapshotsPerTrigger", "1")
            .load()
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  id: Long) =>
                val pinned = b.localCheckpoint()
                publish(pinned, id)
                lastRef.set((pinned, id)); ()
            }
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        step("replay audit") {
          val lastB = lastRef.get()
          publish(lastB._1, lastB._2)
        }
        step("reconcile") {
          LakeTable.load(wh, "st", "raw").read(s)
            .groupBy("n_regionkey").agg(count(lit(1)).as("rn"))
            .join(LakeTable.load(wh, "st", "agg").read(s),
              Seq("n_regionkey"), "full_outer")
            .filter(col("rn") =!= col("n") ||
              col("rn").isNull || col("n").isNull).isEmpty
        }
        step("final read") {
          LakeTable.load(wh, "st", "agg").read(s).count()
        }
      }
      spark.stop(); return
    }

    // Mode "mvd": statement-level breakdown of the heaviest bench key
    // (lake_mat_view_distinct) — same statements, step()-wrapped.
    if (args.drop(1).headOption.contains("mvd")) {
      import org.apache.spark.sql.functions.col
      import graft.lake.{Engine, LakeTable}
      for (round <- 1 to 2) {
        println(s"=== mvd round $round")
        val s = graft.queries.QueryModule.microSession(spark, 4)
        val wh = step("freshWarehouse") {
          val p = java.nio.file.Paths.get(
            System.getProperty("java.io.tmpdir"), s"graft-lake-profmvd$round")
          if (java.nio.file.Files.exists(p))
            java.nio.file.Files.walk(p)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.delete(f))
          java.nio.file.Files.createDirectories(p)
          p.toString }
        step("tabledef") { Engine.processTableDefJson(wh,
          """{"database_name":"mvd","table_name":"ord","columns":[
            |{"column_name":"o_custkey","data_type":"long"},
            |{"column_name":"o_okey","data_type":"long"},
            |{"column_name":"o_prio","data_type":"string"},
            |{"column_name":"o_price","data_type":"decimal(18,4)"}],
            |"partitions":[]}""".stripMargin) }
        val orders = step("orders df") { graft.queries.Tables(s, dir, "orders")
          .filter(col("o_orderkey") % 6 === 0)
          .select(col("o_custkey"), col("o_orderkey").as("o_okey"),
            col("o_orderpriority").as("o_prio"),
            col("o_totalprice").cast("decimal(18,4)").as("o_price")) }
        step("append0") { LakeTable.load(wh, "mvd", "ord")
          .append(orders.filter(col("o_custkey") % 32 === 0)) }
        s.conf.set("spark.sql.catalog.gmvdp", "graft.sources.LakeCatalog")
        s.conf.set("spark.sql.catalog.gmvdp.warehouse", wh)
        def vsql(q: String) =
          org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
        step("CREATE MV") { vsql("CREATE MATERIALIZED VIEW gmvdp.mvd.roll AS " +
          "SELECT o_custkey, count(DISTINCT o_prio) AS n_prios, " +
          "sum(DISTINCT o_price) AS sd, avg(DISTINCT o_price) AS ad, " +
          "count(*) AS n_orders FROM gmvdp.mvd.ord " +
          "GROUP BY o_custkey").collect() }
        step("append1") { LakeTable.load(wh, "mvd", "ord")
          .append(orders.filter(col("o_custkey") % 32 === 1)) }
        step("REFRESH 1") {
          vsql("REFRESH MATERIALIZED VIEW gmvdp.mvd.roll INCREMENTAL")
            .collect() }
        step("deleteMoR") { LakeTable.load(wh, "mvd", "ord")
          .deleteMoR(s, col("o_okey") % 7 === 3) }
        step("REFRESH 2") {
          vsql("REFRESH MATERIALIZED VIEW gmvdp.mvd.roll INCREMENTAL")
            .collect() }
        step(".refreshes") { vsql("SELECT strategy FROM " +
          "gmvdp.mvd.roll.refreshes WHERE mode = 'incremental'").collect() }
        step("load meta") { LakeTable.load(wh, "mvd", "__mat_roll")
          .metadata.snapshots.size }
        step("final read") { vsql("SELECT o_custkey, n_prios, " +
          "CAST(sd AS DOUBLE) AS sum_dprice, " +
          "ROUND(CAST(ad AS DOUBLE), 6) AS avg_dprice6, n_orders " +
          "FROM gmvdp.mvd.roll ORDER BY o_custkey").count() }
      }
      spark.stop(); return
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
