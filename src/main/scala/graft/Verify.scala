package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing args: only run these queries (dev loop)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // fixture preflight (round-5 postmortem): name any drifted table
    // in ONE line before queries die deep inside analysis. Advisory —
    // queries still run, since adaptive loaders may cope.
    graft.queries.FixtureSchemas.preflight(spark, sfDir).foreach(p =>
      System.err.println(s"[verify] FIXTURE DRIFT (spark view): $p"))
    // the same expectations, for the ORACLE side: the python compare
    // preflights DuckDB's view of the fixtures against this, so a
    // drift that only changes DuckDB's read (e.g. a new logical type
    // it maps differently) is named by engine instead of surfacing as
    // confusing hash mismatches
    Files.writeString(Paths.get(s"$outDir/fixture_expectations.json"),
      graft.queries.FixtureSchemas.expectationsJson)
    // Queries are independent (distinct output dirs, distinct scratch
    // warehouses) — run them on a small thread pool so Spark can overlap
    // planning/IO-bound queries with compute-bound ones. FIFO scheduling
    // within one SparkContext interleaves the jobs fine.
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    // key → exception message for every query that threw: round-12's
    // verify swallowed 42 crashes to stderr, so the keys either vanished
    // from CORRECTNESS or left 0-row partial parquet that scored as
    // value mismatches with no named error
    val failures = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val tasks = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            val out = fn(spark, sfDir)
            // dump tz-aware timestamps as TIMESTAMP_NTZ (same UTC wall
            // clock under the UTC session): the driver's pandas side
            // then loads naive datetimes, matching DuckDB's .df() —
            // independent of the session's parquet timestamp encoding
            // (lake writes pin TIMESTAMP_MICROS, which is tz-aware)
            val norm = out.schema.fields.foldLeft(out) { (d, f) =>
              f.dataType match {
                case org.apache.spark.sql.types.TimestampType =>
                  d.withColumn(f.name, org.apache.spark.sql.functions
                    .col(f.name).cast(org.apache.spark.sql.types.TimestampNTZType))
                case _ => d
              }
            }
            norm.coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
          } catch { case e: Throwable =>
            failures.put(name, s"${e.getClass.getSimpleName}: ${e.getMessage}")
            System.err.println(s"[verify] $name failed: ${e.getMessage}"); if (sys.env.contains("GRAFT_VERIFY_TRACE")) e.printStackTrace()
            // a failed write can leave a 0-row partial parquet behind —
            // delete it so the driver sees a named failure, not a
            // mysterious empty result
            val dir = Paths.get(s"$outDir/$name")
            if (Files.exists(dir)) {
              import scala.jdk.CollectionConverters._
              scala.util.Using.resource(Files.walk(dir)) { st =>
                st.iterator().asScala.toSeq.reverse.foreach(p =>
                  try Files.delete(p) catch { case _: Exception => () })
              }
            }
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // every declared key must appear in the driver artifact with either
    // data or a named error — _failures.json carries the errors
    import scala.jdk.CollectionConverters._
    val failJson = failures.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    if (!failures.isEmpty)
      System.err.println(s"[verify] ${failures.size} FAILED keys: " +
        failures.asScala.keys.toSeq.sorted.mkString(","))
    spark.stop()
  }
}
